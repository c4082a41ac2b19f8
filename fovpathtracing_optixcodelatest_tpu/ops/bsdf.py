"""Disney BSDF: eval / pdf / importance sample, vectorized over the ray batch.

Behavior twin of PT_sv5_/Disney.cuh (Macklin's adaptation of the Disney BRDF):

- ``bsdf_pdf``    — Disney.cuh:152-193: below-horizon subsurface pdf, GGX
  half-vector spec pdf, diffuse/spec 50/50 mix, transmission lerp.
- ``bsdf_sample`` — Disney.cuh:197-313: transmission branch picks reflect vs
  refract by dielectric Fresnel (specular refraction returns pdf =
  (1-F)·transmission and does NOT consult bsdf_pdf); reflection branch mixes
  cosine-diffuse / uniform-inside-subsurface / GGX half-vector lobes.
- ``bsdf_eval``   — Disney.cuh:317-427: transmission lobe uses the *dielectric*
  Fresnel with the half-vector (Fr), the BRDF lobe uses Schlick; clearcoat GTR1;
  final ``lerp(brdf, bsdf, transmission)``.

All branches are computed and selected with masks (lockstep VPU style); every
function takes per-ray material parameter arrays (a gathered MaterialTable).
Sample types mirror ``BSDFType`` (Disney.cuh:29-34).
"""

from __future__ import annotations

import jax.numpy as jnp

from fovpathtracing_optixcodelatest_tpu.models.material import MaterialTable
from fovpathtracing_optixcodelatest_tpu.ops.sampling import (
    INV_2PI,
    INV_PI,
    PI,
    TWO_PI,
    cosine_sample_hemisphere,
    dot,
    fresnel_dielectric,
    local_to_world,
    reflect,
    refract,
    safe_normalize,
    schlick_fresnel,
    uniform_sample_hemisphere,
)

# BSDFType (Disney.cuh:29-34)
BSDF_REFLECTED = 0
BSDF_TRANSMITTED = 1
BSDF_SPECULAR = 2


def _gtr1(n_dot_h, a):
    """GTR1 NDF (Disney.cuh:58-64); a>=1 degenerates to 1/π."""
    a2 = a * a
    t = 1.0 + (a2 - 1.0) * n_dot_h * n_dot_h
    safe_log = jnp.log(jnp.clip(a2, 1e-8, 0.999999))
    val = (a2 - 1.0) / (PI * safe_log * jnp.where(t == 0.0, 1e-8, t))
    return jnp.where(a >= 1.0, INV_PI, val)


def _gtr2(n_dot_h, a):
    """GTR2/GGX NDF (Disney.cuh:66-71)."""
    a2 = a * a
    t = 1.0 + (a2 - 1.0) * n_dot_h * n_dot_h
    return a2 / (PI * jnp.maximum(t * t, 1e-12))


def _smith_ggx(n_dot_v, alpha_g):
    """Smith GGX masking term (Disney.cuh:73-78)."""
    a = alpha_g * alpha_g
    b = n_dot_v * n_dot_v
    return 1.0 / jnp.maximum(n_dot_v + jnp.sqrt(jnp.maximum(a + b - a * b, 0.0)), 1e-8)


def bsdf_pdf(mat: MaterialTable, eta_i, eta_o, n, view, light):
    """Solid-angle pdf of ``light`` given ``view`` (Disney.cuh BSDFPdf)."""
    n_dot_l = dot(light, n)
    below = n_dot_l <= 0.0

    # below horizon: only the uniform-inside subsurface lobe
    brdf_pdf_below = INV_2PI * mat.subsurface * 0.5
    bsdf_pdf_below = jnp.zeros_like(brdf_pdf_below)

    # above horizon
    f = fresnel_dielectric(dot(n, view), eta_i, eta_o)
    a = jnp.maximum(0.001, mat.roughness)
    half = safe_normalize(light + view)
    cos_theta_half = jnp.abs(dot(half, n))
    pdf_half = _gtr2(cos_theta_half, a) * cos_theta_half
    pdf_spec = 0.25 * pdf_half / jnp.maximum(1e-6, dot(light, half))
    pdf_diff = jnp.abs(n_dot_l) * INV_PI * (1.0 - mat.subsurface)
    bsdf_pdf_above = pdf_spec * f
    brdf_pdf_above = 0.5 * (pdf_diff + pdf_spec)  # lerp(diff, spec, 0.5)

    brdf_p = jnp.where(below, brdf_pdf_below, brdf_pdf_above)
    bsdf_p = jnp.where(below, bsdf_pdf_below, bsdf_pdf_above)
    return brdf_p + mat.transmission * (bsdf_p - brdf_p)


def _sample_ggx_half(u, v, n, view, roughness, r1, r2):
    """GGX half-vector in the (u,v,n) frame, flipped into view's hemisphere
    (Disney.cuh:211-231 / :286-306)."""
    a = jnp.maximum(0.001, roughness)
    phi = r1 * TWO_PI
    cos_th = jnp.sqrt(jnp.clip((1.0 - r2) / (1.0 + (a * a - 1.0) * r2), 0.0, 1.0))
    sin_th = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_th * cos_th))
    d = jnp.stack([sin_th * jnp.cos(phi), sin_th * jnp.sin(phi), cos_th], axis=-1)
    half = local_to_world(d, u, v, n)
    flip = dot(half, view) <= 0.0
    return jnp.where(flip[..., None], -half, half)


def bsdf_sample(mat: MaterialTable, eta_i, eta_o, u, v, n, view, uniforms):
    """Importance-sample an outgoing direction (Disney.cuh BSDFSample).

    Args:
      u, v, n: shading frame (basis_from_vector(n)); view: towards camera.
      uniforms: (N, 6) — [branch_t, branch_f, branch_half, branch_ss, r1, r2].
    Returns: (light (N,3), pdf (N,), sample_type (N,) int32).

    pdf == 0 flags a terminated path (failed refraction), matching the DONE
    state the reference sets (deviceProgram.cu:708-711).
    """
    u_t = uniforms[..., 0]
    u_f = uniforms[..., 1]
    u_half = uniforms[..., 2]
    u_ss = uniforms[..., 3]
    r1 = uniforms[..., 4]
    r2 = uniforms[..., 5]

    f = fresnel_dielectric(dot(n, view), eta_i, eta_o)

    # --- candidate directions (all lanes compute all lobes) ---
    half = _sample_ggx_half(u, v, n, view, mat.roughness, r1, r2)
    light_spec = reflect(view, half)

    d_cos = cosine_sample_hemisphere(r1, r2)
    light_diff = local_to_world(d_cos, u, v, n)

    d_uni = uniform_sample_hemisphere(r1, r2)
    # negate z to sample inside the surface (Disney.cuh:269-273)
    light_ss = (
        u * d_uni[..., 0:1] + v * d_uni[..., 1:2] - n * d_uni[..., 2:3]
    )

    eta_ratio = eta_i / eta_o
    light_refr, refr_ok = refract(view, n, eta_ratio)

    # --- branch selection ---
    trans_branch = u_t < mat.transmission
    spec_in_trans = u_f < f
    diffuse_half = u_half < 0.5
    ss_pick = u_ss < mat.subsurface

    refl_light = jnp.where(
        diffuse_half[..., None],
        jnp.where(ss_pick[..., None], light_ss, light_diff),
        light_spec,
    )
    refl_type = jnp.where(
        diffuse_half & ss_pick, BSDF_TRANSMITTED, BSDF_REFLECTED
    ).astype(jnp.int32)

    light = jnp.where(
        trans_branch[..., None],
        jnp.where(spec_in_trans[..., None], light_spec, light_refr),
        refl_light,
    )
    sample_type = jnp.where(
        trans_branch,
        jnp.where(spec_in_trans, BSDF_REFLECTED, BSDF_SPECULAR),
        refl_type,
    ).astype(jnp.int32)

    pdf_smooth = bsdf_pdf(mat, eta_i, eta_o, n, view, light)
    is_specular_refr = trans_branch & ~spec_in_trans
    pdf = jnp.where(
        is_specular_refr,
        jnp.where(refr_ok, (1.0 - f) * mat.transmission, 0.0),
        pdf_smooth,
    )
    return light, pdf, sample_type


def bsdf_eval(mat: MaterialTable, albedo, eta_i, eta_o, n, view, light):
    """Evaluate f(view, light) (Disney.cuh BSDFEval). ``albedo`` is the
    texture-modulated base color the CH program passes (deviceProgram.cu:687)."""
    n_dot_l = dot(light, n)
    n_dot_v = dot(n, view)
    h = safe_normalize(light + view)
    n_dot_h = dot(n, h)
    l_dot_h = dot(light, h)

    cdlin = albedo
    cdlum = 0.3 * cdlin[..., 0] + 0.6 * cdlin[..., 1] + 0.1 * cdlin[..., 2]
    ctint = jnp.where(
        cdlum[..., None] > 0.0,
        cdlin / jnp.maximum(cdlum[..., None], 1e-8),
        jnp.ones_like(cdlin),
    )
    cspec0_dielec = mat.specular[..., None] * 0.08 * (
        1.0 + mat.specular_tint[..., None] * (ctint - 1.0)
    )
    cspec0 = cspec0_dielec + mat.metallic[..., None] * (cdlin - cspec0_dielec)

    below = n_dot_l <= 0.0
    a = jnp.maximum(0.001, mat.roughness)

    # ---- BSDF (transmission) side ----
    f_v = fresnel_dielectric(n_dot_v, eta_i, eta_o)
    bsdf_below = (
        mat.transmission
        * (1.0 - f_v)
        / jnp.maximum(jnp.abs(n_dot_l), 1e-6)
        * (1.0 - mat.metallic)
    )[..., None] * jnp.ones(3)
    ds = _gtr2(n_dot_h, a)
    fh_dielec = fresnel_dielectric(l_dot_h, eta_i, eta_o)
    fs_trans = cspec0 + fh_dielec[..., None] * (1.0 - cspec0)
    gs = _smith_ggx(n_dot_v, a) * _smith_ggx(n_dot_l, a)
    bsdf_above = (gs * ds)[..., None] * fs_trans
    bsdf_side = jnp.where(below[..., None], bsdf_below, bsdf_above)
    bsdf_side = jnp.where((mat.transmission > 0.0)[..., None], bsdf_side, 0.0)

    # ---- BRDF side ----
    fl_abs = schlick_fresnel(jnp.abs(n_dot_l))
    fv = schlick_fresnel(n_dot_v)
    fd_ss = (1.0 - 0.5 * fl_abs) * (1.0 - 0.5 * fv)
    s = jnp.sqrt(jnp.maximum(mat.color, 0.0))
    brdf_below = (
        INV_PI
        * (mat.subsurface * fd_ss * (1.0 - mat.metallic))[..., None]
        * s
    )
    brdf_below = jnp.where((mat.subsurface > 0.0)[..., None], brdf_below, 0.0)

    fh = schlick_fresnel(l_dot_h)
    fs = cspec0 + fh[..., None] * (1.0 - cspec0)
    fl = schlick_fresnel(n_dot_l)
    fd90 = 0.5 + 2.0 * l_dot_h * l_dot_h * mat.roughness
    fd = (1.0 + fl * (fd90 - 1.0)) * (1.0 + fv * (fd90 - 1.0))
    dr = _gtr1(n_dot_h, 0.1 + mat.clearcoat_gloss * (0.001 - 0.1))
    fc = 0.04 + fh * (1.0 - 0.04)
    gr = _smith_ggx(n_dot_l, 0.25) * _smith_ggx(n_dot_v, 0.25)
    brdf_above = (
        (INV_PI * fd * (1.0 - mat.metallic) * (1.0 - mat.subsurface))[..., None]
        * cdlin
        + (gs * ds)[..., None] * fs
        + (mat.clearcoat * gr * fc * dr)[..., None] * jnp.ones(3)
    )
    brdf_side = jnp.where(below[..., None], brdf_below, brdf_above)
    brdf_side = jnp.where((mat.transmission < 1.0)[..., None], brdf_side, 0.0)

    return brdf_side + mat.transmission[..., None] * (bsdf_side - brdf_side)
