"""Component-form (plane-wise) bounce shading core.

A complete re-expression of the per-bounce shading math (NEE probe sampling
with MIS + Disney BSDF eval/pdf/sample + medium tracking), written over
*planes* — same-shape scalar arrays, with 3-vectors as Python tuples of
three planes — instead of ``(N, 3)`` stacked arrays. Component form is what
makes a Pallas kernel layout-sane: every plane tiles as (8, 128) VPU
registers, whereas ``(N, 3)`` arrays tile T(4, 128)/T(1, 128) (3 of 128
lanes live).

STATUS (round 3): this module exists as the math body of the fused-shading
Pallas kernel (ops/fused_shading.py), which was MEASURED SLOWER than the
integrator's stacked (N,3) XLA path at frame scale (453 vs 693 ms — see the
fused_shading docstring and PLAN.md rule 32). render/integrator.py therefore
keeps its own (N,3) implementation; this plane-wise copy is retained only to
document the dead end and is pinned against the stacked reference
implementations (ops/bsdf.py, ops/probe_sampling.py) by
tests/test_fused_shading.py.

Behavior twins (bit-compatible formula-for-formula with ops/bsdf.py and
ops/probe_sampling.py, which remain the reference implementation for
distribution tests): Disney.cuh BSDFPdf/BSDFSample/BSDFEval (:152-427),
SampleLights MIS weights (deviceProgram.cu:303-344), Probe.cuh alias
sampling, and the __closesthit__radiance material wiring (:619-732).

Gathers stay OUTSIDE (XLA): the caller passes the already-gathered
tri_pack row (48 planes), probe sample row (13 planes), per-ray uniforms
(8 planes) and optional texture color; everything else is elementwise.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from fovpathtracing_optixcodelatest_tpu.models.material import (
    MATERIAL_FLAG_SHADOW_CATCHER,
)
from fovpathtracing_optixcodelatest_tpu.ops.sampling import (
    INV_2PI,
    INV_PI,
    PI,
    TWO_PI,
)

# BSDFType (Disney.cuh:29-34)
_REFLECTED, _TRANSMITTED, _SPECULAR = 0, 1, 2


# ---- tuple-of-planes vector helpers ----------------------------------------

def dot3(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def scale3(v, s):
    return (v[0] * s, v[1] * s, v[2] * s)


def add3(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def sub3(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def mul3(a, b):
    return (a[0] * b[0], a[1] * b[1], a[2] * b[2])


def neg3(v):
    return (-v[0], -v[1], -v[2])


def where3(c, a, b):
    return (jnp.where(c, a[0], b[0]), jnp.where(c, a[1], b[1]),
            jnp.where(c, a[2], b[2]))


def cross3(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def normalize3(v, eps=1e-20):
    inv = jnp.reciprocal(jnp.sqrt(jnp.maximum(dot3(v, v), eps)))
    return scale3(v, inv)


def safe_normalize3(v):
    """maths.h SafeNormalize: zero vector stays zero."""
    l2 = dot3(v, v)
    inv = jnp.where(l2 > 1e-20,
                    jnp.reciprocal(jnp.sqrt(jnp.maximum(l2, 1e-20))), 0.0)
    return scale3(v, inv)


def face_forward3(n, v):
    return where3(dot3(n, v) < 0.0, neg3(n), n)


def basis_from_vector3(w):
    """maths.h BasisFromVector (ops/sampling.py twin), component form."""
    wx, wy, wz = w
    inv_xz = jnp.reciprocal(jnp.sqrt(jnp.maximum(wx * wx + wz * wz, 1e-20)))
    inv_yz = jnp.reciprocal(jnp.sqrt(jnp.maximum(wy * wy + wz * wz, 1e-20)))
    zero = jnp.zeros_like(wx)
    use_a = jnp.abs(wx) > jnp.abs(wy)
    u = (
        jnp.where(use_a, -wz * inv_xz, zero),
        jnp.where(use_a, zero, wz * inv_yz),
        jnp.where(use_a, wx * inv_xz, -wy * inv_yz),
    )
    v = cross3(w, u)
    return u, v


def reflect3(v, h):
    return sub3(scale3(h, 2.0 * dot3(v, h)), v)


def refract3(wi, n, eta):
    cos_i = dot3(n, wi)
    sin2_i = jnp.maximum(0.0, 1.0 - cos_i * cos_i)
    sin2_t = eta * eta * sin2_i
    ok = sin2_t < 1.0
    cos_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2_t))
    wt = add3(scale3(neg3(wi), eta), scale3(n, eta * cos_i - cos_t))
    return wt, ok


def schlick_fresnel(u):
    m = jnp.clip(1.0 - u, 0.0, 1.0)
    m2 = m * m
    return m2 * m2 * m


def fresnel_dielectric(v_dot_n, eta_i, eta_t):
    sin2_t = (eta_i / eta_t) ** 2 * (1.0 - v_dot_n * v_dot_n)
    tir = sin2_t > 1.0
    l_dot_n = jnp.sqrt(jnp.maximum(0.0, 1.0 - jnp.minimum(sin2_t, 1.0)))
    eta = eta_t / eta_i
    d1 = v_dot_n + eta * l_dot_n
    d2 = l_dot_n + eta * v_dot_n
    r1 = (v_dot_n - eta * l_dot_n) / jnp.where(jnp.abs(d1) < 1e-12, 1e-12, d1)
    r2 = (l_dot_n - eta * v_dot_n) / jnp.where(jnp.abs(d2) < 1e-12, 1e-12, d2)
    return jnp.where(tir, 1.0, 0.5 * (r1 * r1 + r2 * r2))


def _gtr1(n_dot_h, a):
    a2 = a * a
    t = 1.0 + (a2 - 1.0) * n_dot_h * n_dot_h
    safe_log = jnp.log(jnp.clip(a2, 1e-8, 0.999999))
    val = (a2 - 1.0) / (PI * safe_log * jnp.where(t == 0.0, 1e-8, t))
    return jnp.where(a >= 1.0, INV_PI, val)


def _gtr2(n_dot_h, a):
    a2 = a * a
    t = 1.0 + (a2 - 1.0) * n_dot_h * n_dot_h
    return a2 / (PI * jnp.maximum(t * t, 1e-12))


def _smith_ggx(n_dot_v, alpha_g):
    a = alpha_g * alpha_g
    b = n_dot_v * n_dot_v
    return 1.0 / jnp.maximum(
        n_dot_v + jnp.sqrt(jnp.maximum(a + b - a * b, 0.0)), 1e-8
    )


# ---- material view over tri_pack planes ------------------------------------

class Mat:
    """Plane-wise view of the material columns riding the tri_pack row
    (cols 12:36 — models/material.py packed layout)."""

    __slots__ = ("color", "emission", "eta", "metallic", "subsurface",
                 "specular", "roughness", "specular_tint", "clearcoat",
                 "clearcoat_gloss", "transmission", "flags")

    def __init__(self, attr):
        m = attr[12:36]
        self.color = (m[0], m[1], m[2])
        self.emission = (m[3], m[4], m[5])
        # absorption m[6:9] tracked-but-unapplied (reference parity)
        self.eta = m[9]
        self.metallic = m[10]
        self.subsurface = m[11]
        self.specular = m[12]
        self.roughness = m[13]
        self.specular_tint = m[14]
        # anisotropic m[15], sheen m[16], sheen_tint m[17] unused (Disney.cuh)
        self.clearcoat = m[18]
        self.clearcoat_gloss = m[19]
        self.transmission = m[20]
        self.flags = lax.bitcast_convert_type(m[22], jnp.int32)


# ---- Disney BSDF, component form (ops/bsdf.py formula twins) ----------------

def bsdf_pdf_c(m: Mat, eta_i, eta_o, n, view, light):
    n_dot_l = dot3(light, n)
    below = n_dot_l <= 0.0
    brdf_pdf_below = INV_2PI * m.subsurface * 0.5

    f = fresnel_dielectric(dot3(n, view), eta_i, eta_o)
    a = jnp.maximum(0.001, m.roughness)
    half = safe_normalize3(add3(light, view))
    cos_theta_half = jnp.abs(dot3(half, n))
    pdf_half = _gtr2(cos_theta_half, a) * cos_theta_half
    pdf_spec = 0.25 * pdf_half / jnp.maximum(1e-6, dot3(light, half))
    pdf_diff = jnp.abs(n_dot_l) * INV_PI * (1.0 - m.subsurface)
    bsdf_pdf_above = pdf_spec * f
    brdf_pdf_above = 0.5 * (pdf_diff + pdf_spec)

    brdf_p = jnp.where(below, brdf_pdf_below, brdf_pdf_above)
    bsdf_p = jnp.where(below, jnp.zeros_like(brdf_pdf_below), bsdf_pdf_above)
    return brdf_p + m.transmission * (bsdf_p - brdf_p)


def bsdf_eval_c(m: Mat, albedo, eta_i, eta_o, n, view, light):
    n_dot_l = dot3(light, n)
    n_dot_v = dot3(n, view)
    h = safe_normalize3(add3(light, view))
    n_dot_h = dot3(n, h)
    l_dot_h = dot3(light, h)

    cdlin = albedo
    cdlum = 0.3 * cdlin[0] + 0.6 * cdlin[1] + 0.1 * cdlin[2]
    safe_lum = jnp.maximum(cdlum, 1e-8)
    ctint = where3(cdlum > 0.0, scale3(cdlin, 1.0 / safe_lum),
                   (jnp.ones_like(cdlum),) * 3)
    spec08 = m.specular * 0.08
    cspec0_d = tuple(spec08 * (1.0 + m.specular_tint * (c - 1.0))
                     for c in ctint)
    cspec0 = tuple(cd + m.metallic * (cl - cd)
                   for cd, cl in zip(cspec0_d, cdlin))

    below = n_dot_l <= 0.0
    a = jnp.maximum(0.001, m.roughness)

    # BSDF (transmission) side
    f_v = fresnel_dielectric(n_dot_v, eta_i, eta_o)
    bsdf_below_s = (m.transmission * (1.0 - f_v)
                    / jnp.maximum(jnp.abs(n_dot_l), 1e-6)
                    * (1.0 - m.metallic))
    ds = _gtr2(n_dot_h, a)
    fh_d = fresnel_dielectric(l_dot_h, eta_i, eta_o)
    gs = _smith_ggx(n_dot_v, a) * _smith_ggx(n_dot_l, a)
    gsds = gs * ds
    bsdf_side = tuple(
        jnp.where(below, bsdf_below_s, gsds * (c0 + fh_d * (1.0 - c0)))
        for c0 in cspec0
    )
    bsdf_side = where3(m.transmission > 0.0, bsdf_side,
                       (jnp.zeros_like(gsds),) * 3)

    # BRDF side
    fl_abs = schlick_fresnel(jnp.abs(n_dot_l))
    fv = schlick_fresnel(n_dot_v)
    fd_ss = (1.0 - 0.5 * fl_abs) * (1.0 - 0.5 * fv)
    ss_s = INV_PI * m.subsurface * fd_ss * (1.0 - m.metallic)
    brdf_below = tuple(
        jnp.where(m.subsurface > 0.0,
                  ss_s * jnp.sqrt(jnp.maximum(c, 0.0)), 0.0)
        for c in m.color
    )

    fh = schlick_fresnel(l_dot_h)
    fl = schlick_fresnel(n_dot_l)
    fd90 = 0.5 + 2.0 * l_dot_h * l_dot_h * m.roughness
    fd = (1.0 + fl * (fd90 - 1.0)) * (1.0 + fv * (fd90 - 1.0))
    dr = _gtr1(n_dot_h, 0.1 + m.clearcoat_gloss * (0.001 - 0.1))
    fc = 0.04 + fh * (1.0 - 0.04)
    gr = _smith_ggx(n_dot_l, 0.25) * _smith_ggx(n_dot_v, 0.25)
    diff_s = INV_PI * fd * (1.0 - m.metallic) * (1.0 - m.subsurface)
    cc = m.clearcoat * gr * fc * dr
    brdf_above = tuple(
        diff_s * cl + gsds * (c0 + fh * (1.0 - c0)) + cc
        for cl, c0 in zip(cdlin, cspec0)
    )
    brdf_side = where3(below, brdf_below, brdf_above)
    brdf_side = where3(m.transmission < 1.0, brdf_side,
                       (jnp.zeros_like(gsds),) * 3)

    return tuple(b + m.transmission * (s - b)
                 for b, s in zip(brdf_side, bsdf_side))


def bsdf_sample_c(m: Mat, eta_i, eta_o, u, v, n, view, uni):
    """uni: 6 planes [branch_t, branch_f, branch_half, branch_ss, r1, r2].
    Returns (light 3-planes, pdf, sample_type i32)."""
    u_t, u_f, u_half, u_ss, r1, r2 = uni
    f = fresnel_dielectric(dot3(n, view), eta_i, eta_o)

    # GGX half vector in the (u, v, n) frame, flipped into view's hemisphere
    a = jnp.maximum(0.001, m.roughness)
    phi = r1 * TWO_PI
    cos_th = jnp.sqrt(
        jnp.clip((1.0 - r2) / (1.0 + (a * a - 1.0) * r2), 0.0, 1.0)
    )
    sin_th = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_th * cos_th))
    cphi = jnp.cos(phi)
    sphi = jnp.sin(phi)
    half = add3(add3(scale3(u, sin_th * cphi), scale3(v, sin_th * sphi)),
                scale3(n, cos_th))
    half = where3(dot3(half, view) <= 0.0, neg3(half), half)
    light_spec = reflect3(view, half)

    # cosine hemisphere (disc + project)
    rr = jnp.sqrt(r1)
    theta_d = TWO_PI * r2
    dx = rr * jnp.cos(theta_d)
    dy = rr * jnp.sin(theta_d)
    dz = jnp.sqrt(jnp.maximum(0.0, 1.0 - dx * dx - dy * dy))
    light_diff = add3(add3(scale3(u, dx), scale3(v, dy)), scale3(n, dz))

    # uniform hemisphere sampled INSIDE the surface (Disney.cuh:269-273)
    z_u = r1
    w_u = jnp.sqrt(jnp.maximum(0.0, 1.0 - z_u * z_u))
    phi_u = TWO_PI * r2
    light_ss = add3(
        add3(scale3(u, jnp.cos(phi_u) * w_u), scale3(v, jnp.sin(phi_u) * w_u)),
        scale3(n, -z_u),
    )

    eta_ratio = eta_i / eta_o
    light_refr, refr_ok = refract3(view, n, eta_ratio)

    trans_branch = u_t < m.transmission
    spec_in_trans = u_f < f
    diffuse_half = u_half < 0.5
    ss_pick = u_ss < m.subsurface

    refl_light = where3(diffuse_half,
                        where3(ss_pick, light_ss, light_diff), light_spec)
    refl_type = jnp.where(diffuse_half & ss_pick, _TRANSMITTED,
                          _REFLECTED).astype(jnp.int32)
    light = where3(trans_branch,
                   where3(spec_in_trans, light_spec, light_refr), refl_light)
    sample_type = jnp.where(
        trans_branch,
        jnp.where(spec_in_trans, _REFLECTED, _SPECULAR),
        refl_type,
    ).astype(jnp.int32)

    pdf_smooth = bsdf_pdf_c(m, eta_i, eta_o, n, view, light)
    is_spec_refr = trans_branch & ~spec_in_trans
    pdf = jnp.where(
        is_spec_refr,
        jnp.where(refr_ok, (1.0 - f) * m.transmission, 0.0),
        pdf_smooth,
    )
    return light, pdf, sample_type


# ---- probe alias-row finish (ops/probe_sampling.probe_sample tail) ----------

def probe_finish_c(g, r2, probe_w: int, probe_h: int):
    """From the gathered 13-col alias row (tuple of planes) and the accept
    uniform: (wi 3-planes, sky color 3-planes, solid-angle pdf)."""
    accept = r2 < g[0]
    u = jnp.where(accept, g[1], g[7])
    v = jnp.where(accept, g[2], g[8])
    pdf = jnp.where(accept, g[3], g[9])
    color = (jnp.where(accept, g[4], g[10]),
             jnp.where(accept, g[5], g[11]),
             jnp.where(accept, g[6], g[12]))
    sin_theta = jnp.sin(v * PI)
    zero = sin_theta == 0.0
    pdf = jnp.where(
        zero, 0.0,
        pdf * probe_w * probe_h
        / (2.0 * PI * PI * jnp.where(zero, 1.0, sin_theta)),
    )
    theta = v * PI
    phi = u * TWO_PI
    s_t = jnp.sin(theta)
    wi = (-s_t * jnp.cos(phi), jnp.cos(theta), -s_t * jnp.sin(phi))
    return wi, color, pdf


# ---- the bounce shading core ------------------------------------------------

def shade_core(
    o, d,                   # 3-plane tuples: current ray
    attr,                   # 48 planes: gathered tri_pack row
    probe_g,                # 13 planes: gathered probe alias row
    uni,                    # 8 planes: per-ray uniforms u_all[:, 0:8]
    thru,                   # nch-plane tuple: path throughput
    eta_in,                 # plane
    hit_mask,               # bool plane (alive & hit)
    probe_w: int, probe_h: int,
    tmin: float, tmax: float,
    tex_col=None,           # 3 planes: texture color (textured scenes)
    tex_valid=None,         # bool plane: texture sampled & tex_id >= 0
    eta_override=None,      # fn(Mat) -> eta_mat plane (spectral dispersion)
    lift=None,              # fn(3 planes) -> nch planes (spectral); None=id
    need_aov: bool = False,
    ng_override=None,       # 3 planes: world-space geometric normal
                            # (instanced scenes transform it in XLA)
    tuv_override=None,      # (t, u, v) planes when already computed (textured
                            # scenes need uv before the texel gather)
    probe_override=None,    # (wi3, color3, pdf) planes — huge probes without
                            # packed sample_rows sample in XLA instead
):
    """One bounce's shading math, gathered inputs -> occlusion-independent
    outputs. Twin of __closesthit__radiance + SampleLights
    (deviceProgram.cu:619-732, :303-344); see render/integrator.py for the
    occlusion query and the post-occlusion radiance/alpha wiring that
    consumes this dict.

    Returns dict of planes:
      t, p (3), wi (3), occl_query (bool), tl (nch: throughput*light_c),
      light_c (nch), l_dir (3), sample_ok (bool), transmitted (bool),
      is_catcher (bool), emission (3: raw material emission),
      eta_out, new_thru (nch), trans_amt, eta_mat,
      [normal (3), albedo (3) when need_aov].
    """
    if lift is None:
        lift = lambda rgb: rgb  # noqa: E731

    m = Mat(attr)
    is_catcher = (m.flags & MATERIAL_FLAG_SHADOW_CATCHER) != 0

    if tuv_override is not None:
        t, hu, hv = tuv_override
    else:
        # winning-triangle re-intersection (tri_pack cols 36:45 — bit-exact
        # MT twin of the traversal's leaf test; see integrator._hit_tuv)
        v0 = (attr[36], attr[37], attr[38])
        e1 = (attr[39], attr[40], attr[41])
        e2 = (attr[42], attr[43], attr[44])
        pv = cross3(d, e2)
        det = dot3(e1, pv)
        det_ok = jnp.abs(det) > 1e-9
        inv_det = jnp.where(det_ok, 1.0 / jnp.where(det_ok, det, 1.0), 0.0)
        tv = sub3(o, v0)
        hu = dot3(tv, pv) * inv_det
        qv = cross3(tv, e1)
        hv = dot3(d, qv) * inv_det
        t = dot3(e2, qv) * inv_det

    p = where3(hit_mask, add3(o, scale3(d, t)), o)  # dead lanes stay finite
    ng = (attr[0], attr[1], attr[2]) if ng_override is None else ng_override
    nrm = face_forward3(ng, neg3(d))

    # albedo: material color, texture-modulated when present (cu:655-670)
    if tex_col is not None:
        albedo = where3(tex_valid, tex_col, m.color)
    else:
        albedo = m.color

    eta_mat = m.eta if eta_override is None else eta_override(m)
    entering = eta_in == 1.0
    out_eta = jnp.where(entering, eta_mat, 1.0)

    # ---- NEE probe sampling with MIS (SampleLights/SampleShadow) ----
    if probe_override is not None:
        wi, sky_col, sky_pdf = probe_override
    else:
        wi, sky_col, sky_pdf = probe_finish_c(
            probe_g, uni[1], probe_w, probe_h
        )
    view = neg3(d)
    nee_pdf = bsdf_pdf_c(m, eta_in, out_eta, nrm, view, wi)
    nee_f = bsdf_eval_c(m, albedo, eta_in, out_eta, nrm, view, wi)
    denom = 0.5 * nee_pdf + 0.5 * sky_pdf
    weight = jnp.where(denom > 0, 0.5 * sky_pdf / jnp.maximum(denom, 1e-20),
                       0.0)
    valid = (nee_pdf > 0.0) & (weight > 0.0) & (sky_pdf > 0.0)
    wscale = weight * jnp.abs(dot3(wi, nrm)) / jnp.maximum(sky_pdf, 1e-20)
    light_val = tuple(
        jnp.where(valid, wscale * sc * nf, 0.0)
        for sc, nf in zip(sky_col, nee_f)
    )
    lv_max = jnp.maximum(jnp.maximum(light_val[0], light_val[1]),
                         light_val[2])
    occl_query = hit_mask & (lv_max > 0.0)
    light_c = lift(light_val)
    tl = tuple(th * lc for th, lc in zip(thru, light_c))

    # ---- BSDF sampling (cu:700-731) ----
    u_f, v_f = basis_from_vector3(nrm)
    l_dir, pdf, _stype = bsdf_sample_c(
        m, eta_in, out_eta, u_f, v_f, nrm, view,
        (uni[2], uni[3], uni[4], uni[5], uni[6], uni[7]),
    )
    sample_ok = pdf > 0.0
    f_b = bsdf_eval_c(m, albedo, eta_in, out_eta, nrm, view, l_dir)
    transmitted = dot3(l_dir, nrm) <= 0.0
    eta_out = jnp.where(hit_mask & transmitted, out_eta, eta_in)
    ts = jnp.abs(dot3(nrm, l_dir)) / jnp.maximum(pdf, 1e-20)
    thr_scale = lift(tuple(fb * ts for fb in f_b))
    gate = hit_mask & sample_ok
    new_thru = tuple(jnp.where(gate, th * sc, th)
                     for th, sc in zip(thru, thr_scale))

    out = {
        "t": t, "p": p, "wi": wi, "occl_query": occl_query,
        "tl": tl, "light_c": light_c, "l_dir": l_dir,
        "sample_ok": sample_ok, "transmitted": transmitted,
        "is_catcher": is_catcher, "emission": m.emission,
        "eta_out": eta_out, "new_thru": new_thru, "thr_scale": thr_scale,
        "trans_amt": m.transmission, "eta_mat": eta_mat,
        "eta_base": m.eta, "hit_u": hu, "hit_v": hv,
    }
    if need_aov:
        out["normal"] = nrm
        out["albedo"] = albedo
    return out
