"""Spectral rendering path: hero-wavelength direct lighting with dispersion.

Capability twin for the "spectral sampling (Probe.cuh/spectrum.h)" config of
BASELINE.json (configs[4]) — the reference carries spectrum.h as dead code;
here the spectral machinery actually renders: each pixel traces NUM_HERO
rotated wavelengths (ops/spectrum.py), materials with transmission refract
dispersively via a Cauchy model eta(λ) = eta + B/λ², and probe radiance is
lifted to spectra and integrated back through the CIE curves to sRGB.

Scope: a direct-lighting spectral renderer (primary hit + one dispersive
refraction chain + environment lookup) — the prism/diamond use case — not a
full spectral path tracer (round-2 candidate: hero-wavelength trace_paths).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from fovpathtracing_optixcodelatest_tpu.models.camera import CameraParams
from fovpathtracing_optixcodelatest_tpu.models.scene import Scene
from fovpathtracing_optixcodelatest_tpu.ops import spectrum as sp
from fovpathtracing_optixcodelatest_tpu.ops import traverse8
from fovpathtracing_optixcodelatest_tpu.ops.probe_sampling import dir_to_uv, probe_eval
from fovpathtracing_optixcodelatest_tpu.ops.rng import ray_uniforms
from fovpathtracing_optixcodelatest_tpu.ops.sampling import (
    dot,
    face_forward,
    fresnel_dielectric,
    normalize,
    refract,
)


def cauchy_eta(eta_d: jnp.ndarray, lam: jnp.ndarray,
               dispersion: float = 12000.0) -> jnp.ndarray:
    """Cauchy dispersion: eta(λ) = A + B/λ² with A set so eta(589nm) = eta_d.
    ``dispersion`` is B in nm² (≈4200 for BK7 glass; exaggerate for demos)."""
    a = eta_d - dispersion / (589.3**2)
    return a + dispersion / (lam * lam)


@functools.partial(jax.jit, static_argnames=("width", "height", "max_bounces"))
def spectral_render(
    scene: Scene,
    camera: CameraParams,
    width: int,
    height: int,
    dispersion: float = 12000.0,
    max_bounces: int = 3,
    key=None,
):
    """Render with per-wavelength refraction. Returns (H, W, 3) uint8 linear→
    sRGB via the CIE pipeline. Transmissive materials refract dispersively;
    opaque hits shade as spectral albedo × probe; misses show the backplate.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    n_pix = width * height
    k = sp.NUM_HERO
    n = n_pix * k

    x = jnp.arange(width, dtype=jnp.float32)
    y = jnp.arange(height, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(x, y)
    ndc_x = 2.0 * (gx.reshape(-1) + 0.5) / width - 1.0
    ndc_y = 2.0 * (gy.reshape(-1) + 0.5) / height - 1.0
    base_dir = normalize(
        ndc_x[:, None] * camera.u[None, :]
        + ndc_y[:, None] * camera.v[None, :]
        + camera.w[None, :]
    )
    # hero wavelengths per pixel
    u = ray_uniforms(key, jnp.arange(n_pix, dtype=jnp.int32), 1)[:, 0]
    lam = sp.sample_hero_wavelengths(u)  # (P, K)
    lam_flat = lam.reshape(-1)

    origin = jnp.repeat(camera.eye[None, :], n_pix, axis=0)
    origin = jnp.repeat(origin, k, axis=0)
    direction = jnp.repeat(base_dir, k, axis=0)
    throughput = jnp.ones((n,), dtype=jnp.float32)
    radiance = jnp.zeros((n,), dtype=jnp.float32)
    alive = jnp.ones((n,), dtype=bool)

    for _bounce in range(max_bounces):
        hit = traverse8.closest_hit(scene.bvh, origin, direction, 1e-3, 1e16,
                                    active=alive)
        hm = alive & hit["hit"]
        tri = jnp.maximum(hit["tri_id"], 0)
        p = origin + hit["t"][:, None] * direction
        attr = jnp.take(scene.geom.tri_pack, tri, axis=0)
        ng = attr[:, 0:3]
        nrm = face_forward(ng, -direction)
        mat_id = jax.lax.bitcast_convert_type(attr[:, 9], jnp.int32)
        mat = scene.materials.gather(mat_id)

        # miss → environment radiance at this wavelength
        env_rgb = probe_eval(scene.probe, dir_to_uv(direction))
        env_spec = sp.eval_spectrum_at(
            sp.rgb_to_spectrum(env_rgb), lam_flat[:, None]
        )[:, 0]
        radiance = radiance + jnp.where(
            alive & ~hit["hit"], throughput * env_spec, 0.0
        )

        transmissive = mat.transmission > 0.5
        # dispersive eta per wavelength
        eta_l = cauchy_eta(mat.eta, lam_flat, dispersion)
        entering = dot(direction, ng) < 0.0
        eta_ratio = jnp.where(entering, 1.0 / eta_l, eta_l)
        refr, ok = refract(-direction, nrm, eta_ratio)
        f = fresnel_dielectric(
            jnp.abs(dot(nrm, -direction)),
            jnp.where(entering, 1.0, eta_l),
            jnp.where(entering, eta_l, 1.0),
        )
        # transmissive: refract (or TIR-reflect); throughput *= (1-F)
        refl = direction - 2.0 * dot(direction, nrm)[:, None] * nrm
        new_dir = jnp.where(ok[:, None], refr, refl)
        new_tp = throughput * jnp.where(ok, 1.0 - f, 1.0)

        # opaque: terminate with spectral albedo × ambient probe radiance
        alb_spec = sp.eval_spectrum_at(
            sp.rgb_to_spectrum(mat.color), lam_flat[:, None]
        )[:, 0]
        up = jnp.broadcast_to(
            jnp.asarray([0.0, 1.0, 0.0], jnp.float32), nrm.shape
        )
        sky_rgb = probe_eval(scene.probe, dir_to_uv(up))
        sky_spec = sp.eval_spectrum_at(
            sp.rgb_to_spectrum(sky_rgb), lam_flat[:, None]
        )[:, 0]
        lambert = jnp.maximum(dot(nrm, up), 0.1)
        radiance = radiance + jnp.where(
            hm & ~transmissive, throughput * alb_spec * sky_spec * lambert, 0.0
        )

        origin = jnp.where(hm[:, None], p + 1e-3 * new_dir, origin)
        direction = jnp.where(hm[:, None], new_dir, direction)
        throughput = jnp.where(hm & transmissive, new_tp, throughput)
        alive = hm & transmissive

    # leftover transmissive paths: environment at final direction
    env_rgb = probe_eval(scene.probe, dir_to_uv(direction))
    env_spec = sp.eval_spectrum_at(
        sp.rgb_to_spectrum(env_rgb), lam_flat[:, None]
    )[:, 0]
    radiance = radiance + jnp.where(alive, throughput * env_spec, 0.0)

    # spectral → sRGB: treat each hero sample as a delta spectrum; integrate
    # radiance(λ)·CMF(λ) over the K rotated samples (uniform pdf)
    lam_p = lam  # (P, K)
    rad_p = radiance.reshape(n_pix, k)
    xb, yb, zb = sp.cie_xyz_bar_jnp(jnp.asarray(lam_p))
    span = sp.LAMBDA_MAX - sp.LAMBDA_MIN
    norm = span / k / sp._Y_NORM
    xyz = jnp.stack(
        [
            jnp.sum(rad_p * xb, axis=1) * norm,
            jnp.sum(rad_p * yb, axis=1) * norm,
            jnp.sum(rad_p * zb, axis=1) * norm,
        ],
        axis=-1,
    )
    m = jnp.asarray(sp.XYZ_TO_SRGB, dtype=jnp.float32)
    rgb = jnp.einsum("pc,rc->pr", xyz, m).reshape(height, width, 3)
    from fovpathtracing_optixcodelatest_tpu.ops.tonemap import postprocess

    return postprocess(rgb, exposure_stops=0.0, white=2.0)
