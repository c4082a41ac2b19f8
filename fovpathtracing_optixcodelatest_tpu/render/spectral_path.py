"""Hero-wavelength spectral path tracing through the FULL wavefront
integrator.

The reference ships spectrum.h as dead code (never #included — SURVEY.md
§2.1); render/spectral.py already renders direct-lighting dispersion. This
module carries the spectral machinery through the complete multi-bounce
path-tracing loop: every path tracks NUM_HERO wavelengths (one hero + 3
rotations, ops/spectrum.py:133-140), shading is evaluated per wavelength by
lifting the RGB BSDF/light values through the Smits-style basis
(rgb_to_spectrum), and dispersive refraction (Cauchy eta(lambda),
render/spectral.py:38-43) collapses the non-hero wavelengths at the first
dispersive transmission — the standard hero-wavelength estimator.

Structure mirrors render/integrator.py (same traversal, NEE+MIS, Disney
sampling, DONE-before-add gating, emission-primary-only); the carry is
spectral: throughput/radiance are (N, NUM_HERO). Shadow-catcher alpha and
AOVs are RGB-film features and are not modeled here.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from fovpathtracing_optixcodelatest_tpu.config import RenderConfig
from fovpathtracing_optixcodelatest_tpu.models.scene import Scene
from fovpathtracing_optixcodelatest_tpu.models.texture import sample_bilinear_wrap
from fovpathtracing_optixcodelatest_tpu.ops import bsdf as bsdf_ops
from fovpathtracing_optixcodelatest_tpu.ops import probe_sampling as probe_ops
from fovpathtracing_optixcodelatest_tpu.ops import spectrum as sp
from fovpathtracing_optixcodelatest_tpu.ops import traverse8
from fovpathtracing_optixcodelatest_tpu.ops.rng import ray_uniforms
from fovpathtracing_optixcodelatest_tpu.ops.sampling import (
    basis_from_vector,
    dot,
    face_forward,
)
from fovpathtracing_optixcodelatest_tpu.render.spectral import cauchy_eta

_SPAN = sp.LAMBDA_MAX - sp.LAMBDA_MIN


def _rgb_eval_at(rgb: jnp.ndarray, lam: jnp.ndarray) -> jnp.ndarray:
    """Evaluate the spectral lift of (N, 3) linear RGB at (N, K) wavelengths:
    sum_c rgb_c * basis_c(lambda). Equivalent to
    eval_spectrum_at(rgb_to_spectrum(rgb), lam) without materializing the
    81-bin spectra."""
    basis = jnp.asarray(sp.RGB_BASIS, dtype=jnp.float32)  # (3, B)
    t = (lam - sp.LAMBDA_MIN) / _SPAN * (sp.NUM_BINS - 1)
    t = jnp.clip(t, 0.0, sp.NUM_BINS - 1)
    i0 = jnp.minimum(t.astype(jnp.int32), sp.NUM_BINS - 2)
    frac = t - i0
    out = jnp.zeros_like(lam)
    for c in range(3):
        row = basis[c]
        b0 = jnp.take(row, i0)
        b1 = jnp.take(row, i0 + 1)
        out = out + rgb[:, c : c + 1] * (b0 * (1 - frac) + b1 * frac)
    return jnp.maximum(out, 0.0)


def trace_paths_spectral(
    scene: Scene,
    origin: jnp.ndarray,
    direction: jnp.ndarray,
    active: jnp.ndarray,
    key: jnp.ndarray,
    config: RenderConfig,
    ray_ids: jnp.ndarray | None = None,
    dispersion: float = 4200.0,
) -> Dict[str, jnp.ndarray]:
    """Trace N spectral paths to completion; returns dict with
    radiance (N, 3) linear sRGB (CIE-integrated over the hero wavelengths)
    and traces (). ``dispersion`` is the Cauchy B coefficient in nm^2
    applied to transmissive materials (0 = achromatic refraction)."""
    n = origin.shape[0]
    nh = sp.NUM_HERO
    if ray_ids is None:
        ray_ids = jnp.arange(n, dtype=jnp.int32)
    ray_ids = ray_ids.astype(jnp.int32)

    lam = sp.sample_hero_wavelengths(
        ray_uniforms(jax.random.fold_in(key, 7919), ray_ids, 1)[:, 0]
    )  # (N, NH)

    carry = dict(
        origin=origin,
        direction=direction,
        throughput=jnp.ones((n, nh), dtype=jnp.float32),
        eta=jnp.ones((n,), dtype=jnp.float32),  # hero-path medium state
        radiance=jnp.zeros((n, nh), dtype=jnp.float32),
        alive=active.astype(bool),
        lam_alive=jnp.ones((n, nh), dtype=bool),  # false after collapse
        traces=jnp.zeros((), dtype=jnp.int32),
    )

    def bounce(carry, depth):
        o = carry["origin"]
        d = carry["direction"]
        alive = carry["alive"]
        eta_in = carry["eta"]
        throughput = carry["throughput"]
        lam_alive = carry["lam_alive"]

        hit = traverse8.closest_hit(
            scene.bvh, o, d, config.tmin, config.tmax, active=alive
        )
        hit_mask = alive & hit["hit"]
        tri = jnp.maximum(hit["tri_id"], 0)

        p = o + hit["t"][:, None] * d
        p = jnp.where(hit_mask[:, None], p, o)
        attr = jnp.take(scene.geom.tri_pack, tri, axis=0)
        ng = attr[:, 0:3]
        nrm = face_forward(ng, -d)
        mat_id = lax.bitcast_convert_type(attr[:, 9], jnp.int32)
        tex_id = lax.bitcast_convert_type(attr[:, 10], jnp.int32)
        m = scene.materials.gather(mat_id)

        bu = hit["u"][:, None]
        bv = hit["v"][:, None]
        uv = (
            (1.0 - bu - bv) * attr[:, 3:5]
            + bu * attr[:, 5:7]
            + bv * attr[:, 7:9]
        )
        tex_col = sample_bilinear_wrap(scene.textures, tex_id, uv)
        albedo = jnp.where((tex_id >= 0)[:, None], tex_col, m.color)

        # hero-wavelength dispersive index of refraction (Cauchy)
        lam_hero = lam[:, 0]
        eta_mat = jnp.where(
            (m.transmission > 0.0) & (dispersion != 0.0),
            cauchy_eta(m.eta, lam_hero, dispersion),
            m.eta,
        )
        entering = eta_in == 1.0
        out_eta = jnp.where(entering, eta_mat, 1.0)

        # ---- NEE (per-wavelength radiance) ----
        u_all = ray_uniforms(jax.random.fold_in(key, depth), ray_ids, 8)
        wi, sky_col, sky_pdf = probe_ops.probe_sample(
            scene.probe, u_all[:, 0], u_all[:, 1]
        )
        view = -d
        nee_pdf = bsdf_ops.bsdf_pdf(m, eta_in, out_eta, nrm, view, wi)
        nee_f = bsdf_ops.bsdf_eval(m, albedo, eta_in, out_eta, nrm, view, wi)
        denom = 0.5 * nee_pdf + 0.5 * sky_pdf
        weight = jnp.where(
            denom > 0, 0.5 * sky_pdf / jnp.maximum(denom, 1e-20), 0.0
        )
        valid = (nee_pdf > 0.0) & (weight > 0.0) & (sky_pdf > 0.0)
        light_rgb = jnp.where(
            valid[:, None],
            weight[:, None]
            * sky_col
            * nee_f
            * jnp.abs(dot(wi, nrm))[:, None]
            / jnp.maximum(sky_pdf, 1e-20)[:, None],
            0.0,
        )
        occl = traverse8.occluded(
            scene.bvh, p, wi, config.tmin, config.tmax, active=hit_mask
        )
        light_lam = _rgb_eval_at(light_rgb, lam)  # (N, NH)
        nee_contrib = jnp.where((~occl)[:, None], light_lam, 0.0)

        # emission on primary hits only
        emis_lam = _rgb_eval_at(m.emission, lam)
        vert = nee_contrib + jnp.where(
            (depth == 0) & hit_mask, 1.0, 0.0
        )[:, None] * emis_lam

        # ---- BSDF sampling (hero-path geometry) ----
        u_frame, v_frame = basis_from_vector(nrm)
        l_dir, pdf, _stype = bsdf_ops.bsdf_sample(
            m, eta_in, out_eta, u_frame, v_frame, nrm, view, u_all[:, 2:8]
        )
        sample_ok = pdf > 0.0
        f_rgb = bsdf_ops.bsdf_eval(m, albedo, eta_in, out_eta, nrm, view, l_dir)
        f_lam = _rgb_eval_at(f_rgb, lam)
        transmitted = dot(l_dir, nrm) <= 0.0
        eta_out = jnp.where(hit_mask & transmitted, out_eta, eta_in)

        # dispersive transmission collapses the non-hero wavelengths: their
        # refracted geometry would differ, so only the hero continues
        dispersive = (
            hit_mask & transmitted & (m.transmission > 0.0)
            & (jnp.abs(eta_mat - m.eta) > 1e-6)
        )
        keep = jnp.concatenate(
            [jnp.ones((n, 1), bool),
             jnp.broadcast_to((~dispersive)[:, None], (n, nh - 1))],
            axis=1,
        )
        new_lam_alive = lam_alive & keep

        new_throughput = jnp.where(
            (hit_mask & sample_ok)[:, None] & new_lam_alive,
            throughput
            * f_lam
            * jnp.abs(dot(nrm, l_dir))[:, None]
            / jnp.maximum(pdf, 1e-20)[:, None],
            jnp.where((hit_mask & sample_ok)[:, None], 0.0, throughput),
        )

        contrib = jnp.where(
            (hit_mask & sample_ok)[:, None] & lam_alive,
            throughput * vert,
            0.0,
        )

        new_carry = dict(
            origin=jnp.where(hit_mask[:, None], p, o),
            direction=jnp.where(hit_mask[:, None], l_dir, d),
            throughput=new_throughput,
            eta=eta_out,
            radiance=carry["radiance"] + contrib,
            alive=hit_mask & sample_ok,
            lam_alive=new_lam_alive,
            traces=carry["traces"]
            + jnp.sum(alive.astype(jnp.int32))
            + jnp.sum(hit_mask.astype(jnp.int32)),
        )
        return new_carry, None

    carry, _ = lax.scan(
        bounce, carry, jnp.arange(config.max_depth, dtype=jnp.int32)
    )

    # CIE integration of the hero estimator: each wavelength is a uniform
    # sample of the visible span (pdf 1/span), averaged over NUM_HERO;
    # normalization matches spectrum_to_xyz (Y-normalized)
    xbar, ybar, zbar = sp.cie_xyz_bar_jnp(lam)
    rad = carry["radiance"]
    scale = _SPAN / nh / (sp._Y_NORM)
    xyz = jnp.stack(
        [
            jnp.sum(rad * xbar, axis=1) * scale,
            jnp.sum(rad * ybar, axis=1) * scale,
            jnp.sum(rad * zbar, axis=1) * scale,
        ],
        axis=1,
    )
    rgb = jnp.einsum(
        "nc,rc->nr", xyz, jnp.asarray(sp.XYZ_TO_SRGB, dtype=jnp.float32)
    )
    return {"radiance": rgb, "traces": carry["traces"]}
