"""Wavefront path-tracing integrator.

Behavior twin of the reference megakernel (deviceProgram.cu __raygen__ bounce
loop :497-534 + __closesthit__radiance :619-732 + SampleLights :303-344),
restructured TPU-first: the whole ray batch advances one bounce at a time
(statically unrolled — max_depth is 4); each bounce is one closest-hit
traversal, vectorized shading (probe NEE with MIS + Disney BSDF sampling), and
one occlusion traversal.

Wavefront compaction (``config.compact_bounces``): per-ray loop state is a
list of (N,) columns, and each bounce starts with ONE multi-operand
``lax.sort`` keyed dead-last (stable, so ray coherence survives). Dead rays
collapse into trailing traversal chunks whose while_loops exit immediately
(ops/traverse8.py chunked lax.map). Occlusion rays get their own sort keyed
on "NEE contribution provably nonzero" — light_val == 0 means the occlusion
result cannot matter, so the query is never walked (the BSDF-below-horizon
case kills ~half of them; the reference traces those anyway,
deviceProgram.cu:315-321).

Why multi-operand sort and not argsort+gather: a mid-graph (N, 25) matrix gets
a column-major layout from XLA (its producers and column-slice consumers both
prefer it), which turns a row gather into element gathers — measured 80-96 ms
per permutation at N=1.9M against 12.5 ms for one 26-operand lax.sort. The
same applies to (N, 3) gathers (T(4,128) layout, ~12 ms each). All compaction
here is therefore expressed as sorts over 1-D columns; the only scatter-free
inverse needed (un-sorting the occlusion bits) is a second 2-operand sort
keyed by the carried original index.

Reference semantics preserved exactly:
- Environment light contributes ONLY via NEE (the miss program adds nothing,
  deviceProgram.cu:253-282); primary-ray misses composite the backplate via
  alpha in the film stage (:495,558).
- A hit's NEE + emission contribution is DISCARDED if its BSDF sample fails
  (pdf<=0 sets DONE before the radiance add, :515-527 ordering).
- Emission is added on primary hits only (:696-698).
- alpha is *assigned* 1 on any non-catcher hit; shadow-catcher hits
  *accumulate* throughput·SampleShadow instead (:646-651,691-694).
- eta/absorption medium tracking flips on transmission (:673-683,717-721);
  absorption is tracked but never applied — same as the reference.
- MIS weight: csky=cbsdf=0.5 ⇒ weight = skyPdf/(bsdfPdf+skyPdf) (:326-339).

Deviation (documented): the reference's shadow-catcher *pass-through* for
secondary rays (:646-651) decrements depth and re-traces, which is unbounded;
here catcher hits on secondary rays shade normally.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
from jax import lax

from fovpathtracing_optixcodelatest_tpu.config import RenderConfig
from fovpathtracing_optixcodelatest_tpu.models.material import (
    MATERIAL_FLAG_SHADOW_CATCHER,
)
from fovpathtracing_optixcodelatest_tpu.models.scene import Scene
from fovpathtracing_optixcodelatest_tpu.models.texture import sample_bilinear_wrap
from fovpathtracing_optixcodelatest_tpu.ops import bsdf as bsdf_ops
from fovpathtracing_optixcodelatest_tpu.ops import probe_sampling as probe_ops
from fovpathtracing_optixcodelatest_tpu.ops import traverse8
from fovpathtracing_optixcodelatest_tpu.ops.rng import ray_uniforms
from fovpathtracing_optixcodelatest_tpu.ops.sampling import (
    basis_from_vector,
    dot,
    face_forward,
)

# Carry column indices (each a (N,) array; sort operand order)
_ORIGIN = (0, 1, 2)
_DIR = (3, 4, 5)
_THROUGHPUT = (6, 7, 8)
_ETA = 9
_RADIANCE = (10, 11, 12)
_ALPHA = (13, 14, 15)
_NORMAL = (16, 17, 18)
_ALBEDO = (19, 20, 21)
_ALIVE = 22  # bool
_SLOT = 23  # i32 original batch index — final unsort key
_RAY_ID = 24  # i32 global ray id — RNG stream key


def _v3(cols: List[jnp.ndarray], idx) -> jnp.ndarray:
    return jnp.stack([cols[i] for i in idx], axis=1)


def trace_paths(
    scene: Scene,
    origin: jnp.ndarray,
    direction: jnp.ndarray,
    active: jnp.ndarray,
    key: jnp.ndarray,
    config: RenderConfig,
    ray_ids: jnp.ndarray | None = None,
) -> Dict[str, jnp.ndarray]:
    """Trace N paths to completion.

    Args:
      origin/direction: (N, 3) primary rays; active: (N,) ray-is-live mask
        (foveation ring rejection enters here, deviceProgram.cu:435-440).
      key: PRNG key; per-bounce, per-ray streams are folded in from
        ``ray_ids`` (global ray indices — see ops/rng.py; defaults to arange).
    Returns dict:
      radiance (N, 3) — per-path sum of NEE/emission contributions ("result").
      alpha (N, 3) — backplate compositing alpha (see module docstring).
      normal/albedo (N, 3) — primary-hit AOVs (denoiser inputs,
        SimplePathtracer.cpp:246-260).
      traces () int32 — number of traversal queries actually walked
        (closest-hit + non-skipped occlusion; the bench metric numerator).
    """
    n = origin.shape[0]
    if ray_ids is None:
        ray_ids = jnp.arange(n, dtype=jnp.int32)

    zero = jnp.zeros((n,), dtype=jnp.float32)
    one = jnp.ones((n,), dtype=jnp.float32)
    cols: List[jnp.ndarray] = [
        origin[:, 0], origin[:, 1], origin[:, 2],
        direction[:, 0], direction[:, 1], direction[:, 2],
        one, one, one,  # throughput
        one,  # eta
        zero, zero, zero,  # radiance
        zero, zero, zero,  # alpha
        zero, zero, zero,  # normal AOV
        zero, zero, zero,  # albedo AOV
        active.astype(bool),
        jnp.arange(n, dtype=jnp.int32),  # slot
        ray_ids.astype(jnp.int32),
    ]
    traces = jnp.zeros((), dtype=jnp.int32)

    for depth in range(config.max_depth):
        if config.compact_bounces:
            # ONE stable dead-last sort of every carry column (at bounce 0
            # this compacts the ring-rejected rays); alive is the key, so it
            # rides for free as ~sorted_key
            ops = lax.sort(
                [~cols[_ALIVE]] + cols[: _ALIVE] + cols[_ALIVE + 1 :],
                num_keys=1,
                is_stable=True,
            )
            cols = list(ops[1:_ALIVE + 1]) + [~ops[0]] + list(ops[_ALIVE + 1:])

        o = _v3(cols, _ORIGIN)
        d = _v3(cols, _DIR)
        alive = cols[_ALIVE]
        eta_in = cols[_ETA]
        rid = cols[_RAY_ID]
        throughput = _v3(cols, _THROUGHPUT)

        hit = traverse8.closest_hit(
            scene.bvh, o, d, config.tmin, config.tmax, active=alive
        )
        hit_mask = alive & hit["hit"]
        tri = jnp.maximum(hit["tri_id"], 0)

        p = o + hit["t"][:, None] * d
        p = jnp.where(hit_mask[:, None], p, o)  # keep dead lanes finite
        # ONE packed attribute gather per hit (normals/uvs/ids — see
        # SceneGeometry.tri_pack; separate per-field gathers profiled hot)
        attr = jnp.take(scene.geom.tri_pack, tri, axis=0)  # (N, 12)
        ng = attr[:, 0:3]
        nrm = face_forward(ng, -d)  # faceforward(N0, -ray_dir, N0) (cu:634)

        mat_id = lax.bitcast_convert_type(attr[:, 9], jnp.int32)
        tex_id = lax.bitcast_convert_type(attr[:, 10], jnp.int32)
        m = scene.materials.gather(mat_id)
        is_catcher = (m.flags & MATERIAL_FLAG_SHADOW_CATCHER) != 0

        # albedo: material color, texture-modulated when present (cu:655-670)
        bu = hit["u"][:, None]
        bv = hit["v"][:, None]
        uv = (
            (1.0 - bu - bv) * attr[:, 3:5]
            + bu * attr[:, 5:7]
            + bv * attr[:, 7:9]
        )
        tex_col = sample_bilinear_wrap(scene.textures, tex_id, uv)
        albedo = jnp.where((tex_id >= 0)[:, None], tex_col, m.color)

        # medium interface (cu:673-683)
        entering = eta_in == 1.0
        out_eta = jnp.where(entering, m.eta, 1.0)

        # ---- NEE probe sampling with MIS (SampleLights/SampleShadow) ----
        u_all = ray_uniforms(jax.random.fold_in(key, depth), rid, 8)
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
        light_val = jnp.where(
            valid[:, None],
            weight[:, None]
            * sky_col
            * nee_f
            * jnp.abs(dot(wi, nrm))[:, None]
            / jnp.maximum(sky_pdf, 1e-20)[:, None],
            0.0,
        )

        # occlusion query only where the result can matter
        occl_query = hit_mask & (jnp.max(light_val, axis=1) > 0.0)
        if config.compact_bounces:
            s = lax.sort(
                [
                    ~occl_query,
                    jnp.arange(n, dtype=jnp.int32),
                    p[:, 0], p[:, 1], p[:, 2],
                    wi[:, 0], wi[:, 1], wi[:, 2],
                ],
                num_keys=1,
            )
            occ_s = traverse8.occluded(
                scene.bvh,
                jnp.stack(s[2:5], axis=1),
                jnp.stack(s[5:8], axis=1),
                config.tmin, config.tmax,
                active=~s[0],
            )
            # un-sort via a second sort keyed by the carried original index
            occ = lax.sort([s[1], occ_s], num_keys=1)[1]
        else:
            occ = traverse8.occluded(
                scene.bvh, p, wi, config.tmin, config.tmax, active=occl_query
            )
        nee_contrib = jnp.where((~occ)[:, None], light_val, 0.0)
        shadow_contrib = jnp.where(occ[:, None], light_val, 0.0)

        vert_radiance = jnp.where(
            (~is_catcher)[:, None], throughput * nee_contrib, 0.0
        )
        alpha = _v3(cols, _ALPHA)
        if depth == 0:
            # emission on primary hits only (cu:696-698)
            vert_radiance = (
                vert_radiance + hit_mask.astype(jnp.float32)[:, None] * m.emission
            )
        alpha = jnp.where(
            (hit_mask & ~is_catcher)[:, None],
            1.0,
            alpha
            + jnp.where(
                (hit_mask & is_catcher)[:, None],
                throughput * shadow_contrib,
                0.0,
            ),
        )

        # ---- BSDF sampling (cu:700-731) ----
        u_frame, v_frame = basis_from_vector(nrm)
        l_dir, pdf, _stype = bsdf_ops.bsdf_sample(
            m, eta_in, out_eta, u_frame, v_frame, nrm, view, u_all[:, 2:8]
        )
        sample_ok = pdf > 0.0
        f_b = bsdf_ops.bsdf_eval(m, albedo, eta_in, out_eta, nrm, view, l_dir)
        transmitted = dot(l_dir, nrm) <= 0.0
        eta_out = jnp.where(hit_mask & transmitted, out_eta, eta_in)
        new_throughput = jnp.where(
            (hit_mask & sample_ok)[:, None],
            throughput
            * f_b
            * jnp.abs(dot(nrm, l_dir))[:, None]
            / jnp.maximum(pdf, 1e-20)[:, None],
            throughput,
        )

        # contribution gate: vertex counts only if its BSDF sample succeeded
        # (DONE-before-add ordering, cu:515-527)
        contrib = jnp.where((hit_mask & sample_ok)[:, None], vert_radiance, 0.0)
        radiance = _v3(cols, _RADIANCE) + contrib

        new_o = jnp.where(hit_mask[:, None], p, o)
        new_d = jnp.where(hit_mask[:, None], l_dir, d)
        if depth == 0:
            normal_aov = jnp.where(hit_mask[:, None], nrm, _v3(cols, _NORMAL))
            albedo_aov = jnp.where(hit_mask[:, None], albedo, _v3(cols, _ALBEDO))
        else:
            normal_aov = _v3(cols, _NORMAL)
            albedo_aov = _v3(cols, _ALBEDO)

        traces = (
            traces
            + jnp.sum(alive.astype(jnp.int32))
            + jnp.sum(occl_query.astype(jnp.int32))
        )
        cols = [
            new_o[:, 0], new_o[:, 1], new_o[:, 2],
            new_d[:, 0], new_d[:, 1], new_d[:, 2],
            new_throughput[:, 0], new_throughput[:, 1], new_throughput[:, 2],
            eta_out,
            radiance[:, 0], radiance[:, 1], radiance[:, 2],
            alpha[:, 0], alpha[:, 1], alpha[:, 2],
            normal_aov[:, 0], normal_aov[:, 1], normal_aov[:, 2],
            albedo_aov[:, 0], albedo_aov[:, 1], albedo_aov[:, 2],
            hit_mask & sample_ok,
            cols[_SLOT],
            cols[_RAY_ID],
        ]

    if config.compact_bounces:
        # undo the composed per-bounce permutations: one sort keyed by the
        # carried original slot (unique keys — order fully determined)
        outs = lax.sort(
            [cols[_SLOT]]
            + [cols[i] for i in _RADIANCE + _ALPHA + _NORMAL + _ALBEDO],
            num_keys=1,
        )
        r = outs[1:]
        radiance = jnp.stack(r[0:3], axis=1)
        alpha = jnp.stack(r[3:6], axis=1)
        normal = jnp.stack(r[6:9], axis=1)
        albedo_out = jnp.stack(r[9:12], axis=1)
    else:
        radiance = _v3(cols, _RADIANCE)
        alpha = _v3(cols, _ALPHA)
        normal = _v3(cols, _NORMAL)
        albedo_out = _v3(cols, _ALBEDO)
    return {
        "radiance": radiance,
        "alpha": alpha,
        "normal": normal,
        "albedo": albedo_out,
        "traces": traces,
    }
