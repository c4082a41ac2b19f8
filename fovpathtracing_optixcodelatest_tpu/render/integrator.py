"""Wavefront path-tracing integrator.

Behavior twin of the reference megakernel (deviceProgram.cu __raygen__ bounce
loop :497-534 + __closesthit__radiance :619-732 + SampleLights :303-344),
restructured TPU-first: the whole ray batch advances one bounce at a time
under ``lax.scan`` (ONE compiled bounce body — unrolling the four bounces
measured 520 s of XLA compile on a v5e for no runtime win); each bounce is one
closest-hit traversal, vectorized shading (probe NEE with MIS + Disney BSDF
sampling), and one occlusion traversal.

Traversal-local compaction (``config.compact_bounces``): the per-ray carry
stays in ORIGINAL ray order; only the rays entering a traversal are packed
alive-first by a small ``lax.sort`` over exactly the columns the query needs
(key + index + origin + direction = 8 operands), and the query outputs are
restored by a second sort keyed on the carried index. Dead rays collapse into
trailing traversal chunks whose while_loops exit immediately
(ops/traverse8.py chunked lax.map). Sorting the whole 25-column carry instead
was measured at ~95 ms per bounce on a v5e (XLA lowers the payload motion to a
column-major (N, 25) row gather — the pathological layout); the 8-operand
sorts run at ~9 ms. Occlusion rays use the same pattern with the key extended
by "NEE contribution provably nonzero" — light_val == 0 means the occlusion
result cannot matter, so the query is never walked (the BSDF-below-horizon
case kills ~half of them; the reference traces those anyway,
deviceProgram.cu:315-321).

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

Shadow-catcher pass-through (:646-651): a catcher hit on a secondary ray is
transparent — the reference re-traces from the hit point along the same
direction and refunds the bounce (--depth), which is unbounded. Here the
re-trace runs as ``config.catcher_passthrough`` bounded rounds inside the
same bounce (a fori_loop over the one compiled traversal, active only for
catcher-pass rays), gated statically on ``scene.materials.has_catcher`` so
catcher-free scenes compile and pay nothing for it.
"""

from __future__ import annotations

import os
from typing import Dict

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
from fovpathtracing_optixcodelatest_tpu.ops import intersect
from fovpathtracing_optixcodelatest_tpu.ops import probe_sampling as probe_ops
from fovpathtracing_optixcodelatest_tpu.ops import spectrum as sp
from fovpathtracing_optixcodelatest_tpu.ops import traverse8
from fovpathtracing_optixcodelatest_tpu.ops.rng import ray_uniforms
from fovpathtracing_optixcodelatest_tpu.ops.sampling import (
    basis_from_vector,
    dot,
    face_forward,
)

_SPAN = sp.LAMBDA_MAX - sp.LAMBDA_MIN


def _rgb_eval_at(rgb: jnp.ndarray, lam: jnp.ndarray) -> jnp.ndarray:
    """Evaluate the spectral lift of (N, 3) linear RGB at (N, K) wavelengths:
    sum_c rgb_c * basis_c(lambda) (Smits-style RGB->spectrum basis,
    ops/spectrum.py) without materializing the 81-bin spectra."""
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


def _cie_rgb_matrix(lam: jnp.ndarray) -> jnp.ndarray:
    """Per-ray linear map (N, 3, K): spectral sample vector -> linear sRGB.
    Each wavelength is a uniform sample of the visible span (pdf 1/span),
    averaged over the K hero wavelengths; Y-normalized like spectrum_to_xyz.
    CIE integration is linear, so per-bounce spectral contributions can be
    converted and accumulated into an RGB film carry."""
    xbar, ybar, zbar = sp.cie_xyz_bar_jnp(lam)  # each (N, K)
    scale = _SPAN / lam.shape[1] / sp._Y_NORM
    xyz = jnp.stack([xbar, ybar, zbar], axis=1) * scale  # (N, 3, K)
    m = jnp.asarray(sp.XYZ_TO_SRGB, dtype=jnp.float32)  # (3, 3)
    return jnp.einsum("rc,nck->nrk", m, xyz)

# dead-flag bit for composite i32 sort keys (flag | index); index < 2^30
_DEAD = jnp.int32(1 << 30)


def _closest_compacted(scene, o, d, alive, config, iter_cap=None):
    """Closest-hit with alive-first packing local to the query. The carry
    never moves, and (single-level scenes) neither do t/u/v: sort cost is
    ~0.84 ms/operand at frame scale, so the winning TRIANGLE ID is the only
    per-hit payload the sorts carry — shading re-intersects that triangle
    (one width-flat tri_pack row gather it does anyway) and reproduces
    t/u/v bit-exactly. Instanced scenes keep the full payload (re-deriving
    t/u/v would need the object-space ray).

    When two-phase staging applies, its straggler sort is FUSED with the
    compaction sorts: alive-sort -> phase-1 -> pend-sort (carrying phase-1's
    results) -> phase-2 -> ONE unsort straight to original order — 3 sorts
    per closest-hit instead of the 4 that wrapping closest_hit_staged costs.

    ``iter_cap`` overrides the phase-1 iteration budget (may be a traced
    scalar — per-bounce caps under the scanned bounce body).

    Returns {tri_id, hit, steps} (+ t/u/v/inst on instanced scenes —
    ``_hit_keys(scene)`` is the pytree-stable key set).
    """
    n = o.shape[0]
    slim = not scene.bvh.instanced
    keys = _hit_keys(scene)
    if config.traversal == "oracle":
        assert not scene.bvh.instanced, (
            "oracle traversal needs flattened geometry"
        )
        assert not scene.geom.slim, (
            "oracle traversal needs the unpacked geometry arrays "
            "(build with flatten_meshes(slim=False))"
        )
        out = intersect.brute_force_closest_hit(
            scene.geom, o, d, config.tmin, config.tmax
        )
        out["hit"] = out["hit"] & alive
        out["tri_id"] = jnp.where(out["hit"], out["tri_id"], -1)
        out["steps"] = jnp.zeros((), jnp.int32)
        return {k: out[k] for k in keys}
    # two-phase staging pays only when lockstep tails are deep; tiny BVHs
    # (shallow uniform pops) just pay its sorts — gate on the STATIC table
    # size (measured: +51% on a 733-row scene, -13% on a 190-row one)
    staged = config.traversal_phase1_cap > 0 and scene.bvh.num_rows > 512
    # treelet-laid deep tables get the phased windowed traversal (its top
    # phase + row-sorted rounds replace two-phase staging entirely) — in
    # the measured win band only (traverse8.TREELET_MAX_ROWS)
    treelet = traverse8.use_treelet(scene.bvh)
    cap = phase1_cap(scene, config) if iter_cap is None else iter_cap
    if not config.compact_bounces:
        if treelet:
            out = traverse8.closest_hit_treelet(
                scene.bvh, o, d, config.tmin, config.tmax, active=alive
            )
        elif staged:
            out = traverse8.closest_hit_staged(
                scene.bvh, o, d, config.tmin, config.tmax, active=alive,
                phase1_cap=cap,
            )
        else:
            out = traverse8.closest_hit(
                scene.bvh, o, d, config.tmin, config.tmax, active=alive
            )
        out["tri_id"] = jnp.where(out["hit"] & alive, out["tri_id"], -1)
        out["hit"] = out["tri_id"] >= 0
        return {k: out[k] for k in keys}
    # composite i32 key: dead<<30 | original index — unique, so the sort is
    # stable by construction AND no pred (bool) operand enters lax.sort
    # (bool operands lower to (4,1)-packed pred staging copies, measured
    # ~30 ms each at frame scale). `hit` is derived from tri_id >= 0.
    ikey = jnp.where(alive, 0, _DEAD) | jnp.arange(n, dtype=jnp.int32)
    s = lax.sort(
        [ikey, o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2]],
        num_keys=1,
    )
    if not staged or treelet:
        fn = (
            traverse8.closest_hit_treelet if treelet
            else traverse8.closest_hit
        )
        hit = fn(
            scene.bvh,
            jnp.stack(s[1:4], axis=1),
            jnp.stack(s[4:7], axis=1),
            config.tmin, config.tmax,
            active=s[0] < _DEAD,
        )
        tri_or_miss = jnp.where(hit["hit"], hit["tri_id"], -1)
        u = lax.sort(
            [s[0] & (_DEAD - 1), tri_or_miss]
            + ([] if slim else [hit["t"], hit["u"], hit["v"], hit["inst"]]),
            num_keys=1,
        )
        out = {"tri_id": u[1], "hit": u[1] >= 0, "steps": hit["steps"]}
        if not slim:
            out.update(t=u[2], u=u[3], v=u[4], inst=u[5])
        return out
    # fused staged path (see closest_hit_staged for the two-phase rationale)
    p1 = traverse8.closest_hit(
        scene.bvh,
        jnp.stack(s[1:4], axis=1),
        jnp.stack(s[4:7], axis=1),
        config.tmin, config.tmax,
        active=s[0] < _DEAD,
        iter_cap=cap,
        stack_cap=16,
    )
    pend = p1["pending"] & (s[0] < _DEAD)
    tri1 = jnp.where(p1["hit"], p1["tri_id"], -1)
    # pend-first key keeps the ORIGINAL index in the low bits, so phase-2
    # results unsort straight to original ray order — no intermediate unsort.
    # (Packing leftover-stack work bits into the key to make p2 chunks
    # pop-homogeneous was measured a wash: 522 vs 515 ms — p2 re-traces
    # from the ROOT, so leftover sp is a poor proxy for its work.)
    ikey2 = jnp.where(pend, 0, _DEAD) | (s[0] & (_DEAD - 1))
    s2 = lax.sort(
        [ikey2, s[1], s[2], s[3], s[4], s[5], s[6], p1["t"], tri1]
        + ([] if slim else [p1["u"], p1["v"], p1["inst"]]),
        num_keys=1,
    )
    p2 = traverse8.closest_hit(
        scene.bvh,
        jnp.stack(s2[1:4], axis=1),
        jnp.stack(s2[4:7], axis=1),
        config.tmin, config.tmax,
        active=s2[0] < _DEAD,
        t_seed=s2[7] * (1.0 + 1e-6),
    )
    closer = (s2[0] < _DEAD) & p2["hit"]
    tri = jnp.where(closer, p2["tri_id"], s2[8])
    fin_ops = [s2[0] & (_DEAD - 1), tri]
    if not slim:
        fin_ops += [
            jnp.where(closer, p2["t"], s2[7]),
            jnp.where(closer, p2["u"], s2[9]),
            jnp.where(closer, p2["v"], s2[10]),
            jnp.where(closer, p2["inst"], s2[11]),
        ]
    fin = lax.sort(fin_ops, num_keys=1)
    out = {
        "tri_id": fin[1], "hit": fin[1] >= 0,
        "steps": p1["steps"] + p2["steps"],
    }
    if not slim:
        out.update(t=fin[2], u=fin[3], v=fin[4], inst=fin[5])
    return out


# Staged OCCLUSION (round-5 experiment, mirroring closest-hit's two-phase
# staging): phase 1 runs iter-capped on a truncated stack; un-occluded lanes
# still pending at the cap re-trace from the root in phase 2. The round-3
# falsified variant truncated only the STACK (no iteration cap) — the occl
# cost driver is the lockstep iteration count, which only a cap touches.
# Mode 0 = off (single full walk), 1 = in-place phase 2 (no sorts; DYN_TRIP
# skips pending-free chunks), 2 = compacted phase 2 (+7-op/+2-op sorts).
OCCL_STAGE = int(os.environ.get("FOVTPU_OCCSTAGE", "0"))
# Phase-2 closest-hit IN PLACE (no pend-compaction sort): pending lanes
# keep their es-order slots; DYN_TRIP skips pending-free chunks. Trades
# the 9-operand pend sort (~9 ms/bounce) against phase-2 lockstep dilution
# wherever pending lanes scatter across chunks.
P2_INPLACE = os.environ.get("FOVTPU_P2INPLACE", "0") != "0"
OCCL_CAP = int(os.environ.get("FOVTPU_OCCCAP", "8"))
OCCL_STACK = int(os.environ.get("FOVTPU_OCCSTACK", "16"))
# Phase-1 closest-hit chunk override (0 = traverse8.DEFAULT_CHUNK). Dense
# prefix-compacted phase-1 lanes amortize the gather's fixed cost at 64k
# (1.6x cost for 2x indices) without the occl/p2 idle-lane dilution that
# falsified a GLOBAL 64k chunk (PLAN rule 26).
P1_CHUNK = int(os.environ.get("FOVTPU_P1CHUNK", "0")) or None
# Occlusion chunk override (same rationale; occlusion rays are also a dense
# compacted prefix in the fused pipeline).
OCCL_CHUNK = int(os.environ.get("FOVTPU_OCCCHUNK", "0")) or None

# fused-bounce sort-key layout: group << 28 | frame position (group 0 =
# occlusion-active, 1 = alive without occlusion, 2 = dead). occl_query is a
# subset of next-bounce alive (the sample_ok gate guarantees it on
# catcher-free scenes), so ONE end-of-bounce sort compacts BOTH the
# occlusion walk's actives AND the next closest-hit's actives to a prefix.
_GMASK = jnp.int32((1 << 28) - 1)
_GDEAD = jnp.int32(2 << 28)


def _closest_fused(scene, o_s, d_s, skey, config, iter_cap=None):
    """Closest-hit on rays ALREADY in compacted (actives-prefix) order, as
    maintained across bounces by the fused end-of-bounce sort in
    ``trace_paths``: the per-bounce alive-sort of _closest_compacted is
    deleted outright (~6 ms/bounce at the bench frame). ``skey`` carries
    (group << 28) | frame position; active = skey < _GDEAD. Returns the
    FRAME-order hit dict (same contract/keys as _closest_compacted)."""
    slim = not scene.bvh.instanced
    alive_s = skey < _GDEAD
    staged = config.traversal_phase1_cap > 0 and scene.bvh.num_rows > 512
    treelet = traverse8.use_treelet(scene.bvh)
    cap = phase1_cap(scene, config) if iter_cap is None else iter_cap
    if not staged or treelet:
        fn = (
            traverse8.closest_hit_treelet if treelet
            else traverse8.closest_hit
        )
        hitq = fn(
            scene.bvh, o_s, d_s, config.tmin, config.tmax, active=alive_s
        )
        tri_or_miss = jnp.where(hitq["hit"], hitq["tri_id"], -1)
        u = lax.sort(
            [skey & _GMASK, tri_or_miss]
            + ([] if slim else [hitq["t"], hitq["u"], hitq["v"],
                                hitq["inst"]]),
            num_keys=1,
        )
        out = {"tri_id": u[1], "hit": u[1] >= 0, "steps": hitq["steps"]}
        if not slim:
            out.update(t=u[2], u=u[3], v=u[4], inst=u[5])
        return out
    p1 = traverse8.closest_hit(
        scene.bvh, o_s, d_s, config.tmin, config.tmax, active=alive_s,
        iter_cap=cap, stack_cap=16, chunk=P1_CHUNK or traverse8.DEFAULT_CHUNK,
    )
    pend = p1["pending"] & alive_s
    tri1 = jnp.where(p1["hit"], p1["tri_id"], -1)
    if P2_INPLACE and slim:
        p2 = traverse8.closest_hit(
            scene.bvh, o_s, d_s, config.tmin, config.tmax,
            active=pend, t_seed=p1["t"] * (1.0 + 1e-6),
        )
        closer = pend & p2["hit"]
        tri = jnp.where(closer, p2["tri_id"], tri1)
        fin = lax.sort([skey & _GMASK, tri], num_keys=1)
        return {
            "tri_id": fin[1], "hit": fin[1] >= 0,
            "steps": p1["steps"] + p2["steps"],
        }
    ikey2 = jnp.where(pend, 0, _DEAD) | (skey & _GMASK)
    s2 = lax.sort(
        [ikey2, o_s[:, 0], o_s[:, 1], o_s[:, 2],
         d_s[:, 0], d_s[:, 1], d_s[:, 2], p1["t"], tri1]
        + ([] if slim else [p1["u"], p1["v"], p1["inst"]]),
        num_keys=1,
    )
    p2 = traverse8.closest_hit(
        scene.bvh,
        jnp.stack(s2[1:4], axis=1),
        jnp.stack(s2[4:7], axis=1),
        config.tmin, config.tmax,
        active=s2[0] < _DEAD,
        t_seed=s2[7] * (1.0 + 1e-6),
    )
    closer = (s2[0] < _DEAD) & p2["hit"]
    tri = jnp.where(closer, p2["tri_id"], s2[8])
    fin_ops = [s2[0] & (_DEAD - 1), tri]
    if not slim:
        fin_ops += [
            jnp.where(closer, p2["t"], s2[7]),
            jnp.where(closer, p2["u"], s2[9]),
            jnp.where(closer, p2["v"], s2[10]),
            jnp.where(closer, p2["inst"], s2[11]),
        ]
    fin = lax.sort(fin_ops, num_keys=1)
    out = {
        "tri_id": fin[1], "hit": fin[1] >= 0,
        "steps": p1["steps"] + p2["steps"],
    }
    if not slim:
        out.update(t=fin[2], u=fin[3], v=fin[4], inst=fin[5])
    return out


def phase1_cap(scene, config) -> int:
    """Effective phase-1 iteration cap (static). See
    RenderConfig.traversal_cap_auto: the cap scales ~+2 per BVH row-count
    doubling from the bench-tuned 14 at 1,469 rows (measured anchors:
    97,721 rows -> 26 optimal, +19% frame)."""
    import math

    cap = config.traversal_phase1_cap
    if cap > 0 and config.traversal_cap_auto:
        rows = max(scene.bvh.num_rows, 1469)
        cap = max(cap, min(34, 14 + round(2 * math.log2(rows / 1469))))
    return cap


def take_tri_pack(scene, tri, cols=None):
    """Shading-attribute row gather, shard-aware. On a replicated scene this
    is one jnp.take. Inside parallel/scene_shard.py's shard_map (static
    ``scene.geom.pack_shard_axis``/``pack_shard_n`` set) tri_pack is a
    LOCAL row block and the INDICES are device-varying (each chip traces
    its own sample slice), so a one-shot masked-psum is wrong — it would
    mix every chip's lookups. Instead the blocks ride a RING: D-1 ppermute
    rotations visit every block on every chip, and each chip accumulates
    the rows its own lanes need as they pass (classic ring all-gather
    shape; ~the full table transits ICI once per call). Accumulation is in
    the INTEGER domain — f32 adds would flush the denormal material-id
    bitcasts (cols 9/10) to zero on TPU and canonicalize the -1 texture
    id's NaN payload; i32 addition against zeros is bit-exact for every
    column, so the result is bit-identical to the replicated gather."""
    tab = scene.geom.tri_pack if cols is None else scene.geom.tri_pack[:, cols]
    ax = scene.geom.pack_shard_axis
    if ax is None:
        return jnp.take(tab, tri, axis=0)
    n_dev = scene.geom.pack_shard_n
    d = lax.axis_index(ax)
    r = tab.shape[0]
    blk = lax.bitcast_convert_type(tab, jnp.int32)
    acc = jnp.zeros(tri.shape + (() if tab.ndim == 1 else (tab.shape[1],)),
                    jnp.int32)
    for s in range(n_dev):
        owner = (d - s) % n_dev  # which global block this chip holds now
        local = tri - owner * r
        ok = (local >= 0) & (local < r)
        g = jnp.take(blk, jnp.clip(local, 0, r - 1), axis=0)
        mask = ok[:, None] if g.ndim == 2 else ok
        acc = acc + jnp.where(mask, g, 0)
        if s < n_dev - 1:
            blk = lax.ppermute(
                blk, ax, [(i, (i + 1) % n_dev) for i in range(n_dev)]
            )
    return lax.bitcast_convert_type(acc, jnp.float32)


def _hit_keys(scene):
    """Pytree-stable key set of _closest_compacted's result dict."""
    if scene.bvh.instanced:
        return ("tri_id", "hit", "steps", "t", "u", "v", "inst")
    return ("tri_id", "hit", "steps")


def _hit_tuv(scene, o, d, attr, hit, config):
    """t/u/v of the winning hit. Single-level scenes re-intersect the winning
    triangle from the tri_pack row already in hand (cols 36:45 = v0/e1/e2 —
    the same np.float32 values the BVH leaf rows pack, through the same
    Möller-Trumbore expression, so the bits match the traversal's exactly);
    instanced scenes carried t/u/v through the sorts (the object-space ray is
    not in hand here). Miss lanes are garbage — callers mask on hit."""
    if scene.bvh.instanced:
        return hit["t"], hit["u"], hit["v"]
    t, u, v, _ = intersect.ray_triangle(
        o, d, attr[:, 36:39], attr[:, 39:42], attr[:, 42:45],
        config.tmin, config.tmax,
    )
    return t, u, v


def _occluded_compacted(scene, p, wi, query, config):
    """Occlusion twin of _closest_compacted (the query mask already encodes
    the can-this-matter test).

    Falsified round 3 (measured, frame-scale): a STAGED occlusion (16-entry
    truncated stack + overflow re-trace, mirroring closest-hit staging) is a
    net LOSS — depth 47 -> 16 shrank the occl while_loop only 138 -> 131 ms
    (the stack one-hots are NOT its cost driver), while the extra pend-sort
    and the mostly-idle phase-2 lax.map added ~10 ms/bounce (each lax.map
    step costs ~467 us FIXED even when its chunk exits immediately —
    scratch/exp_r3_mapstep.py). Same experiment showed 128k straggler
    chunks are pessimal for phase-2 closest (idle-step cost scales with
    chunk width: 85 -> 204 ms)."""
    n = p.shape[0]
    if config.traversal == "oracle":
        return intersect.brute_force_occluded(
            scene.geom, p, wi, config.tmin, config.tmax
        ) & query
    occl_fn = (
        traverse8.occluded_treelet
        if traverse8.use_treelet(scene.bvh) and traverse8.OCCL_TREELET
        else traverse8.occluded
    )
    if not config.compact_bounces:
        return occl_fn(
            scene.bvh, p, wi, config.tmin, config.tmax, active=query
        )
    ikey = jnp.where(query, 0, _DEAD) | jnp.arange(n, dtype=jnp.int32)
    s = lax.sort(
        [ikey, p[:, 0], p[:, 1], p[:, 2], wi[:, 0], wi[:, 1], wi[:, 2]],
        num_keys=1,
    )
    occ_s = occl_fn(
        scene.bvh,
        jnp.stack(s[1:4], axis=1),
        jnp.stack(s[4:7], axis=1),
        config.tmin, config.tmax,
        active=s[0] < _DEAD,
    )
    u = lax.sort(
        [s[0] & (_DEAD - 1), occ_s.astype(jnp.int32)], num_keys=1
    )
    return u[1] > 0


def trace_paths(
    scene: Scene,
    origin: jnp.ndarray,
    direction: jnp.ndarray,
    active: jnp.ndarray,
    key: jnp.ndarray,
    config: RenderConfig,
    ray_ids: jnp.ndarray | None = None,
    rays_packed: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Trace N paths to completion.

    Args:
      origin/direction: (N, 3) primary rays; active: (N,) ray-is-live mask
        (foveation ring rejection enters here, deviceProgram.cu:435-440).
      key: PRNG key; per-bounce, per-ray streams are folded in from
        ``ray_ids`` (global ray indices — see ops/rng.py; defaults to arange).
      rays_packed: caller guarantees active lanes already occupy a prefix
        (the frame-compaction sort does this) — the fused-bounce path then
        skips its one up-front compaction sort.

    Fused-bounce sort pipeline (catcher-free compacted scenes): the carry
    keeps BOTH a frame-order ray copy (for shading) and a compacted-order
    copy (for the traversals). Each bounce runs closest-hit directly on the
    compacted rays (no per-bounce alive-sort), and ONE end-of-bounce sort
    keyed (occl-active, alive, dead) simultaneously compacts the occlusion
    walk's rays AND the next bounce's closest-hit rays — 4 sorts / 23
    operands per bounce instead of 5 / 27. Pure permutation change:
    bit-identical output.
    Returns dict:
      radiance (N, 3) — per-path sum of NEE/emission contributions ("result").
      alpha (N, 3) — backplate compositing alpha (see module docstring).
      normal/albedo (N, 3) — primary-hit AOVs (denoiser inputs,
        SimplePathtracer.cpp:246-260).
      traces () int32 — number of traversal queries actually walked
        (closest-hit + non-skipped occlusion; the bench metric numerator).

    Spectral mode (``config.spectral``, the hero-wavelength estimator — the
    reference's spectrum.h never renders): the SAME bounce body runs with a
    (N, NUM_HERO) spectral throughput; RGB light/BSDF values are lifted
    through the Smits basis at the path's hero wavelengths, transmissive
    materials get a Cauchy eta(lambda) (``config.dispersion``), and the
    first dispersive transmission collapses the non-hero wavelengths. CIE
    integration is linear, so each bounce's spectral contribution converts
    to linear sRGB on the spot and the film carry stays (N, 3).
    """
    n = origin.shape[0]
    spectral = config.spectral
    if ray_ids is None:
        ray_ids = jnp.arange(n, dtype=jnp.int32)
    ray_ids = ray_ids.astype(jnp.int32)
    f3 = lambda v: jnp.full((n, 3), v, dtype=jnp.float32)  # noqa: E731

    if spectral:
        nh = sp.NUM_HERO
        lam = sp.sample_hero_wavelengths(
            ray_uniforms(jax.random.fold_in(key, 7919), ray_ids, 1)[:, 0]
        )  # (N, NH)
        cie_t = _cie_rgb_matrix(lam)  # (N, 3, NH)
        lift = lambda rgb: _rgb_eval_at(rgb, lam)  # noqa: E731
        to_rgb = lambda spec: jnp.einsum("nrk,nk->nr", cie_t, spec)  # noqa: E731
        nch = nh
    else:
        lift = lambda rgb: rgb  # noqa: E731
        to_rgb = lambda spec: spec  # noqa: E731
        nch = 3

    # fused-bounce pipeline applies to catcher-free compacted BVH traversal
    # (catcher scenes need occlusion results on sample-failed lanes, which
    # breaks occl_query ⊆ alive; the oracle path has no sorts to fuse)
    fused = (
        config.compact_bounces
        and config.traversal != "oracle"
        and not scene.materials.has_catcher
    )

    carry = dict(
        origin=origin,
        direction=direction,
        throughput=jnp.ones((n, nch), dtype=jnp.float32),
        eta=jnp.ones((n,), dtype=jnp.float32),
        radiance=f3(0.0),
        alpha=f3(0.0),
        normal=f3(0.0),
        albedo=f3(0.0),
        alive=active.astype(bool),
        traces=jnp.zeros((), dtype=jnp.int32),
    )
    if fused:
        assert n <= (1 << 28), "fused sort keys hold 28 position bits"
        skey0 = jnp.where(active, 0, _GDEAD) | jnp.arange(n, dtype=jnp.int32)
        if rays_packed:
            carry.update(origin_s=origin, direction_s=direction, skey=skey0)
        else:
            s0 = lax.sort(
                [skey0, origin[:, 0], origin[:, 1], origin[:, 2],
                 direction[:, 0], direction[:, 1], direction[:, 2]],
                num_keys=1,
            )
            carry.update(
                origin_s=jnp.stack(s0[1:4], axis=1),
                direction_s=jnp.stack(s0[4:7], axis=1),
                skey=s0[0],
            )
    if spectral:
        carry["lam_alive"] = jnp.ones((n, nh), dtype=bool)
    if scene.demand is not None:
        carry["demand_req"] = jnp.zeros(
            (scene.demand.page_table.shape[0],), jnp.uint8
        )

    def bounce(carry, depth):
        o = carry["origin"]
        d = carry["direction"]
        alive = carry["alive"]
        eta_in = carry["eta"]
        throughput = carry["throughput"]
        primary = depth == 0

        icap = None
        if config.traversal_phase1_cap_primary:
            icap = jnp.where(
                primary,
                jnp.int32(config.traversal_phase1_cap_primary),
                jnp.int32(phase1_cap(scene, config)),
            )
        if fused:
            hit = _closest_fused(
                scene, carry["origin_s"], carry["direction_s"],
                carry["skey"], config, iter_cap=icap,
            )
        else:
            hit = _closest_compacted(
                scene, o, d, alive, config, iter_cap=icap
            )

        if scene.materials.has_catcher and config.catcher_passthrough > 0:
            # catcher pass-through (cu:646-651): on secondary rays a catcher
            # hit is transparent — re-trace from the hit point, same
            # direction, bounce refunded. Bounded rounds; one compiled
            # traversal body (fori_loop).
            def _is_pass(o_eff, h):
                tri_p = jnp.maximum(h["tri_id"], 0)
                mid = lax.bitcast_convert_type(
                    take_tri_pack(scene, tri_p, cols=9), jnp.int32
                )
                fl = jnp.take(
                    scene.materials.flags,
                    jnp.clip(mid, 0, scene.materials.num_materials - 1),
                )
                catch = (fl & MATERIAL_FLAG_SHADOW_CATCHER) != 0
                return alive & h["hit"] & catch & (depth > 0)

            def _pt_round(_, st):
                o_eff, h, extra = st
                thru = _is_pass(o_eff, h)
                if scene.bvh.instanced:
                    t_h = h["t"]
                else:
                    # slim hit dicts carry no t — re-derive it from the
                    # winning triangle (see _hit_tuv)
                    a_h = take_tri_pack(
                        scene, jnp.maximum(h["tri_id"], 0)
                    )
                    t_h, _, _ = _hit_tuv(scene, o_eff, d, a_h, h, config)
                p_hit = o_eff + t_h[:, None] * d
                o2 = jnp.where(thru[:, None], p_hit, o_eff)
                h2 = _closest_compacted(scene, o2, d, thru, config)
                merged = {
                    k: jnp.where(thru, h2[k], h[k])
                    for k in _hit_keys(scene) if k != "steps"
                }
                merged["steps"] = h["steps"] + h2["steps"]
                return o2, merged, extra + jnp.sum(thru.astype(jnp.int32))

            o, hit, pt_traces = lax.fori_loop(
                0, config.catcher_passthrough, _pt_round,
                (o, hit, jnp.zeros((), jnp.int32)),
            )
        else:
            pt_traces = jnp.zeros((), jnp.int32)

        hit_mask = alive & hit["hit"]
        tri = jnp.maximum(hit["tri_id"], 0)

        # ONE packed attribute gather per hit (normals/uvs/ids — see
        # SceneGeometry.tri_pack; separate per-field gathers profiled hot)
        attr = take_tri_pack(scene, tri)  # (N, 48)
        hit_t, hit_u, hit_v = _hit_tuv(scene, o, d, attr, hit, config)

        p = o + hit_t[:, None] * d
        p = jnp.where(hit_mask[:, None], p, o)  # keep dead lanes finite
        ng = attr[:, 0:3]
        if scene.bvh.instanced:
            # two-level hit: geometry (and its normals) is OBJECT-space —
            # world normal = A^T n_obj where x_obj = A x_world + b is the
            # instance's inverse transform (ops/tlas.py row layout)
            irow = jnp.take(
                scene.bvh.table,
                scene.bvh.inst_base + jnp.maximum(hit["inst"], 0),
                axis=0,
            )
            a_m = irow[:, 1:10]  # A row-major
            ngw = jnp.stack(
                [
                    a_m[:, 0] * ng[:, 0] + a_m[:, 3] * ng[:, 1]
                    + a_m[:, 6] * ng[:, 2],
                    a_m[:, 1] * ng[:, 0] + a_m[:, 4] * ng[:, 1]
                    + a_m[:, 7] * ng[:, 2],
                    a_m[:, 2] * ng[:, 0] + a_m[:, 5] * ng[:, 1]
                    + a_m[:, 8] * ng[:, 2],
                ],
                axis=1,
            )
            ng = ngw / jnp.maximum(
                jnp.linalg.norm(ngw, axis=1, keepdims=True), 1e-20
            )
        nrm = face_forward(ng, -d)  # faceforward(N0, -ray_dir, N0) (cu:634)

        tex_id = lax.bitcast_convert_type(attr[:, 10], jnp.int32)
        # material packed row rides tri_pack cols 12:36 — no second gather
        m = scene.materials.view_rows(attr[:, 12:36])
        is_catcher = (m.flags & MATERIAL_FLAG_SHADOW_CATCHER) != 0

        # albedo: material color, texture-modulated when present (cu:655-670)
        bu = hit_u[:, None]
        bv = hit_v[:, None]
        uv = (
            (1.0 - bu - bv) * attr[:, 3:5]
            + bu * attr[:, 5:7]
            + bv * attr[:, 7:9]
        )
        if scene.demand is not None:
            # demand-loaded texture path (models/demand.py): point-sample
            # the resident tile atlas; non-resident texels use the tile-mean
            # fallback and are recorded in the frame's request bitmap
            from fovpathtracing_optixcodelatest_tpu.models.demand import (
                demand_tex2d,
            )

            tex_col, d_res, d_page = demand_tex2d(
                scene.demand, jnp.maximum(tex_id, 0), uv[:, 0], uv[:, 1]
            )
            want = hit_mask & (tex_id >= 0)
            new_req = carry["demand_req"].at[d_page].max(
                (want & ~d_res).astype(jnp.uint8)
            )
            albedo = jnp.where((tex_id >= 0)[:, None], tex_col, m.color)
        elif scene.geom.has_textures:
            tex_col = sample_bilinear_wrap(scene.textures, tex_id, uv)
            albedo = jnp.where((tex_id >= 0)[:, None], tex_col, m.color)
        else:
            # untextured scene (static SceneGeometry.has_textures): compile
            # out the 4 bilinear texel gathers per bounce entirely
            albedo = m.color

        # medium interface (cu:673-683); spectral mode disperses the IOR
        # along the hero wavelength (Cauchy eta(lambda), render/spectral.py)
        if spectral and config.dispersion != 0.0:
            from fovpathtracing_optixcodelatest_tpu.render.spectral import (
                cauchy_eta,
            )

            eta_mat = jnp.where(
                m.transmission > 0.0,
                cauchy_eta(m.eta, lam[:, 0], config.dispersion),
                m.eta,
            )
        else:
            eta_mat = m.eta
        entering = eta_in == 1.0
        out_eta = jnp.where(entering, eta_mat, 1.0)

        # ---- NEE probe sampling with MIS (SampleLights/SampleShadow) ----
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
        light_val = jnp.where(
            valid[:, None],
            weight[:, None]
            * sky_col
            * nee_f
            * jnp.abs(dot(wi, nrm))[:, None]
            / jnp.maximum(sky_pdf, 1e-20)[:, None],
            0.0,
        )

        # ---- BSDF sampling (cu:700-731) — drawn BEFORE the occlusion walk:
        # its pdf>0 outcome gates the whole vertex contribution
        # (DONE-before-add, cu:515-527), so a failed-sample lane's occlusion
        # result can never matter — except to a shadow catcher's alpha,
        # which is not sample-gated (cu:646-651); catcher lanes keep their
        # query. Same RNG lanes as the reference order (u_all[:, 2:8]).
        u_frame, v_frame = basis_from_vector(nrm)
        l_dir, pdf, _stype = bsdf_ops.bsdf_sample(
            m, eta_in, out_eta, u_frame, v_frame, nrm, view, u_all[:, 2:8]
        )
        sample_ok = pdf > 0.0

        # occlusion query only where the result can matter (the lift is a
        # nonnegative combination, so zero RGB => zero at every wavelength)
        occl_query = (
            hit_mask
            & (jnp.max(light_val, axis=1) > 0.0)
            & (sample_ok | is_catcher)
        )
        if fused:
            # ONE sort compacts the occlusion walk AND hands the next bounce
            # its already-compacted rays (occl_query ⊆ next alive): the
            # sorted o_next doubles as the occlusion origin (o_next == p on
            # every hit lane), so only wi rides as extra payload.
            next_alive = hit_mask & sample_ok
            o_next = jnp.where(hit_mask[:, None], p, o)
            d_next = jnp.where(hit_mask[:, None], l_dir, d)
            kgrp = jnp.where(
                occl_query, 0, jnp.where(next_alive, 1, 2)
            )
            knext = (kgrp << 28) | jnp.arange(n, dtype=jnp.int32)
            es = lax.sort(
                [knext,
                 o_next[:, 0], o_next[:, 1], o_next[:, 2],
                 d_next[:, 0], d_next[:, 1], d_next[:, 2],
                 wi[:, 0], wi[:, 1], wi[:, 2]],
                num_keys=1,
            )
            occl_fn = (
                traverse8.occluded_treelet
                if (traverse8.use_treelet(scene.bvh)
                    and traverse8.OCCL_TREELET)
                else traverse8.occluded
            )
            o_occ = jnp.stack(es[1:4], axis=1)
            d_occ = jnp.stack(es[7:10], axis=1)
            act_occ = es[0] < (1 << 28)
            if OCCL_STAGE and occl_fn is traverse8.occluded:
                occ1, pend1 = traverse8.occluded(
                    scene.bvh, o_occ, d_occ, config.tmin, config.tmax,
                    active=act_occ, iter_cap=OCCL_CAP,
                    stack_cap=OCCL_STACK, return_pending=True,
                )
                need2 = pend1 & ~occ1 & act_occ
                if OCCL_STAGE == 1:
                    occ2 = traverse8.occluded(
                        scene.bvh, o_occ, d_occ,
                        config.tmin, config.tmax, active=need2,
                    )
                    occ_s = occ1 | occ2
                else:
                    k2 = jnp.where(need2, 0, _DEAD) | jnp.arange(
                        n, dtype=jnp.int32
                    )
                    s2o = lax.sort(
                        [k2, es[1], es[2], es[3], es[7], es[8], es[9]],
                        num_keys=1,
                    )
                    occ2 = traverse8.occluded(
                        scene.bvh,
                        jnp.stack(s2o[1:4], axis=1),
                        jnp.stack(s2o[4:7], axis=1),
                        config.tmin, config.tmax,
                        active=s2o[0] < _DEAD,
                    )
                    u2 = lax.sort(
                        [s2o[0] & (_DEAD - 1), occ2.astype(jnp.int32)],
                        num_keys=1,
                    )
                    occ_s = occ1 | (u2[1] > 0)
            else:
                occ_s = occl_fn(
                    scene.bvh, o_occ, d_occ,
                    config.tmin, config.tmax, active=act_occ,
                    chunk=OCCL_CHUNK or traverse8.DEFAULT_CHUNK,
                )
            occu = lax.sort(
                [es[0] & _GMASK, occ_s.astype(jnp.int32)], num_keys=1
            )
            occ = occu[1] > 0
        else:
            occ = _occluded_compacted(scene, p, wi, occl_query, config)
        light_c = lift(light_val)  # (N, C)
        nee_contrib = jnp.where((~occ)[:, None], light_c, 0.0)
        shadow_contrib = jnp.where(occ[:, None], light_c, 0.0)

        vert_radiance = jnp.where(
            (~is_catcher)[:, None], throughput * nee_contrib, 0.0
        )
        # emission on primary hits only (cu:696-698)
        vert_radiance = vert_radiance + jnp.where(
            primary & hit_mask, 1.0, 0.0
        )[:, None] * lift(m.emission)

        catcher_shadow = jnp.where(
            (hit_mask & is_catcher)[:, None],
            throughput * shadow_contrib,
            0.0,
        )
        alpha = jnp.where(
            (hit_mask & ~is_catcher)[:, None],
            1.0,
            carry["alpha"] + to_rgb(catcher_shadow),
        )

        # ---- BSDF throughput update (cu:700-731; sample drawn above) ----
        f_b = bsdf_ops.bsdf_eval(m, albedo, eta_in, out_eta, nrm, view, l_dir)
        transmitted = dot(l_dir, nrm) <= 0.0
        eta_out = jnp.where(hit_mask & transmitted, out_eta, eta_in)
        thr_scale = (
            lift(f_b)
            * jnp.abs(dot(nrm, l_dir))[:, None]
            / jnp.maximum(pdf, 1e-20)[:, None]
        )
        if spectral:
            # a dispersive transmission collapses the non-hero wavelengths:
            # their refracted geometry would differ from the hero path's
            dispersive = (
                hit_mask & transmitted & (m.transmission > 0.0)
                & (jnp.abs(eta_mat - m.eta) > 1e-6)
            )
            keep = jnp.concatenate(
                [jnp.ones((n, 1), bool),
                 jnp.broadcast_to((~dispersive)[:, None], (n, nh - 1))],
                axis=1,
            )
            lam_alive = carry["lam_alive"]
            new_lam_alive = lam_alive & keep
            new_throughput = jnp.where(
                (hit_mask & sample_ok)[:, None] & new_lam_alive,
                throughput * thr_scale,
                jnp.where((hit_mask & sample_ok)[:, None], 0.0, throughput),
            )
            vert_radiance = jnp.where(lam_alive, vert_radiance, 0.0)
        else:
            new_throughput = jnp.where(
                (hit_mask & sample_ok)[:, None],
                throughput * thr_scale,
                throughput,
            )

        # contribution gate: vertex counts only if its BSDF sample succeeded
        # (DONE-before-add ordering, cu:515-527)
        contrib = to_rgb(
            jnp.where((hit_mask & sample_ok)[:, None], vert_radiance, 0.0)
        )

        # primary-hit AOVs
        take_aov = primary & hit_mask
        normal_aov = jnp.where(take_aov[:, None], nrm, carry["normal"])
        albedo_aov = jnp.where(take_aov[:, None], albedo, carry["albedo"])

        new_carry = dict(
            origin=o_next if fused else jnp.where(hit_mask[:, None], p, o),
            direction=d_next if fused
            else jnp.where(hit_mask[:, None], l_dir, d),
            throughput=new_throughput,
            eta=eta_out,
            radiance=carry["radiance"] + contrib,
            alpha=alpha,
            normal=normal_aov,
            albedo=albedo_aov,
            alive=hit_mask & sample_ok,
            traces=carry["traces"]
            + jnp.sum(alive.astype(jnp.int32))
            + jnp.sum(occl_query.astype(jnp.int32))
            + pt_traces,
        )
        if fused:
            new_carry.update(
                origin_s=jnp.stack(es[1:4], axis=1),
                direction_s=jnp.stack(es[4:7], axis=1),
                skey=es[0],
            )
        if spectral:
            new_carry["lam_alive"] = new_lam_alive
        if scene.demand is not None:
            new_carry["demand_req"] = new_req
        return new_carry, None

    carry, _ = lax.scan(
        bounce, carry, jnp.arange(config.max_depth, dtype=jnp.int32)
    )
    out = {
        "radiance": carry["radiance"],
        "alpha": carry["alpha"],
        "normal": carry["normal"],
        "albedo": carry["albedo"],
        "traces": carry["traces"],
    }
    if scene.demand is not None:
        out["demand_requests"] = carry["demand_req"] > 0
    return out
