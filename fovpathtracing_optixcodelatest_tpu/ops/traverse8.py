"""Per-ray 8-wide BVH traversal, TPU-layout-native.

The fast traversal path (data structure: ops/bvh8.py). The hard-won TPU rules
that shape this module (all measured on a v5e — see git history and PLAN.md):

1. EVERY per-ray array in the while_loop carry and body is a DENSE (8, L)
   tile (the ray chunk reshaped to 8 sublanes x L lanes), and the stack is
   (D, 8, L). Round 1 used (1, N) rows, which tile as T(1,128) — only 1 of 8
   VPU sublanes live; the profiler showed ~35 of 68 us/iteration burned in
   that sublane-wasted elementwise soup. Dense (8, L) state runs the same ops
   ~8x denser.

2. Tables (nodes/leaves) are jit ARGUMENTS — closure-captured tables become
   XLA constants whose gathers scalarize (measured 300x slower).

3. One gather per step: node rows pack child boxes + bitcast meta into 64
   floats; leaf rows pack leaf_size padded triangles (9 floats each). The
   gather runs VMEM-resident at ~170 GB/s inside the loop (the table is
   hoisted out of the while body by XLA); one transpose-copy per step turns
   the gathered (8, L, W) block into W dense (8, L) planes.

One while_loop iteration pops one entry per ray (one-hot sum over the
(D, 8, L) stack), and either expands an internal node (8 unrolled slab tests
+ push of hit children, near-to-far via a Batcher sorting network) or
intersects its leaf row (unrolled Möller-Trumbore). Iterations ≈ max
per-ray pops within a chunk.

``occluded`` implements the reference's occlusion ray semantics: back-face
culling + first-hit termination (deviceProgram.cu:224-248).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax import lax

from fovpathtracing_optixcodelatest_tpu.ops.bvh8 import EMPTY, INST_BIT, WideBVH

# Default ray-chunk length: each chunk runs its own while_loop under lax.map,
# so a chunk of early-finishing rays stops at ITS max pop count instead of the
# global batch max — the cheap tail-latency fix for lockstep traversal.
# 32k (vs round-1's 16k): with the phase-1 iteration cap bounding lockstep
# tails, the per-chunk fixed cost (~0.3 ms lax.map step) dominates smaller
# chunks. FOVTPU_CHUNK / FOVTPU_DRAINS are perf-tuning env overrides
# (read once at import) for re-measuring these constants on new hardware
# or tree shapes without editing the module.
DEFAULT_CHUNK = int(os.environ.get("FOVTPU_CHUNK", 1 << 15))

# Stale-pop drains per iteration (_pop_fresh): 2 measured best on the
# bench tree shape.
DEFAULT_DRAINS = int(os.environ.get("FOVTPU_DRAINS", 2))

# Dynamic chunk trip count (A/B escape hatch): skip trailing all-inactive
# chunks entirely instead of stepping them through lax.map. Each chunk step
# costs ~467 us of FIXED staging even when its while_loop exits immediately
# (scratch/exp_r3_mapstep.py), and the integrator's alive-first compaction
# parks dead lanes in trailing chunks — later bounces and straggler passes
# are mostly idle steps.
DYN_TRIP = os.environ.get("FOVTPU_DYNTRIP", "1") != "0"

# FALSIFIED round 3 (do not retry): widening phase-2/straggler chunks to
# 128k to cut idle lax.map steps — idle-step cost SCALES with chunk width
# (phase-2 closest 85 -> 204 ms at frame scale). lax.map's fixed per-step
# cost is ~467 us at 32k lanes even when the chunk's while exits
# immediately (scratch/exp_r3_mapstep.py).

# Sublane tiling: a chunk of N rays is laid out as (8, N // 8).
SUB = 8

def _batcher_net(n: int):
    """Batcher odd-even mergesort comparator list for power-of-two n
    (19 comparators at n=8, 63 at n=16; verified by the 0/1 principle)."""
    pairs = []
    p = 1
    while p < n:
        k = p
        while k >= 1:
            for j in range(k % p, n - k, 2 * k):
                for i in range(0, min(k, n - j - k)):
                    if (i + j) // (2 * p) == (i + j + k) // (2 * p):
                        pairs.append((i + j, i + j + k))
            k //= 2
        p *= 2
    return pairs


def _tiles3(x, l):
    """(N, 3) -> list of 3 (8, L) planes (one transpose outside the loop)."""
    return [c.reshape(SUB, l) for c in x.T]


def _sort_desc(keys, *val_lists):
    """Sort keys descending via the Batcher network, permuting every value
    list along. Returns (keys, *val_lists) sorted."""
    k = list(keys)
    vs = [list(v) for v in val_lists]
    for i, j in _batcher_net(len(keys)):
        swap = k[i] < k[j]
        k[i], k[j] = (
            jnp.where(swap, k[j], k[i]),
            jnp.where(swap, k[i], k[j]),
        )
        for v in vs:
            v[i], v[j] = (
                jnp.where(swap, v[j], v[i]),
                jnp.where(swap, v[i], v[j]),
            )
    return (k, *vs)


def _gather_row(table, entry, is_leaf, bvh=None, is_inst=None):
    """ONE unified row gather per step: node, leaf AND instance rows live in
    the same (U, W) table, so entry type never costs a second gather.

    Returns W planes of (8, L)."""
    row = jnp.where(is_leaf, -entry - 1, jnp.maximum(entry, 0))  # (8, L)
    if is_inst is not None:
        row = jnp.where(
            is_inst, bvh.inst_base + (entry & (INST_BIT - 1)), row
        )
    g = jnp.take(table, row, axis=0)  # (8, L, W)
    gt = jnp.transpose(g, (2, 0, 1))  # (W, 8, L) — the one relayout per step
    return gt


def _expand(gt, is_node, o_r, inv_r, tmin, tlimit, arity):
    """Slab-test the ``arity`` children encoded in a gathered node row.

    Box bounds are conservative bf16 pairs packed two-per-f32 (bvh8.py):
    lo = high 16 bits widened, hi = low 16 bits widened. Child metadata is
    the pre-encoded traversal entry code (>=0 internal, <0 leaf, EMPTY).

    Returns (hits, t_nears, entries): lists of ``arity`` (8, L) arrays.
    """
    hits, tns, entries = [], [], []
    mask_hi = jnp.uint32(0xFFFF0000)
    for c in range(arity):
        tn = jnp.full_like(tlimit, -jnp.inf)
        tf = jnp.full_like(tlimit, jnp.inf)
        for a in range(3):
            u = lax.bitcast_convert_type(gt[c * 3 + a], jnp.uint32)
            lo = lax.bitcast_convert_type(u & mask_hi, jnp.float32)
            hi = lax.bitcast_convert_type(u << 16, jnp.float32)
            t0 = (lo - o_r[a]) * inv_r[a]
            t1 = (hi - o_r[a]) * inv_r[a]
            tn = jnp.maximum(tn, jnp.minimum(t0, t1))
            tf = jnp.minimum(tf, jnp.maximum(t0, t1))
        code = lax.bitcast_convert_type(gt[3 * arity + c], jnp.int32)
        hit = (
            (tn <= tf) & (tf >= tmin) & (tn <= tlimit)
            & (code != EMPTY) & is_node
        )
        hits.append(hit)
        tns.append(tn)
        entries.append(code)
    return hits, tns, entries


def _leaf_hits(gt, is_leaf, o_r, d_r, tmin, tmax, cull_backface, leaf_size):
    """leaf_size unrolled Möller-Trumbore tests against a gathered leaf row.
    Returns list of tuples (hit, t, u, v) of (8, L) arrays."""
    out = []
    for k in range(leaf_size):
        b = k * 9
        v0 = (gt[b + 0], gt[b + 1], gt[b + 2])
        e1 = (gt[b + 3], gt[b + 4], gt[b + 5])
        e2 = (gt[b + 6], gt[b + 7], gt[b + 8])
        px = d_r[1] * e2[2] - d_r[2] * e2[1]
        py = d_r[2] * e2[0] - d_r[0] * e2[2]
        pz = d_r[0] * e2[1] - d_r[1] * e2[0]
        det = e1[0] * px + e1[1] * py + e1[2] * pz
        det_ok = det > 1e-9 if cull_backface else jnp.abs(det) > 1e-9
        inv_det = jnp.where(det_ok, 1.0 / jnp.where(det_ok, det, 1.0), 0.0)
        tx = o_r[0] - v0[0]
        ty = o_r[1] - v0[1]
        tz = o_r[2] - v0[2]
        u = (tx * px + ty * py + tz * pz) * inv_det
        qx = ty * e1[2] - tz * e1[1]
        qy = tz * e1[0] - tx * e1[2]
        qz = tx * e1[1] - ty * e1[0]
        v = (d_r[0] * qx + d_r[1] * qy + d_r[2] * qz) * inv_det
        t = (e2[0] * qx + e2[1] * qy + e2[2] * qz) * inv_det
        hit = (
            det_ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
            & (t >= tmin) & (t <= tmax) & is_leaf
        )
        out.append((hit, t, u, v))
    return out


def _ray_tiles(origin, direction, l):
    o_r = _tiles3(origin, l)
    d_r = _tiles3(direction, l)
    inv_r = [
        1.0 / jnp.where(jnp.abs(c) < 1e-12, jnp.where(c < 0, -1e-12, 1e-12), c)
        for c in d_r
    ]
    return o_r, d_r, inv_r


def _pop(stack, sp):
    """stack (D, 8, L), sp (8, L) → (entry (8, L), new sp, has). sp==0 pops
    junk that callers mask via has."""
    d_iota = jnp.arange(stack.shape[0], dtype=jnp.int32)[:, None, None]
    has = sp > 0
    spc = jnp.where(has, sp - 1, 0)
    entry = jnp.sum(jnp.where(d_iota == spc[None], stack, 0), axis=0)
    return entry, spc, has


def _pop2(stack, tn_stack, sp):
    """Pop (entry, tn) pairs from the twin stacks in one one-hot pass."""
    d_iota = jnp.arange(stack.shape[0], dtype=jnp.int32)[:, None, None]
    has = sp > 0
    spc = jnp.where(has, sp - 1, 0)
    onehot = d_iota == spc[None]
    entry = jnp.sum(jnp.where(onehot, stack, 0), axis=0)
    tn = jnp.sum(jnp.where(onehot, tn_stack, 0.0), axis=0)
    return entry, tn, spc, has


def _pop_fresh(stack, tn_stack, sp, tlimit, drains: int):
    """Pop, skipping up to ``drains`` STALE entries (tn at push > current
    best t): 46% of closest-hit pops are stale by pop time (measured,
    box_city), and in lockstep every stale pop costs a full iteration.
    Draining consumes stale entries at ``drains+1``/iteration so tail rays
    spend iterations on useful pops only. Returns (entry, sp, fresh).

    The ``drains+1`` candidate depths (sp-1, sp-2, ...) are all known before
    any stack read, so every candidate's one-hot pick runs in ONE fused pass
    over the (D, 8, L) stacks — one stack read total, not ``drains+1`` (the
    stack reduction is the traversal loop's dominant VMEM traffic)."""
    d_iota = jnp.arange(stack.shape[0], dtype=jnp.int32)[:, None, None]
    cands = []  # (entry_j, tn_j, has_j) for candidate depth sp-1-j
    for j in range(drains + 1):
        onehot = d_iota == (sp - 1 - j)[None]
        e_j = jnp.sum(jnp.where(onehot, stack, 0), axis=0)
        tn_j = jnp.sum(jnp.where(onehot, tn_stack, 0.0), axis=0)
        cands.append((e_j, tn_j, sp > j))
    entry, tn, has = cands[0]
    consumed = jnp.ones_like(sp)
    advance = jnp.ones_like(has)  # still draining stale entries
    for e_j, tn_j, has_j in cands[1:]:
        advance = advance & has & (tn > tlimit)
        entry = jnp.where(advance, e_j, entry)
        tn = jnp.where(advance, tn_j, tn)
        has = jnp.where(advance, has_j, has)
        consumed = consumed + advance.astype(jnp.int32)
    sp = jnp.maximum(sp - consumed, 0)
    fresh = has & (tn <= tlimit)
    return entry, tn, sp, fresh


def _push2(stack, tn_stack, sp, entries_c, tns_c, cnt):
    """Twin-stack push of (entry, tn) pairs (see _push)."""
    d_iota = jnp.arange(stack.shape[0], dtype=jnp.int32)[:, None, None]
    kk = d_iota - sp[None]  # (D, 8, L)
    valid = (kk >= 0) & (kk < cnt[None])
    eac = entries_c[0][None]
    tac = tns_c[0][None]
    for j in range(1, len(entries_c)):
        sel = kk == j
        eac = jnp.where(sel, entries_c[j][None], eac)
        tac = jnp.where(sel, tns_c[j][None], tac)
    stack = jnp.where(valid, eac, stack)
    tn_stack = jnp.where(valid, tac, tn_stack)
    sp = jnp.minimum(sp + cnt, stack.shape[0])
    return stack, tn_stack, sp


def _push(stack, sp, entries_c, cnt):
    """Write entries_c[0..cnt-1] to rows sp..sp+cnt-1 in one broadcast
    assignment; overflow drops."""
    d_iota = jnp.arange(stack.shape[0], dtype=jnp.int32)[:, None, None]
    kk = d_iota - sp[None]  # (D, 8, L)
    valid = (kk >= 0) & (kk < cnt[None])
    eac = entries_c[0][None]
    for j in range(1, len(entries_c)):
        eac = jnp.where(kk == j, entries_c[j][None], eac)
    stack = jnp.where(valid, eac, stack)
    sp = jnp.minimum(sp + cnt, stack.shape[0])
    return stack, sp


def _dyn_trip_count(sp0):
    """Chunks at index >= trip contain NO active lane and are never stepped
    (their outputs are the caller's neutral init — exactly what an
    all-inactive chunk's while_loop would produce). Rigorous for ANY active
    layout: trip = 1 + index of the last chunk with any active lane; the
    alive-first compaction sorts make that a tight prefix."""
    anyc = jnp.any(sp0 > 0, axis=(1, 2))  # (C,)
    idx = jnp.arange(anyc.shape[0], dtype=jnp.int32)
    return jnp.max(jnp.where(anyc, idx + 1, 0))


def _chunk_map(step, xs, init_out, trip):
    """``lax.map(step, xs)`` with a DYNAMIC trip count. ``init_out`` is the
    stacked (C, ...) neutral output pytree for never-stepped chunks."""

    def body(i, outs):
        args = tuple(
            lax.dynamic_index_in_dim(x, i, axis=0, keepdims=False)
            for x in xs
        )
        res = step(args)
        return tuple(
            lax.dynamic_update_index_in_dim(o, r, i, axis=0)
            for o, r in zip(outs, res)
        )

    return lax.fori_loop(0, trip, body, init_out)


def _pad_rays(origin, direction, active):
    """Pad the ray count to a multiple of SUB*128 so (8, L) tiles are dense."""
    n = origin.shape[0]
    pad = (-n) % (SUB * 128)
    if pad:
        origin = jnp.pad(origin, ((0, pad), (0, 0)))
        direction = jnp.pad(direction, ((0, pad), (0, 0)), constant_values=1.0)
        active = jnp.pad(active, (0, pad))
    return origin, direction, active, n


def _batch_tiles(origin, direction, active, chunk, t_seed=None):
    """Batch-level prep for the chunked traversal loops: pad to a chunk
    multiple and lay EVERYTHING out as (C, 8, L) tiles up front. All
    transposes/casts run ONCE at batch bandwidth — doing them inside the
    lax.map step cost ~0.3 ms of latency-bound small ops per chunk
    (profiled: ~45% of a mostly-idle chunk pass)."""
    n = origin.shape[0]
    pad = (-n) % chunk
    if pad:
        origin = jnp.pad(origin, ((0, pad), (0, 0)))
        direction = jnp.pad(direction, ((0, pad), (0, 0)), constant_values=1.0)
        active = jnp.pad(active, (0, pad))
        if t_seed is not None:
            t_seed = jnp.pad(t_seed, (0, pad), constant_values=jnp.inf)
    c = (n + pad) // chunk
    l = chunk // SUB
    tile = lambda col: col.reshape(c, SUB, l)  # noqa: E731
    o_r = [tile(x) for x in origin.T]
    d_r = [tile(x) for x in direction.T]
    inv_r = [
        tile(
            1.0
            / jnp.where(
                jnp.abs(x) < 1e-12, jnp.where(x < 0, -1e-12, 1e-12), x
            )
        )
        for x in direction.T
    ]
    sp0 = tile(active.astype(jnp.int32))
    t0 = None if t_seed is None else tile(t_seed)
    return o_r, d_r, inv_r, sp0, t0, c, l, n


def _apply_inv_transform(gt, o_r, d_r):
    """Object-space ray from an instance row's inverse transform
    (x_obj = A x_world + b; direction left unnormalized so t stays
    world-scale). gt cols: [root_code, A row-major 9, b 3]."""
    op, dp = [], []
    for a in range(3):
        r0, r1, r2 = gt[1 + 3 * a], gt[2 + 3 * a], gt[3 + 3 * a]
        op.append(r0 * o_r[0] + r1 * o_r[1] + r2 * o_r[2] + gt[10 + a])
        dp.append(r0 * d_r[0] + r1 * d_r[1] + r2 * d_r[2])
    ip = [
        1.0 / jnp.where(jnp.abs(c) < 1e-12, jnp.where(c < 0, -1e-12, 1e-12), c)
        for c in dp
    ]
    return op, dp, ip


def _closest_loop(bvh, o_r, d_r, inv_r, sp0, t0, tmin, tmax, step_limit,
                  depth):
    """The per-chunk closest-hit while_loop on pre-tiled (8, L) inputs.
    Returns (t, u, v, best, best_inst, overflow, steps).

    Two-level (instanced) tables add per-lane space tracking: popping an
    instance code (INST_BIT set) loads the row's inverse transform, primes
    the lane's object-space ray, and pushes the BLAS root (one iteration);
    stack discipline guarantees at most one instance's BLAS rows are live on
    a lane's stack, so a single ``cur`` register tracks the space. Popping a
    TLAS node restores world space. Statically compiled out when
    ``bvh.num_instances == 0``.
    """
    l = sp0.shape[-1]
    instanced = bvh.num_instances > 0
    state = (
        jnp.zeros((depth, SUB, l), dtype=jnp.int32),
        jnp.full((depth, SUB, l), -jnp.inf, jnp.float32),
        sp0,
        t0,
        jnp.zeros((SUB, l), dtype=jnp.float32),
        jnp.zeros((SUB, l), dtype=jnp.float32),
        jnp.full((SUB, l), -1, dtype=jnp.int32),
        jnp.zeros((SUB, l), dtype=jnp.int32),  # overflowed
        jnp.zeros((), dtype=jnp.int32),
    )
    if instanced:
        state = state + (
            jnp.full((SUB, l), -1, dtype=jnp.int32),  # cur instance
            jnp.full((SUB, l), -1, dtype=jnp.int32),  # best-hit instance
            tuple(o_r), tuple(d_r), tuple(inv_r),  # primed (object) ray
        )

    def cond(s):
        return jnp.any(s[2] > 0) & (s[8] < step_limit)

    def body(s):
        stack, tn_stack, sp, t, u, v, best, overflow, steps = s[:9]
        if instanced:
            cur, best_inst, op, dp, ip = s[9:]
            op, dp, ip = list(op), list(dp), list(ip)
        tlimit = jnp.minimum(t, tmax)
        entry, tn_pop, sp, fresh = _pop_fresh(
            stack, tn_stack, sp, tlimit, drains=DEFAULT_DRAINS
        )
        if instanced:
            is_inst = fresh & (entry >= 0) & ((entry & INST_BIT) != 0)
            is_node = fresh & (entry >= 0) & ~is_inst
            is_leaf = fresh & (entry < 0)
            row_inst = is_inst
        else:
            is_node = fresh & (entry >= 0)
            is_leaf = fresh & (entry < 0)
            row_inst = None
        gt = _gather_row(bvh.table, entry, is_leaf, bvh, row_inst)

        if instanced:
            # space transitions: TLAS node -> world; instance pop -> primed
            node_world = is_node & (entry < bvh.blas_base)
            n_op, n_dp, n_ip = _apply_inv_transform(gt, o_r, d_r)
            for a in range(3):
                op[a] = jnp.where(is_inst, n_op[a], op[a])
                dp[a] = jnp.where(is_inst, n_dp[a], dp[a])
                ip[a] = jnp.where(is_inst, n_ip[a], ip[a])
            cur = jnp.where(
                is_inst, entry & (INST_BIT - 1),
                jnp.where(node_world, -1, cur),
            )
            o_use = [jnp.where(node_world, o_r[a], op[a]) for a in range(3)]
            inv_use = [
                jnp.where(node_world, inv_r[a], ip[a]) for a in range(3)
            ]
            o_leaf, d_leaf = op, dp
        else:
            o_use, inv_use = o_r, inv_r
            o_leaf, d_leaf = o_r, d_r

        hits, tns, entries = _expand(
            gt, is_node, o_use, inv_use, tmin, tlimit, bvh.arity
        )
        keys = [jnp.where(h, tn, -jnp.inf) for h, tn in zip(hits, tns)]
        keys_c, entries_c, tns_c = _sort_desc(keys, entries, tns)
        cnt = hits[0].astype(jnp.int32)
        for h in hits[1:]:
            cnt = cnt + h.astype(jnp.int32)
        if instanced:
            # instance redirect: push the BLAS root with the instance's tn
            root_code = lax.bitcast_convert_type(gt[0], jnp.int32)
            entries_c = list(entries_c)
            tns_c = list(tns_c)
            entries_c[0] = jnp.where(is_inst, root_code, entries_c[0])
            tns_c[0] = jnp.where(is_inst, tn_pop, tns_c[0])
            cnt = jnp.where(is_inst, 1, cnt)
        if depth < bvh.stack_depth:
            overflow = overflow | (sp + cnt > depth).astype(jnp.int32)
        stack, tn_stack, sp = _push2(
            stack, tn_stack, sp, entries_c, tns_c, cnt
        )

        leaf_out = _leaf_hits(
            gt, is_leaf, o_leaf, d_leaf, tmin, tmax, False, bvh.leaf_size
        )
        for k, (hit_k, t_k, u_k, v_k) in enumerate(leaf_out):
            better = hit_k & (t_k < t)
            t = jnp.where(better, t_k, t)
            u = jnp.where(better, u_k, u)
            v = jnp.where(better, v_k, v)
            # slot k's ORIGINAL tri id rides in the gathered row (bvh8.py)
            tid_k = lax.bitcast_convert_type(
                gt[9 * bvh.leaf_size + k], jnp.int32
            )
            best = jnp.where(better, tid_k, best)
            if instanced:
                best_inst = jnp.where(better, cur, best_inst)
        out = (stack, tn_stack, sp, t, u, v, best, overflow, steps + 1)
        if instanced:
            out = out + (cur, best_inst, tuple(op), tuple(dp), tuple(ip))
        return out

    out = lax.while_loop(cond, body, state)
    pending = ((out[2] > 0) | (out[7] > 0)).astype(jnp.int32)
    # dummy scalar keeps the lax.map output arity fixed when not instanced
    best_inst = out[10] if instanced else jnp.zeros((), jnp.int32)
    return out[3], out[4], out[5], out[6], best_inst, pending, out[8]


def closest_hit_staged(
    bvh: WideBVH,
    origin: jnp.ndarray,
    direction: jnp.ndarray,
    tmin: float,
    tmax: float,
    active=None,
    max_steps: int = 100_000,
    chunk: int | None = DEFAULT_CHUNK,
    phase1_cap: int = 12,
    phase1_stack: int = 16,
):
    """Two-phase closest hit — the lockstep-tail fix.

    A chunk's while_loop runs as long as its LONGEST ray: measured on
    box_city bounce rays, mean useful pops/ray is 7.4 but chunks run 26.5
    iterations (3.6x tail waste; oracle pop-sorting reached 22.8 vs 8.4
    Mrays/s). Phase 1 caps every chunk at ``phase1_cap`` iterations
    (finishes ~p90 of rays) on a ``phase1_stack``-deep truncated stack
    (actual occupancy is ~12-16 vs the worst-case (arity-1)*height+2, which
    VMEM-spills on deep scenes); stragglers AND stack-overflow rays are
    packed together by ONE sort and re-traced from the root at full depth
    with their phase-1 best t as the cull seed, now in pop-homogeneous
    chunks. Returns the standard closest_hit dict.
    """
    n = origin.shape[0]
    if active is None:
        active = jnp.ones((n,), dtype=bool)
    p1 = closest_hit(
        bvh, origin, direction, tmin, tmax, active=active,
        max_steps=max_steps, chunk=chunk, iter_cap=phase1_cap,
        stack_cap=phase1_stack,
    )
    pend = p1["pending"] & active
    # composite i32 key (done<<30 | idx): unique → stable, and no pred
    # operands enter the sorts (pred staging copies measured ~30 ms each
    # at frame scale)
    done_bit = jnp.int32(1 << 30)
    ikey = jnp.where(pend, 0, done_bit) | jnp.arange(n, dtype=jnp.int32)
    s = lax.sort(
        [ikey,
         origin[:, 0], origin[:, 1], origin[:, 2],
         direction[:, 0], direction[:, 1], direction[:, 2],
         p1["t"]],
        num_keys=1,
    )
    p2s = closest_hit(
        bvh,
        jnp.stack(s[1:4], axis=1),
        jnp.stack(s[4:7], axis=1),
        tmin, tmax,
        active=s[0] < done_bit,
        max_steps=max_steps,
        chunk=chunk,
        t_seed=s[7] * (1.0 + 1e-6),
    )
    tri_or_miss = jnp.where(p2s["hit"], p2s["tri_id"], -1)
    instanced = bvh.num_instances > 0
    u = lax.sort(
        [s[0] & (done_bit - 1), p2s["t"], p2s["u"], p2s["v"], tri_or_miss]
        + ([p2s["inst"]] if instanced else []),
        num_keys=1,
    )
    closer = pend & (u[4] >= 0)
    out = {
        "t": jnp.where(closer, u[1], p1["t"]),
        "u": jnp.where(closer, u[2], p1["u"]),
        "v": jnp.where(closer, u[3], p1["v"]),
        "tri_id": jnp.where(closer, u[4], p1["tri_id"]),
        "hit": p1["hit"] | closer,
        "pending": jnp.zeros_like(pend),
        "steps": p1["steps"] + p2s["steps"],
    }
    if instanced:
        out["inst"] = jnp.where(closer, u[5], p1["inst"])
    return out


def closest_hit(
    bvh: WideBVH,
    origin: jnp.ndarray,
    direction: jnp.ndarray,
    tmin: float,
    tmax: float,
    active=None,
    max_steps: int = 100_000,
    chunk: int | None = DEFAULT_CHUNK,
    t_seed: jnp.ndarray | None = None,
    iter_cap: int | None = None,
    stack_cap: int | None = None,
):
    """Closest-hit query. Returns dict(t, tri_id, u, v, hit, pending, steps)
    of (N,) arrays — same contract as traverse.closest_hit.

    ``t_seed`` (N,) optionally seeds the per-ray t-limit with a known upper
    bound on the closest hit (any t of ANY hit is valid): subtrees beyond it
    are culled from the first pop. Seeded rays that find nothing closer
    report miss — callers that seed from a real hit must treat that as
    "the seed was the hit".

    ``iter_cap`` bounds each chunk's while_loop: rays whose stack is not
    empty at the cap return ``pending=True`` with their best-so-far hit
    (closest_hit_staged uses this — the lockstep tail fix).

    ``stack_cap`` truncates the traversal stack below the worst-case
    ``bvh.stack_depth``: rays whose pushes ever overflow are flagged
    ``pending`` (their result may be wrong — the staged re-trace fixes
    them). Deep trees make the worst-case stack enormous ((arity-1)*height+2
    = 92 rows at 10M tris — VMEM-spilling); actual max occupancy is ~12-16."""
    n0 = origin.shape[0]
    if active is None:
        active = jnp.ones((n0,), dtype=bool)
    if chunk is None or n0 <= chunk:
        chunk = max(((n0 + SUB * 128 - 1) // (SUB * 128)) * SUB * 128,
                    SUB * 128)
    o_r, d_r, inv_r, sp0, t0, c, l, n0 = _batch_tiles(
        origin, direction, active, chunk, t_seed
    )
    if t0 is None:
        t0 = jnp.full((c, SUB, l), jnp.inf, dtype=jnp.float32)
    depth = bvh.stack_depth if stack_cap is None else min(
        stack_cap, bvh.stack_depth
    )
    # iter_cap may be a TRACED scalar (per-bounce caps under lax.scan); the
    # while_loop cond handles dynamic limits natively.
    if iter_cap is None:
        step_limit = max_steps
    elif isinstance(iter_cap, int):
        step_limit = min(max_steps, iter_cap)
    else:
        step_limit = jnp.minimum(jnp.int32(max_steps), iter_cap)

    xs = (
        jnp.stack(o_r, axis=1),  # (C, 3, 8, L)
        jnp.stack(d_r, axis=1),
        jnp.stack(inv_r, axis=1),
        sp0,
        t0,
    )

    def step(args):
        o_i, d_i, inv_i, sp_i, t_i = args
        return _closest_loop(
            bvh, [o_i[a] for a in range(3)], [d_i[a] for a in range(3)],
            [inv_i[a] for a in range(3)], sp_i, t_i,
            tmin, tmax, step_limit, depth,
        )

    if c == 1:
        outs = step(tuple(x[0] for x in xs))
        t, u, v, best, inst, pending, steps = outs
        steps_total = steps
    elif DYN_TRIP:
        instanced = bvh.num_instances > 0
        zf = jnp.zeros((c, SUB, l), jnp.float32)
        zi = jnp.zeros((c, SUB, l), jnp.int32)
        init = (
            zf, zf, zf,                      # t, u, v (dead lanes: masked)
            jnp.full((c, SUB, l), -1, jnp.int32),  # best: miss
            jnp.full((c, SUB, l), -1, jnp.int32) if instanced
            else jnp.zeros((c,), jnp.int32),       # inst (dummy scalar o.w.)
            zi,                              # pending: no work left
            jnp.zeros((c,), jnp.int32),      # steps
        )
        t, u, v, best, inst, pending, steps = _chunk_map(
            step, xs, init, _dyn_trip_count(sp0)
        )
        steps_total = jnp.sum(steps)
    else:
        t, u, v, best, inst, pending, steps = jax.lax.map(step, xs)
        steps_total = jnp.sum(steps)

    # batch-level epilogue: reshapes only — the winning tri id was read off
    # the gathered leaf row in-loop (an epilogue leaf_perm gather measured
    # ~18 ms at 1.9M rays; gathers from small 1-D tables are
    # element-rate-bound on TPU)
    best_f = best.reshape(-1)[:n0]
    out = {
        "t": t.reshape(-1)[:n0],
        "tri_id": best_f,
        "u": u.reshape(-1)[:n0],
        "v": v.reshape(-1)[:n0],
        "hit": best_f >= 0,
        "pending": pending.reshape(-1)[:n0] > 0,
        "steps": steps_total,
    }
    if bvh.num_instances > 0:
        out["inst"] = inst.reshape(-1)[:n0]
    return out


def occluded(
    bvh: WideBVH,
    origin: jnp.ndarray,
    direction: jnp.ndarray,
    tmin: float,
    tmax: float,
    active=None,
    max_steps: int = 100_000,
    chunk: int | None = DEFAULT_CHUNK,
    cull_backface: bool = True,
    stack_cap: int | None = None,
    iter_cap: int | None = None,
    return_pending: bool = False,
):
    """Any-hit occlusion with first-hit termination. Back-face culling
    defaults on (the PT_sv5_ occlusion ray flag, deviceProgram.cu:237); the
    04-sample shadow ray disables it. Returns (N,) bool.

    ``stack_cap``/``iter_cap``/``return_pending`` mirror closest_hit's
    truncated phase-1 machinery: the worst-case stack depth
    ((arity-1)*height+2 = 47 on the bench scene) makes every push/pop
    one-hot scan 3x the rows the ~16-entry ACTUAL occupancy needs. With
    ``return_pending`` the result is (occ, pending): un-occluded rays whose
    stack overflowed or hit the iteration cap must be re-traced (the staged
    occlusion pass in render/integrator.py)."""
    n0 = origin.shape[0]
    if active is None:
        active = jnp.ones((n0,), dtype=bool)
    if chunk is None or n0 <= chunk:
        chunk = max(((n0 + SUB * 128 - 1) // (SUB * 128)) * SUB * 128,
                    SUB * 128)
    o_r, d_r, inv_r, sp0, _t0, c, l, n0 = _batch_tiles(
        origin, direction, active, chunk
    )
    depth = bvh.stack_depth if stack_cap is None else min(
        stack_cap, bvh.stack_depth
    )
    if iter_cap is None:
        step_limit = max_steps
    elif isinstance(iter_cap, int):
        step_limit = min(max_steps, iter_cap)
    else:
        step_limit = jnp.minimum(jnp.int32(max_steps), iter_cap)

    instanced = bvh.num_instances > 0

    def loop(o_t, d_t, inv_t, sp_init):
        state = (
            jnp.zeros((depth, SUB, l), dtype=jnp.int32),
            sp_init,
            jnp.zeros((SUB, l), dtype=bool),  # occ
            jnp.zeros((), dtype=jnp.int32),
            jnp.zeros((SUB, l), dtype=jnp.int32),  # overflowed
        )
        if instanced:
            state = state + (tuple(o_t), tuple(d_t), tuple(inv_t))

        def cond(s):
            return jnp.any(s[1] > 0) & (s[3] < step_limit)

        def body(s):
            stack, sp, occ, steps, overflow = s[:5]
            if instanced:
                op, dp, ip = (list(x) for x in s[5:])
            sp = jnp.where(occ, 0, sp)  # occluded rays drop remaining work
            entry, sp, has = _pop(stack, sp)
            if instanced:
                is_inst = has & (entry >= 0) & ((entry & INST_BIT) != 0)
                is_node = has & (entry >= 0) & ~is_inst
                is_leaf = has & (entry < 0)
                gt = _gather_row(bvh.table, entry, is_leaf, bvh, is_inst)
                node_world = is_node & (entry < bvh.blas_base)
                n_op, n_dp, n_ip = _apply_inv_transform(gt, o_t, d_t)
                for a in range(3):
                    op[a] = jnp.where(is_inst, n_op[a], op[a])
                    dp[a] = jnp.where(is_inst, n_dp[a], dp[a])
                    ip[a] = jnp.where(is_inst, n_ip[a], ip[a])
                o_use = [
                    jnp.where(node_world, o_t[a], op[a]) for a in range(3)
                ]
                inv_use = [
                    jnp.where(node_world, inv_t[a], ip[a]) for a in range(3)
                ]
                o_leaf, d_leaf = op, dp
            else:
                is_node = has & (entry >= 0)
                is_leaf = has & (entry < 0)
                gt = _gather_row(bvh.table, entry, is_leaf)
                o_use, inv_use = o_t, inv_t
                o_leaf, d_leaf = o_t, d_t

            tlim = jnp.full_like(sp, tmax, dtype=jnp.float32)
            hits, _tns, entries = _expand(
                gt, is_node, o_use, inv_use, tmin, tlim, bvh.arity
            )
            keys = [h.astype(jnp.float32) for h in hits]  # hits first
            _, entries_c = _sort_desc(keys, entries)
            cnt = hits[0].astype(jnp.int32)
            for h in hits[1:]:
                cnt = cnt + h.astype(jnp.int32)
            if instanced:
                root_code = lax.bitcast_convert_type(gt[0], jnp.int32)
                entries_c = list(entries_c)
                entries_c[0] = jnp.where(is_inst, root_code, entries_c[0])
                cnt = jnp.where(is_inst, 1, cnt)
            if depth < bvh.stack_depth:
                overflow = overflow | (sp + cnt > depth).astype(jnp.int32)
            stack, sp = _push(stack, sp, entries_c, cnt)

            leaf_out = _leaf_hits(
                gt, is_leaf, o_leaf, d_leaf, tmin, tmax, cull_backface,
                bvh.leaf_size
            )
            for hit_k, _t, _u, _v in leaf_out:
                occ = occ | hit_k
            out = (stack, sp, occ, steps + 1, overflow)
            if instanced:
                out = out + (tuple(op), tuple(dp), tuple(ip))
            return out

        out = lax.while_loop(cond, body, state)
        occ_i = out[2].astype(jnp.int32)
        # pending: NOT occluded but work remained (overflow or iter cap)
        pend_i = (~out[2] & ((out[1] > 0) | (out[4] > 0))).astype(jnp.int32)
        return occ_i, pend_i

    xs = (
        jnp.stack(o_r, axis=1),
        jnp.stack(d_r, axis=1),
        jnp.stack(inv_r, axis=1),
        sp0,
    )

    def step(args):
        o_i, d_i, inv_i, sp_i = args
        return loop(
            [o_i[a] for a in range(3)], [d_i[a] for a in range(3)],
            [inv_i[a] for a in range(3)], sp_i,
        )

    if c == 1:
        occ, pend = step(tuple(x[0] for x in xs))
    elif DYN_TRIP:
        zi = jnp.zeros((c, SUB, l), jnp.int32)
        occ, pend = _chunk_map(step, xs, (zi, zi), _dyn_trip_count(sp0))
    else:
        occ, pend = jax.lax.map(step, xs)
    occ_out = occ.reshape(-1)[:n0] > 0
    if return_pending:
        return occ_out, pend.reshape(-1)[:n0] > 0
    return occ_out
