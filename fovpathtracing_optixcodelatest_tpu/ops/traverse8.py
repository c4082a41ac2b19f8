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
(D, 8, L) stack), and either expands an internal node (unrolled slab tests
+ push of hit children, near-to-far via a Batcher sorting network) or
intersects its leaf row (unrolled Möller-Trumbore). Iterations ≈ max
per-ray pops within a chunk.

4. Stack entries are ONE packed u32 each: (monotone-mapped tn truncated to
   the high bits) | (ucode in the low ``codebits`` bits). Near-to-far child
   ordering, the stale-pop drain test and the push therefore run on a
   single array — the round-2 twin (entry i32, tn f32) stacks paid 2x the
   one-hot traffic and a 3-operand Batcher swap. tn quantization truncates
   toward -inf, so ordering is approximate (affects only pop order) while
   staleness (tn > tlimit) stays conservative — results are bit-identical.

5. Iteration 0 of every chunk is unrolled: the first pop is always the
   root, so its expand reads a static table[0] slice instead of paying the
   row gather + transpose + stack one-hots.

``occluded`` implements the reference's occlusion ray semantics: back-face
culling + first-hit termination (deviceProgram.cu:224-248).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax import lax

from fovpathtracing_optixcodelatest_tpu.ops.bvh8 import (
    KIND_INST,
    KIND_LEAF,
    KIND_NODE,
    WideBVH,
    codebits,
)

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

# Independent lockstep chunks interleaved per while-loop iteration
# ("streams"). FALSIFIED at K>1 (round 3, measured): bench frame 453 -> 514
# ms at K=4 / 701 at K=8; deep 1.9M-tri staged 1769 -> 2219 ms at K=4. The
# scratch/exp_r3_multigather.py result that motivated this ("K independent
# gathers cost the same as one") was an artifact: its loop body consumed
# only 2 of 64 gathered columns, so XLA narrowed each gather 32x and K=8
# fit in one gather's latency. With full-width gathers the TPU executes
# fusions sequentially — interleaving K chunks only adds sibling-idle
# lockstep waste. K=1 keeps the (bit-identical) single-chunk behavior.
DEFAULT_STREAMS = int(os.environ.get("FOVTPU_STREAMS", 1))

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

# Windowed HBM traversal (deep scenes): gathers from tables past
# ~128k rows run at per-index HBM rate (~640 us per 32k-index gather vs
# ~50 us VMEM-resident — scratch/r4_window2.py measured the dynamic_slice
# window erasing the WHOLE penalty: 641->433 us/iter at 243k rows, 680->433
# at 872k, index-band confinement alone does nothing). The windowed step
# slices a WINDOW_ROWS-row band starting at the minimum active lane's row
# (the min lane is always served => guaranteed progress), gathers relative
# indices from the VMEM-resident band, and DEFERS out-of-window lanes by
# re-pushing their just-popped entry. Requires the DFS-interleaved row
# layout (bvh8.dfs_permute_host) so a lane's working set is a contiguous
# band; results stay bit-identical (deferral only reorders pops).
WINDOW_ROWS = int(os.environ.get("FOVTPU_WINROWS", 8192))


def _use_window(bvh) -> bool:
    """Static ELIGIBILITY for the windowed HBM step (see WINDOW_ROWS).
    Windowing is strictly OPT-IN per call (closest_hit(window=True)): only
    the treelet rounds sort lanes into window-affine order first, and
    without that sort the min-base window SERIALIZES divergent lanes
    (measured 4x worse than direct HBM gathers at 1.9M tris)."""
    return (
        bvh.dfs
        and bvh.num_instances == 0
        and bvh.num_rows > WINDOW_ROWS
        and WINDOW_ROWS > 0
    )


def _window_gather(table, row, fresh):
    """Windowed row gather: returns (gt, in_win). Lanes outside the
    [base, base + WINDOW_ROWS) band get in_win=False and garbage planes the
    caller must mask; ``base`` is the min row over ``fresh`` lanes."""
    num_rows = table.shape[0]
    rowv = jnp.where(fresh, row, jnp.int32(num_rows - 1))
    base = jnp.min(rowv)
    base = jnp.clip(base, 0, num_rows - WINDOW_ROWS)
    in_win = fresh & (row - base < WINDOW_ROWS)
    win = lax.dynamic_slice(
        table, (base, jnp.int32(0)), (WINDOW_ROWS, table.shape[1])
    )
    rel = jnp.clip(row - base, 0, WINDOW_ROWS - 1)
    return _gather_row(win, rel), in_win

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


def _sort_desc(keys):
    """Sort ONE key list descending via the Batcher network: every stack
    entry is a single packed u32 (quantized tn | ucode), so a comparator is
    just (max, min) — the 3-where swap of separate (key, entry, tn) operand
    lists measured ~3x the VPU work."""
    k = list(keys)
    for i, j in _batcher_net(len(keys)):
        a, b = k[i], k[j]
        k[i] = jnp.maximum(a, b)
        k[j] = jnp.minimum(a, b)
    return k


def _mono_u32(x):
    """Monotone f32 -> u32 map (a < b <=> mono(a) < mono(b), NaN-free
    inputs): flip all bits of negatives, set the sign bit of non-negatives.
    Lets quantized-tn ordering, stale tests and pushes run on ONE u32."""
    b = lax.bitcast_convert_type(x, jnp.uint32)
    return jnp.where(x < 0, ~b, b | jnp.uint32(0x80000000))


def _gather_row(table, row, bvh=None, is_inst=None):
    """ONE unified row gather per step: node, leaf AND instance rows live in
    the same (U, W) table, so entry type never costs a second gather.
    ``row`` is the decoded ucode row field (instance ids are rebased).

    Returns W planes of (8, L)."""
    if is_inst is not None:
        row = jnp.where(is_inst, bvh.inst_base + row, row)
    g = jnp.take(table, row, axis=0)  # (8, L, W)
    gt = jnp.transpose(g, (2, 0, 1))  # (W, 8, L) — the one relayout per step
    return gt


def _expand(gt, is_node, o_r, inv_r, tmin, tlimit, arity):
    """Slab-test the ``arity`` children encoded in a gathered node row.

    Box bounds are conservative bf16 pairs packed two-per-f32 (bvh8.py):
    lo = high 16 bits widened, hi = low 16 bits widened. Child metadata is
    the pre-encoded traversal ucode ((row << 2) | kind; 0 = EMPTY slot).

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
        code = lax.bitcast_convert_type(gt[3 * arity + c], jnp.uint32)
        hit = (
            (tn <= tf) & (tf >= tmin) & (tn <= tlimit)
            & (code != 0) & is_node  # ucode 0 = EMPTY slot
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
    entry = jnp.sum(jnp.where(d_iota == spc[None], stack, stack.dtype.type(0)),
                    axis=0)
    return entry, spc, has


def _pop_fresh(stack, sp, tlim_key, drains: int):
    """Pop from the packed (tn | ucode) u32 stack, skipping up to ``drains``
    STALE entries: 46% of closest-hit pops are stale by pop time (measured,
    box_city), and in lockstep every stale pop costs a full iteration.

    ``tlim_key`` = mono(tlimit) | lowmask, so ``packed > tlim_key`` tests
    exactly tn_trunc > tlimit_trunc, which implies the un-quantized
    tn > tlimit (truncation rounds toward -inf) — draining and the final
    freshness cull stay conservative: only provably-stale entries die.

    The ``drains+1`` candidate depths (sp-1, sp-2, ...) are all known before
    any stack read, so every candidate's one-hot pick runs in ONE fused pass
    over the (D, 8, L) stack — one stack read total, not ``drains+1`` (the
    stack reduction is the traversal loop's dominant VMEM traffic).
    Returns (packed_entry, sp, fresh)."""
    d_iota = jnp.arange(stack.shape[0], dtype=jnp.int32)[:, None, None]
    cands = []  # (entry_j, has_j) for candidate depth sp-1-j
    for j in range(drains + 1):
        onehot = d_iota == (sp - 1 - j)[None]
        e_j = jnp.sum(jnp.where(onehot, stack, jnp.uint32(0)), axis=0)
        cands.append((e_j, sp > j))
    entry, has = cands[0]
    consumed = jnp.ones_like(sp)
    advance = jnp.ones_like(has)  # still draining stale entries
    for e_j, has_j in cands[1:]:
        advance = advance & has & (entry > tlim_key)
        entry = jnp.where(advance, e_j, entry)
        has = jnp.where(advance, has_j, has)
        consumed = consumed + advance.astype(jnp.int32)
    sp = jnp.maximum(sp - consumed, 0)
    fresh = has & (entry <= tlim_key)
    return entry, sp, fresh


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


def _ch_init(bvh, o_r, inv_r, sp0, t0, tmin, tmax, depth, lowmask, himask):
    """Per-chunk closest-hit init with iteration 0 UNROLLED: every active
    lane's first pop is the ROOT (the zeros-initialized stack decodes to
    ucode 0 = internal row 0), so the root expand reads a STATIC table[0]
    slice — no row gather, no transpose copy, no stack one-hots. Root is a
    world-space node row by construction (pack_wide and the TLAS builder
    both emit a node row 0), so no instance or leaf handling is needed; the
    push/pop sequence is bit-identical to the general iteration it replaces.

    Returns the chunk state tuple (stack, sp, t, u, v, best, overflow
    [+ cur, best_inst, op, dp, ip when instanced])."""
    l = sp0.shape[-1]
    root_gt = [bvh.table[0, i] for i in range(4 * bvh.arity)]
    tlim0 = jnp.minimum(t0, tmax)
    hits0, tns0, codes0 = _expand(
        root_gt, sp0 > 0, o_r, inv_r, tmin, tlim0, bvh.arity
    )
    keys0 = _sort_desc([
        jnp.where(h, (_mono_u32(tn) & himask) | c, jnp.uint32(0))
        for h, tn, c in zip(hits0, tns0, codes0)
    ])
    cnt0 = hits0[0].astype(jnp.int32)
    for h in hits0[1:]:
        cnt0 = cnt0 + h.astype(jnp.int32)
    d_iota0 = jnp.arange(depth, dtype=jnp.int32)[:, None, None]
    eac0 = keys0[0][None]
    for j in range(1, len(keys0)):
        eac0 = jnp.where(d_iota0 == j, keys0[j][None], eac0)
    state = (
        jnp.where(d_iota0 < cnt0[None], eac0, jnp.uint32(0)),
        jnp.minimum(cnt0, depth),
        t0,
        jnp.zeros((SUB, l), dtype=jnp.float32),
        jnp.zeros((SUB, l), dtype=jnp.float32),
        jnp.full((SUB, l), -1, dtype=jnp.int32),
        jnp.zeros((SUB, l), dtype=jnp.int32)
        + (cnt0 > depth).astype(jnp.int32)
        * (depth < bvh.stack_depth),  # overflowed
        (sp0 > 0).astype(jnp.int32),  # useful pops (root expand counts 1)
    )
    return state


def _ch_init_from_entry(bvh, sp0, e_planes, t0, depth, l):
    """Round-start init for the treelet rounds: each active lane begins
    from up to K provided packed stack entries (its K nearest pending
    treelet roots, 0xFFFFFFFF = empty slot) instead of the unrolled root
    expand.

    Entries are re-ordered by ASCENDING ROW before seeding, lowest row on
    TOP: pops then move through the table in the same low-to-high direction
    as the min-base gather window, so the whole chunk sweeps its windows
    ONCE instead of convoying back and forth between each lane's t-ordered
    bands (measured: t-ordered seeding ran the rounds for ~24k lockstep
    iterations vs ~hundreds expected at 1.9M tris). Pop order is the only
    thing this changes — a nearer-but-later entry that goes stale is
    drained conservatively, so results stay exact."""
    sent = jnp.uint32(0xFFFFFFFF)
    cb = codebits(bvh.num_rows)
    lowmask = jnp.uint32((1 << cb) - 1)
    d_iota = jnp.arange(depth, dtype=jnp.int32)[:, None, None]
    act = sp0 > 0
    # sort (row, entry) pairs ascending by row; SENT rows sort last
    rows = [
        jnp.where(e != sent, (e & lowmask) >> 2, jnp.uint32(0xFFFFFFFF))
        for e in e_planes
    ]
    ents = list(e_planes)
    for i, j in _batcher_net(len(ents)):
        swap = rows[i] > rows[j]
        ri, rj = rows[i], rows[j]
        ei, ej = ents[i], ents[j]
        rows[i] = jnp.where(swap, rj, ri)
        rows[j] = jnp.where(swap, ri, rj)
        ents[i] = jnp.where(swap, ej, ei)
        ents[j] = jnp.where(swap, ei, ej)
    valid = [act & (e != sent) for e in ents]
    cnt = valid[0].astype(jnp.int32)
    for vk in valid[1:]:
        cnt = cnt + vk.astype(jnp.int32)
    stack = jnp.zeros((depth, SUB, l), dtype=jnp.uint32)
    for k, (e, vk) in enumerate(zip(ents, valid)):
        # ascending-row entries fill top-down: entry k sits at depth
        # cnt-1-k, so the LOWEST row pops first
        stack = jnp.where(
            (d_iota == (cnt - 1 - k)[None]) & vk[None], e[None], stack
        )
    return (
        stack,
        cnt,
        t0,
        jnp.zeros((SUB, l), dtype=jnp.float32),
        jnp.zeros((SUB, l), dtype=jnp.float32),
        jnp.full((SUB, l), -1, dtype=jnp.int32),
        jnp.zeros((SUB, l), dtype=jnp.int32),  # overflow
        jnp.zeros((SUB, l), dtype=jnp.int32),  # pops
    )


def _ch_step(bvh, rays_k, st, tmin, tmax, depth, lowmask, himask,
             window=False):
    """One closest-hit iteration for ONE chunk: pop (stale-draining), gather
    the popped row, slab-expand / leaf-intersect, near-to-far push.

    Two-level (instanced) tables add per-lane space tracking: popping an
    instance ucode (kind bits == 2) loads the row's inverse transform,
    primes the lane's object-space ray, and pushes the BLAS root (one
    iteration); stack discipline guarantees at most one instance's BLAS
    rows are live on a lane's stack, so a single ``cur`` register tracks
    the space. Popping a TLAS node restores world space. Statically
    compiled out when ``bvh.num_instances == 0``."""
    o_r, d_r, inv_r = rays_k
    instanced = bvh.num_instances > 0
    stack, sp, t, u, v, best, overflow, pops = st[:8]
    if instanced:
        cur, best_inst, op, dp, ip = st[8:]
        op, dp, ip = list(op), list(dp), list(ip)
    tlimit = jnp.minimum(t, tmax)
    tlim_key = _mono_u32(tlimit) | lowmask
    packed, sp, fresh = _pop_fresh(
        stack, sp, tlim_key, drains=DEFAULT_DRAINS
    )
    pops = pops + fresh.astype(jnp.int32)
    code = packed & lowmask
    kind = code & 3
    row = (code >> 2).astype(jnp.int32)
    is_leaf = fresh & (kind == KIND_LEAF)
    is_node = fresh & (kind == KIND_NODE)
    windowed = _use_window(bvh) and window
    defer = None
    if instanced:
        is_inst = fresh & (kind == KIND_INST)
        gt = _gather_row(bvh.table, row, bvh, is_inst)
        # space transitions: TLAS node -> world; instance pop -> primed
        node_world = is_node & (row < bvh.blas_base)
        n_op, n_dp, n_ip = _apply_inv_transform(gt, o_r, d_r)
        for a in range(3):
            op[a] = jnp.where(is_inst, n_op[a], op[a])
            dp[a] = jnp.where(is_inst, n_dp[a], dp[a])
            ip[a] = jnp.where(is_inst, n_ip[a], ip[a])
        cur = jnp.where(is_inst, row, jnp.where(node_world, -1, cur))
        o_use = [jnp.where(node_world, o_r[a], op[a]) for a in range(3)]
        inv_use = [
            jnp.where(node_world, inv_r[a], ip[a]) for a in range(3)
        ]
        o_leaf, d_leaf = op, dp
    elif windowed:
        gt, in_win = _window_gather(bvh.table, row, fresh)
        defer = fresh & ~in_win
        is_leaf = is_leaf & in_win
        is_node = is_node & in_win
        pops = pops - defer.astype(jnp.int32)  # deferred pop did no work
        o_use, inv_use = o_r, inv_r
        o_leaf, d_leaf = o_r, d_r
    else:
        gt = _gather_row(bvh.table, row)
        o_use, inv_use = o_r, inv_r
        o_leaf, d_leaf = o_r, d_r

    hits, tns, codes = _expand(
        gt, is_node, o_use, inv_use, tmin, tlimit, bvh.arity
    )
    keys = [
        jnp.where(h, (_mono_u32(tn) & himask) | c, jnp.uint32(0))
        for h, tn, c in zip(hits, tns, codes)
    ]
    keys_c = _sort_desc(keys)
    cnt = hits[0].astype(jnp.int32)
    for h in hits[1:]:
        cnt = cnt + h.astype(jnp.int32)
    if instanced:
        # instance redirect: push the BLAS root with the instance's tn
        root_code = lax.bitcast_convert_type(gt[0], jnp.uint32)
        keys_c[0] = jnp.where(
            is_inst, (packed & himask) | root_code, keys_c[0]
        )
        cnt = jnp.where(is_inst, 1, cnt)
    elif defer is not None:
        # windowed deferral: re-push the popped entry untouched; the lane
        # waits until the window reaches its band (min-lane progress
        # guarantees the window eventually does)
        keys_c[0] = jnp.where(defer, packed, keys_c[0])
        cnt = jnp.where(defer, 1, cnt)
    if depth < bvh.stack_depth:
        overflow = overflow | (sp + cnt > depth).astype(jnp.int32)
    stack, sp = _push(stack, sp, keys_c, cnt)

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
    out = (stack, sp, t, u, v, best, overflow, pops)
    if instanced:
        out = out + (cur, best_inst, tuple(op), tuple(dp), tuple(ip))
    return out


def _closest_loop(bvh, chunks, tmin, tmax, step_limit, depth,
                  window=False):
    """Closest-hit while_loop over K independent lockstep chunks
    ("streams") advanced one iteration each per loop step.

    Why streams: the row gather is DEPENDENT-CHAIN LATENCY-bound, not
    rate-bound — K independent 32k-row gathers in one loop body cost the
    same wall time as one (measured flat to K=8 on both VMEM- and
    HBM-resident tables, scratch/exp_r3_multigather.py), so interleaving K
    chunks overlaps their gathers and the per-iteration cost is shared.
    Each chunk keeps its own stack/lockstep semantics; per-lane results are
    bit-identical to running the chunks separately (a finished chunk idles
    until the slowest sibling exits, changing only the steps stat).

    ``chunks``: list over streams of (o_r, d_r, inv_r, sp0, t0).
    Returns lists over streams of (t, u, v, best, best_inst, pending), plus
    the shared iteration count."""
    instanced = bvh.num_instances > 0
    # packed-stack constants (static): low ``cb`` bits carry the ucode, the
    # high bits the monotone-quantized tn — one u32 per stack entry
    cb = codebits(bvh.num_rows)
    assert cb <= 26, "table too large for packed tn|ucode stack entries"
    lowmask = jnp.uint32((1 << cb) - 1)
    himask = jnp.uint32(0xFFFFFFFF & ~((1 << cb) - 1))

    states = []
    rays = []
    from_entry = False
    for ch in chunks:
        o_r, d_r, inv_r, sp0, t0 = ch[:5]
        e0 = ch[5] if len(ch) > 5 else None
        if e0 is None:
            st = _ch_init(
                bvh, o_r, inv_r, sp0, t0, tmin, tmax, depth, lowmask,
                himask,
            )
        else:
            from_entry = True
            st = _ch_init_from_entry(
                bvh, sp0, [e0[k] for k in range(e0.shape[0])], t0, depth,
                sp0.shape[-1],
            )
        if instanced:
            st = st + (
                jnp.full_like(sp0, -1),  # cur instance
                jnp.full_like(sp0, -1),  # best-hit instance
                tuple(o_r), tuple(d_r), tuple(inv_r),  # primed (object) ray
            )
        states.append(st)
        rays.append((o_r, d_r, inv_r))
    # steps starts at 1: the unrolled root expand was iteration 1
    # (entry-seeded rounds do no root expand — start at 0)
    state = (
        jnp.asarray(0 if from_entry else 1, dtype=jnp.int32),
        tuple(states),
    )

    def cond(s):
        work = s[1][0][1] > 0
        for st in s[1][1:]:
            work = work | (st[1] > 0)
        return jnp.any(work) & (s[0] < step_limit)

    def body(s):
        steps, sts = s
        new = tuple(
            _ch_step(bvh, rays[k], sts[k], tmin, tmax, depth, lowmask,
                     himask, window=window)
            for k in range(len(sts))
        )
        return (steps + 1, new)

    steps, outs = lax.while_loop(cond, body, state)
    res = []
    for st in outs:
        pending = ((st[1] > 0) | (st[6] > 0)).astype(jnp.int32)
        # dummy scalar keeps the map output arity fixed when not instanced
        best_inst = st[9] if instanced else jnp.zeros((), jnp.int32)
        res.append((st[2], st[3], st[4], st[5], best_inst, pending, st[7]))
    return res, steps



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
        [s[0] & (done_bit - 1), p2s["t"], p2s["u"], p2s["v"], tri_or_miss,
         p2s["pops"]]
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
        "pops": p1["pops"] + u[5],
        "steps": p1["steps"] + p2s["steps"],
    }
    if instanced:
        out["inst"] = jnp.where(closer, u[6], p1["inst"])
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
    entry0: jnp.ndarray | None = None,
    window: bool = False,
):
    """Closest-hit query. Returns dict(t, tri_id, u, v, hit, pending, steps)
    of (N,) arrays — same contract as traverse.closest_hit.

    ``entry0`` (N,) uint32: per-lane packed (tn|ucode) START entry — the
    treelet round mode (closest_hit_treelet). Lanes traverse only that
    entry's subtree (packed 0 = the root ucode = a full re-trace); the
    unrolled root expand is skipped.

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

    kk = max(1, min(DEFAULT_STREAMS, c))
    cpad = (-c) % kk
    xs = (
        jnp.stack(o_r, axis=1),  # (C, 3, 8, L)
        jnp.stack(d_r, axis=1),
        jnp.stack(inv_r, axis=1),
        sp0,
        t0,
    )
    if entry0 is not None:
        if entry0.ndim == 1:
            entry0 = entry0[:, None]
        ek = entry0.shape[1]
        # pad with the empty-slot sentinel so padded lanes stay inactive
        e_pad = jnp.pad(
            entry0, ((0, c * chunk - n0), (0, 0)),
            constant_values=jnp.uint32(0xFFFFFFFF),
        )
        xs = xs + (
            jnp.moveaxis(e_pad.reshape(c, SUB, l, ek), 3, 1),  # (C,K,8,L)
        )
    if cpad:  # pad to a stream multiple with inactive chunks (sp0 = 0)
        xs = tuple(
            jnp.concatenate(
                [x, jnp.zeros((cpad,) + x.shape[1:], x.dtype)], axis=0
            )
            for x in xs
        )
    c2 = (c + cpad) // kk
    xs = tuple(x.reshape((c2, kk) + x.shape[1:]) for x in xs)
    instanced = bvh.num_instances > 0

    def step(args):
        o_i, d_i, inv_i, sp_i, t_i = args[:5]
        e_i = args[5] if len(args) > 5 else None
        res, steps = _closest_loop(
            bvh,
            [
                ([o_i[k, a] for a in range(3)],
                 [d_i[k, a] for a in range(3)],
                 [inv_i[k, a] for a in range(3)], sp_i[k], t_i[k])
                + (() if e_i is None else (e_i[k],))
                for k in range(kk)
            ],
            tmin, tmax, step_limit, depth, window=window,
        )
        stk = lambda j: jnp.stack([r[j] for r in res], axis=0)  # noqa: E731
        inst_out = stk(4) if instanced else jnp.zeros((), jnp.int32)
        return stk(0), stk(1), stk(2), stk(3), inst_out, stk(5), stk(6), steps

    if c2 == 1:
        outs = step(tuple(x[0] for x in xs))
        t, u, v, best, inst, pending, pops, steps = outs
        steps_total = steps
    elif DYN_TRIP:
        zf = jnp.zeros((c2, kk, SUB, l), jnp.float32)
        zi = jnp.zeros((c2, kk, SUB, l), jnp.int32)
        init = (
            zf, zf, zf,                      # t, u, v (dead lanes: masked)
            jnp.full((c2, kk, SUB, l), -1, jnp.int32),  # best: miss
            jnp.full((c2, kk, SUB, l), -1, jnp.int32) if instanced
            else jnp.zeros((c2,), jnp.int32),  # inst (dummy scalar o.w.)
            zi,                              # pending: no work left
            zi,                              # pops: never stepped = 0
            jnp.zeros((c2,), jnp.int32),     # steps
        )
        t, u, v, best, inst, pending, pops, steps = _chunk_map(
            step, xs, init, _dyn_trip_count(xs[3].reshape(c2, -1, l))
        )
        steps_total = jnp.sum(steps)
    else:
        t, u, v, best, inst, pending, pops, steps = jax.lax.map(step, xs)
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
        "pops": pops.reshape(-1)[:n0],
        "steps": steps_total,
    }
    if bvh.num_instances > 0:
        out["inst"] = inst.reshape(-1)[:n0]
    return out


# ---------------------------------------------------------------------------
# Treelet-phased deep-scene traversal (closest hit).
#
# Direct HBM gathers cost ~600+ us per 32k-index step once the table leaves
# VMEM; a dynamic_slice window erases the penalty (PLAN rule 42) but naive
# per-iteration windowing serializes divergent lanes (measured 0.16 vs 0.69
# Mrays/s at 1.9M tris — ~11x iteration inflation). The fix is affinity
# BEFORE lockstep: a top phase walks the tree's top rows (a static
# VMEM-resident slice) collecting each lane's pending treelet entries; lanes
# are then SORTED by treelet row so the windowed rounds serve whole chunks
# from one window. Requires the treelet layout (bvh8.treelet_permute_host,
# bvh.top_rows > 0).

# Windowed treelet rounds served per closest hit before the plain-traversal
# fallback sweep. With nearest-first serving + t-culled top re-walks, p99
# lanes finish in <= 2 rounds on box-city-class scenes.
TREELET_ROUNDS = int(os.environ.get("FOVTPU_TROUNDS", 2))
# Nearest pending treelet entries collected per lane per top pass and served
# together in one round (they seed the round's stack near-to-far).
TREELET_K = int(os.environ.get("FOVTPU_TK", 4))
# Route deep OCCLUSION through the treelet phases? Occlusion has no t-cull,
# so an un-occluded ray must serve EVERY crossed treelet — the phased walk
# only pays when early-exit hits dominate (measured: helps nowhere yet;
# 10M frame 0.23 -> 0.15 Mrays/s WITH it, 1.9M 0.77 -> 0.72). Default off.
OCCL_TREELET = os.environ.get("FOVTPU_OCCT", "0") != "0"
# Closest-hit treelet ROUTING is DEFAULT-OFF since round 5: the round-4
# "mid-band win" (238k rows: frame 0.66 -> 0.77) was an artifact of an
# under-capped plain baseline — with the scene-scaled phase-1 cap
# (integrator.phase1_cap) plain measures 0.77 Mrays/s at 224k rows vs
# treelet 0.45-0.56, and every 10M configuration (grouped or not) loses
# ~2x (the fallback is all-or-nothing per lane: a ray crossing more than
# rounds*K treelets re-traces the whole tree plain, paying the rounds as
# pure overhead). The raw mechanism (windowed gathers erase the HBM
# per-index surcharge, 680 -> 433 us/iter; raw coherent closest-hit 0.75
# -> 1.12) is real and stays available: set FOVTPU_TMAXROWS to a row
# bound to re-enable routing for tables up to that size.
TREELET_MAX_ROWS = int(os.environ.get("FOVTPU_TMAXROWS", 0))


def use_treelet(bvh) -> bool:
    """Static routing decision for the phased treelet closest hit."""
    return (
        bvh.top_rows > 0
        and bvh.num_instances == 0
        and bvh.num_rows <= TREELET_MAX_ROWS
    )
_ESENT = jnp.uint32(0xFFFFFFFF)  # "no pending treelet" (not a valid entry)


def _merge_sorted_asc(a_planes, b_planes, keep):
    """Merge two ascending plane lists into one ascending list, keeping the
    ``keep`` smallest. Batcher network on the concatenation (planes are
    (8, L) u32; _ESENT pads empties)."""
    merged = _sort_desc(list(a_planes) + list(b_planes))[::-1]
    return merged[:keep]


def _top_loop(bvh, top_tab, rays, sp0, t0, served_below, tmin, tmax,
              max_steps, depth, k_near):
    """Lockstep while_loop for one TOP pass: closest hit against the static
    VMEM-resident top slice. Child codes that land PAST the slice are
    treelet roots: they are DIVERTED at expand time into a per-lane
    K-nearest register file (never pushed — a deferred pop would burn a
    full lockstep iteration each, measured 576 ms/pass at 1.9M tris), with
    entries at or below the lane's ``served_below`` watermark skipped.
    Nearest-first serving makes the watermark exact: every entry <= it has
    already been served by an earlier round."""
    o_r, d_r, inv_r = rays
    top_limit = top_tab.shape[0]
    cb = codebits(bvh.num_rows)
    lowmask = jnp.uint32((1 << cb) - 1)
    himask = jnp.uint32(0xFFFFFFFF & ~((1 << cb) - 1))
    l = sp0.shape[-1]

    # init: root entry (packed 0) on each active lane's stack — no root
    # unroll (its push would need the treelet diversion anyway)
    d_iota = jnp.arange(depth, dtype=jnp.int32)[:, None, None]
    act = sp0 > 0
    st = (
        jnp.zeros((depth, SUB, l), dtype=jnp.uint32),
        act.astype(jnp.int32),
        t0,
        jnp.zeros((SUB, l), dtype=jnp.float32),
        jnp.zeros((SUB, l), dtype=jnp.float32),
        jnp.full((SUB, l), -1, dtype=jnp.int32),
        jnp.zeros((SUB, l), dtype=jnp.int32),  # pops
    ) + tuple(jnp.full((SUB, l), _ESENT) for _ in range(k_near))
    state = (jnp.zeros((), dtype=jnp.int32), st)

    def cond(s):
        return jnp.any(s[1][1] > 0) & (s[0] < max_steps)

    def body(s):
        steps, st = s
        stack, sp, t, u, v, best, pops = st[:7]
        near = list(st[7:])
        tlimit = jnp.minimum(t, tmax)
        tlim_key = _mono_u32(tlimit) | lowmask
        packed, sp, fresh = _pop_fresh(
            stack, sp, tlim_key, drains=DEFAULT_DRAINS
        )
        code = packed & lowmask
        kind = code & 3
        row = (code >> 2).astype(jnp.int32)
        is_leaf = fresh & (kind == KIND_LEAF)
        is_node = fresh & (kind == KIND_NODE)
        pops = pops + fresh.astype(jnp.int32)

        gt = _gather_row(top_tab, jnp.clip(row, 0, top_limit - 1))
        hits, tns, codes = _expand(
            gt, is_node, o_r, inv_r, tmin, tlimit, bvh.arity
        )
        push_keys, tl_keys = [], []
        for h, tn, c in zip(hits, tns, codes):
            key = (_mono_u32(tn) & himask) | c
            is_tl = h & ((c >> 2) >= jnp.uint32(top_limit))
            push_keys.append(jnp.where(h & ~is_tl, key, jnp.uint32(0)))
            tl_keys.append(jnp.where(
                is_tl & (key > served_below), key, _ESENT
            ))
        keys_c = _sort_desc(push_keys)
        cnt = (push_keys[0] != 0).astype(jnp.int32)
        for pk in push_keys[1:]:
            cnt = cnt + (pk != 0).astype(jnp.int32)
        stack, sp = _push(stack, sp, keys_c, cnt)
        # divert the node's nearest treelet children into the register file
        tl_sorted = _sort_desc(tl_keys)[::-1][:k_near]
        near = _merge_sorted_asc(near, tl_sorted, k_near)

        leaf_out = _leaf_hits(
            gt, is_leaf, o_r, d_r, tmin, tmax, False, bvh.leaf_size
        )
        for k, (hit_k, t_k, u_k, v_k) in enumerate(leaf_out):
            better = hit_k & (t_k < t)
            t = jnp.where(better, t_k, t)
            u = jnp.where(better, u_k, u)
            v = jnp.where(better, v_k, v)
            tid_k = lax.bitcast_convert_type(
                gt[9 * bvh.leaf_size + k], jnp.int32
            )
            best = jnp.where(better, tid_k, best)
        return (
            steps + 1,
            (stack, sp, t, u, v, best, pops) + tuple(near),
        )

    steps, st = lax.while_loop(cond, body, state)
    return st, steps


def _top_pass(bvh, origin, direction, tmin, tmax, active, t_seed,
              served_below, max_steps, chunk, k_near):
    """One chunked top pass (see _top_loop). Returns dict(t, u, v, tri_id,
    near (N, k_near) ascending, pops, steps)."""
    n0 = origin.shape[0]
    o_r, d_r, inv_r, sp0, t0, c, l, n0 = _batch_tiles(
        origin, direction, active, chunk, t_seed
    )
    sb_t = jnp.pad(served_below, (0, c * chunk - n0)).reshape(c, SUB, l)
    depth = max(bvh.top_stack, 4)
    top_tab = bvh.top_table  # separate device array — see bvh8.WideBVH
    xs = (
        jnp.stack(o_r, axis=1),
        jnp.stack(d_r, axis=1),
        jnp.stack(inv_r, axis=1),
        sp0,
        t0,
        sb_t,
    )

    def step(args):
        o_i, d_i, inv_i, sp_i, t_i, sb_i = args
        st, steps = _top_loop(
            bvh, top_tab,
            ([o_i[a] for a in range(3)], [d_i[a] for a in range(3)],
             [inv_i[a] for a in range(3)]),
            sp_i, t_i, sb_i, tmin, tmax, max_steps, depth, k_near,
        )
        (stack, sp, t, u, v, best, pops) = st[:7]
        near = jnp.stack(st[7:], axis=0)  # (K, 8, L)
        return t, u, v, best, near, pops, steps

    if c == 1:
        t, u, v, best, near, pops, steps = step(tuple(x[0] for x in xs))
        t, u, v = t[None], u[None], v[None]
        best, near, pops = best[None], near[None], pops[None]
        steps_total = steps
    elif DYN_TRIP:
        zf = jnp.zeros((c, SUB, l), jnp.float32)
        zi = jnp.zeros((c, SUB, l), jnp.int32)
        init = (
            t0, zf, zf,
            jnp.full((c, SUB, l), -1, jnp.int32),
            jnp.full((c, k_near, SUB, l), _ESENT, jnp.uint32),
            zi,
            jnp.zeros((c,), jnp.int32),
        )
        t, u, v, best, near, pops, steps = _chunk_map(
            step, xs, init, _dyn_trip_count(sp0)
        )
        steps_total = jnp.sum(steps)
    else:
        t, u, v, best, near, pops, steps = jax.lax.map(step, xs)
        steps_total = jnp.sum(steps)

    near_f = jnp.moveaxis(near, 1, 3).reshape(-1, k_near)[:n0]
    return {
        "t": t.reshape(-1)[:n0],
        "u": u.reshape(-1)[:n0],
        "v": v.reshape(-1)[:n0],
        "tri_id": best.reshape(-1)[:n0],
        "near": near_f,
        "pops": pops.reshape(-1)[:n0],
        "steps": steps_total,
    }


def closest_hit_treelet(
    bvh: WideBVH,
    origin, direction, tmin, tmax,
    active=None,
    max_steps: int = 100_000,
    chunk: int | None = DEFAULT_CHUNK,
    rounds: int | None = None,
    k_near: int | None = None,
):
    """Deep-scene closest hit over a treelet-laid table (bvh.top_rows > 0).

    Iterative K-nearest treelet serving:

      repeat ``rounds`` times:
        1. TOP pass at VMEM rate (static top slice, tiny top-only stack),
           t-culled by the current best t; treelet child codes are diverted
           at expand time into a per-lane K-nearest register file, skipping
           everything at or below the served-watermark.
        2. Lanes sort by their nearest entry's ROW (chunks then share
           dynamic_slice gather windows — each treelet is a contiguous
           <=budget-row band) and traverse those K subtrees in one windowed
           pass, stack-seeded near-to-far, t-seeded with the current best.
        3. The watermark advances to the largest entry served, so the next
           t-culled top re-walk sees only genuinely unserved treelets.
      finally: rare stragglers (still-pending lanes after ``rounds``)
      finish with ONE plain direct-gather re-trace.

    Results are exactly the plain traversal's (pop order is the only thing
    that changes; tests/test_bvh.py pins bit-identity through the
    integrator). Caveat: best-hit updates use a STRICT t_k < t compare, so
    a ray hitting two triangles at the identical f32 t (a shared-edge
    grazing hit) reports whichever leaf its pop order visits first — the
    phased pop order can then pick a different tri_id (hence different u/v)
    than the plain path. The bit-identity contract assumes no exact f32
    t-ties, which holds for the jittered ray sets the tests and renderer
    produce. Measured basis: direct HBM gathers ~600 us/32k-step vs
    ~50 VMEM (PLAN rules 41-42); the row-sorted windowed round ran at 8x
    the plain rate (4.65 vs 0.64 Mrays/s, scratch/r4_tdiag.py) while naive
    per-iteration windowing without the affinity sort measured 4x WORSE —
    sorting lanes by pending-subtree row BEFORE lockstep is the enabling
    structure, and that requires pending work as sortable per-lane VALUES,
    which is exactly what the top/treelet split produces."""
    # resolved at CALL time so FOVTPU_TROUNDS/_TK module overrides apply
    # (a def-time default froze the import-time values — measured A/Bs
    # silently ran identical configs)
    rounds = TREELET_ROUNDS if rounds is None else rounds
    k_near = TREELET_K if k_near is None else k_near
    assert bvh.top_rows > 0 and bvh.num_instances == 0
    assert k_near & (k_near - 1) == 0, "k_near must be a power of two"
    n = origin.shape[0]
    if active is None:
        active = jnp.ones((n,), dtype=bool)
    cb = codebits(bvh.num_rows)
    lowmask = jnp.uint32((1 << cb) - 1)

    t_cur = jnp.full((n,), jnp.inf, dtype=jnp.float32)
    u_cur = jnp.zeros((n,), dtype=jnp.float32)
    v_cur = jnp.zeros((n,), dtype=jnp.float32)
    tri_cur = jnp.full((n,), -1, dtype=jnp.int32)
    pops = jnp.zeros((n,), dtype=jnp.int32)
    steps = jnp.zeros((), dtype=jnp.int32)
    served_below = jnp.zeros((n,), dtype=jnp.uint32)
    # Lanes whose windowed round hit max_steps mid-treelet: the watermark
    # still advances past their unfinished subtrees, so they must join the
    # plain fallback re-trace (which starts from the root) or the miss is
    # silent.
    need_fb = jnp.zeros((n,), dtype=bool)
    idx0 = jnp.arange(n, dtype=jnp.int32)

    eff_chunk = chunk
    if eff_chunk is None or n <= eff_chunk:
        eff_chunk = max(((n + SUB * 128 - 1) // (SUB * 128)) * SUB * 128,
                        SUB * 128)

    live = active
    for r in range(rounds + 1):
        pt = _top_pass(
            bvh, origin, direction, tmin, tmax, live, t_cur, served_below,
            max_steps, eff_chunk, k_near,
        )
        better = live & (pt["tri_id"] >= 0) & (pt["t"] < t_cur)
        t_cur = jnp.where(better, pt["t"], t_cur)
        u_cur = jnp.where(better, pt["u"], u_cur)
        v_cur = jnp.where(better, pt["v"], v_cur)
        tri_cur = jnp.where(better, pt["tri_id"], tri_cur)
        pops = pops + jnp.where(live, pt["pops"], 0)
        steps = steps + pt["steps"]
        near = [
            jnp.where(live, pt["near"][:, k], _ESENT)
            for k in range(k_near)
        ]
        live = live & (near[0] != _ESENT)
        if r == rounds:
            break  # the final top pass only decides the fallback set

        # watermark: largest REAL entry being served this round
        hi = jnp.zeros((n,), jnp.uint32)
        for e in near:
            hi = jnp.maximum(hi, jnp.where(e != _ESENT, e, 0))
        served_below = jnp.where(
            live, jnp.maximum(served_below, hi), served_below
        )

        # windowed round: sort by the nearest entry's row, traverse the K
        # pending subtrees (stack-seeded near-to-far), unsort, merge
        row_key = jnp.where(
            live, ((near[0] & lowmask) >> 2).astype(jnp.int32),
            jnp.int32(0x7FFFFFFF),
        )
        s = lax.sort(
            [row_key, idx0,
             origin[:, 0], origin[:, 1], origin[:, 2],
             direction[:, 0], direction[:, 1], direction[:, 2],
             t_cur] + near,
            num_keys=2,
        )
        p = closest_hit(
            bvh,
            jnp.stack(s[2:5], axis=1),
            jnp.stack(s[5:8], axis=1),
            tmin, tmax,
            active=s[0] < jnp.int32(0x7FFFFFFF),
            max_steps=max_steps,
            chunk=eff_chunk,
            t_seed=s[8],
            entry0=jnp.stack(s[9:9 + k_near], axis=1),
            window=True,
            # exact bound: one treelet's walk + the other K-1 seeds parked
            # below it — the full-tree depth (157 at 1.9M) would make every
            # (D, 8, L) stack one-hot ~4x more expensive
            stack_cap=(
                bvh.treelet_stack + k_near if bvh.treelet_stack else None
            ),
        )
        tri_p = jnp.where(p["hit"], p["tri_id"], -1)
        fin = lax.sort(
            [s[1], tri_p, p["t"], p["u"], p["v"], p["pops"],
             p["pending"].astype(jnp.int32)],
            num_keys=1,
        )
        closer = fin[1] >= 0
        tri_cur = jnp.where(closer, fin[1], tri_cur)
        t_cur = jnp.where(closer, fin[2], t_cur)
        u_cur = jnp.where(closer, fin[3], u_cur)
        v_cur = jnp.where(closer, fin[4], v_cur)
        pops = pops + fin[5]
        need_fb = need_fb | (fin[6] > 0)
        steps = steps + p["steps"]

    # fallback sweep: finish stragglers with one plain direct-gather
    # re-trace, COMPACTED to a lane prefix first — scattered stragglers
    # make every chunk run its lockstep max (measured 1.1 s at 7% actives
    # vs 1.4 s for the FULL batch; two ~15 ms sorts collapse that to the
    # few chunks that actually hold work)
    fb_set = live | need_fb
    fkey = jnp.where(fb_set, 0, jnp.int32(1 << 30)) | idx0
    fs = lax.sort(
        [fkey,
         origin[:, 0], origin[:, 1], origin[:, 2],
         direction[:, 0], direction[:, 1], direction[:, 2],
         t_cur],
        num_keys=1,
    )
    pf = closest_hit(
        bvh,
        jnp.stack(fs[1:4], axis=1),
        jnp.stack(fs[4:7], axis=1),
        tmin, tmax,
        active=fs[0] < jnp.int32(1 << 30),
        max_steps=max_steps, chunk=eff_chunk,
        t_seed=fs[7],
    )
    ffin = lax.sort(
        [fs[0] & jnp.int32((1 << 30) - 1),
         jnp.where(pf["hit"], pf["tri_id"], -1),
         pf["t"], pf["u"], pf["v"], pf["pops"],
         pf["pending"].astype(jnp.int32)],
        num_keys=1,
    )
    closer = fb_set & (ffin[1] >= 0)
    tri_cur = jnp.where(closer, ffin[1], tri_cur)
    t_cur = jnp.where(closer, ffin[2], t_cur)
    u_cur = jnp.where(closer, ffin[3], u_cur)
    v_cur = jnp.where(closer, ffin[4], v_cur)
    pops = pops + jnp.where(fb_set, ffin[5], 0)
    steps = steps + pf["steps"]

    return {
        "t": t_cur,
        "u": u_cur,
        "v": v_cur,
        "tri_id": tri_cur,
        "hit": tri_cur >= 0,
        "pending": fb_set & (ffin[6] > 0),
        "pops": pops,
        "steps": steps,
    }



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
    return_pops: bool = False,
    entry0: jnp.ndarray | None = None,
    window: bool = False,
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

    def loop(chunks):
        # chunks: list over streams of (o_t, d_t, inv_t, sp_init[, e0]);
        # same stream interleaving as _closest_loop
        root_gt = [bvh.table[0, i] for i in range(4 * bvh.arity)]
        rays = [(ch[0], ch[1], ch[2]) for ch in chunks]

        def init_from_entries(sp_init, e0):
            # treelet round: seed the stack with up to K raw-code entries,
            # ASCENDING (code order == row order — lowest row pops first,
            # matching the min-base window sweep); 0xFFFFFFFF = empty
            sent = jnp.uint32(0xFFFFFFFF)
            d_iota0 = jnp.arange(depth, dtype=jnp.int32)[:, None, None]
            act0 = sp_init > 0
            ents = [e0[k] for k in range(e0.shape[0])]
            for i, j in _batcher_net(len(ents)):
                swap = ents[i] > ents[j]
                ei, ej = ents[i], ents[j]
                ents[i] = jnp.where(swap, ej, ei)
                ents[j] = jnp.where(swap, ei, ej)
            valid = [act0 & (e != sent) for e in ents]
            cnt0 = valid[0].astype(jnp.int32)
            for vk in valid[1:]:
                cnt0 = cnt0 + vk.astype(jnp.int32)
            stack0 = jnp.zeros((depth, SUB, l), dtype=jnp.uint32)
            for k, (e, vk) in enumerate(zip(ents, valid)):
                stack0 = jnp.where(
                    (d_iota0 == (cnt0 - 1 - k)[None]) & vk[None],
                    e[None], stack0,
                )
            return (
                stack0,
                cnt0,
                jnp.zeros((SUB, l), dtype=bool),  # occ
                jnp.zeros((SUB, l), dtype=jnp.int32),  # overflowed
                jnp.zeros((SUB, l), dtype=jnp.int32),  # pops
            )

        def init_one(o_t, inv_t, sp_init):
            # iteration 0 unrolled: root expand from a static table[0]
            # slice (see _ch_init — same trick, no tn packing needed here)
            tlim0 = jnp.full((SUB, l), tmax, dtype=jnp.float32)
            hits0, _tns0, codes0 = _expand(
                root_gt, sp_init > 0, o_t, inv_t, tmin, tlim0, bvh.arity
            )
            keys0 = _sort_desc([
                jnp.where(h, c, jnp.uint32(0))
                for h, c in zip(hits0, codes0)
            ])
            cnt0 = hits0[0].astype(jnp.int32)
            for h in hits0[1:]:
                cnt0 = cnt0 + h.astype(jnp.int32)
            d_iota0 = jnp.arange(depth, dtype=jnp.int32)[:, None, None]
            eac0 = keys0[0][None]
            for j in range(1, len(keys0)):
                eac0 = jnp.where(d_iota0 == j, keys0[j][None], eac0)
            return (
                jnp.where(d_iota0 < cnt0[None], eac0, jnp.uint32(0)),
                jnp.minimum(cnt0, depth),
                jnp.zeros((SUB, l), dtype=bool),  # occ
                (cnt0 > depth).astype(jnp.int32)
                * (depth < bvh.stack_depth),  # overflowed
                (sp_init > 0).astype(jnp.int32),  # useful pops (root = 1)
            )

        states = []
        for ch in chunks:
            o_t, d_t, inv_t, sp_init = ch[:4]
            if len(ch) > 4:
                st = init_from_entries(sp_init, ch[4])
            else:
                st = init_one(o_t, inv_t, sp_init)
            if instanced:
                st = st + (tuple(o_t), tuple(d_t), tuple(inv_t))
            states.append(st)
        state = (jnp.ones((), dtype=jnp.int32), tuple(states))

        def cond(s):
            work = s[1][0][1] > 0
            for st in s[1][1:]:
                work = work | (st[1] > 0)
            return jnp.any(work) & (s[0] < step_limit)

        def step_one(rays_k, s5):
            o_t, d_t, inv_t = rays_k
            stack, sp, occ, overflow, pops = s5[:5]
            if instanced:
                op, dp, ip = (list(x) for x in s5[5:])
            sp = jnp.where(occ, 0, sp)  # occluded rays drop remaining work
            entry, sp, has = _pop(stack, sp)
            pops = pops + has.astype(jnp.int32)
            kind = entry & 3
            row = (entry >> 2).astype(jnp.int32)
            is_node = has & (kind == KIND_NODE)
            is_leaf = has & (kind == KIND_LEAF)
            defer = None
            if instanced:
                is_inst = has & (kind == KIND_INST)
                gt = _gather_row(bvh.table, row, bvh, is_inst)
                node_world = is_node & (row < bvh.blas_base)
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
            elif _use_window(bvh) and window:
                # OPT-IN windowed gather: only the treelet rounds sort
                # lanes into window-affine order first (occluded_treelet)
                gt, in_win = _window_gather(bvh.table, row, has)
                defer = has & ~in_win
                is_leaf = is_leaf & in_win
                is_node = is_node & in_win
                pops = pops - defer.astype(jnp.int32)
                o_use, inv_use = o_t, inv_t
                o_leaf, d_leaf = o_t, d_t
            else:
                gt = _gather_row(bvh.table, row)
                o_use, inv_use = o_t, inv_t
                o_leaf, d_leaf = o_t, d_t

            tlim = jnp.full_like(sp, tmax, dtype=jnp.float32)
            hits, _tns, codes = _expand(
                gt, is_node, o_use, inv_use, tmin, tlim, bvh.arity
            )
            # any real ucode > 0, so hit codes sort ahead of empties on
            # their own — the occlusion push needs no ordering beyond that
            entries_c = _sort_desc(
                [jnp.where(h, c, jnp.uint32(0)) for h, c in zip(hits, codes)]
            )
            cnt = hits[0].astype(jnp.int32)
            for h in hits[1:]:
                cnt = cnt + h.astype(jnp.int32)
            if instanced:
                root_code = lax.bitcast_convert_type(gt[0], jnp.uint32)
                entries_c[0] = jnp.where(is_inst, root_code, entries_c[0])
                cnt = jnp.where(is_inst, 1, cnt)
            elif defer is not None:
                # deferred out-of-window pop: re-push untouched, wait for
                # the window sweep to reach its band
                entries_c[0] = jnp.where(defer, entry, entries_c[0])
                cnt = jnp.where(defer, 1, cnt)
            if depth < bvh.stack_depth:
                overflow = overflow | (sp + cnt > depth).astype(jnp.int32)
            stack, sp = _push(stack, sp, entries_c, cnt)

            leaf_out = _leaf_hits(
                gt, is_leaf, o_leaf, d_leaf, tmin, tmax, cull_backface,
                bvh.leaf_size
            )
            for hit_k, _t, _u, _v in leaf_out:
                occ = occ | hit_k
            out = (stack, sp, occ, overflow, pops)
            if instanced:
                out = out + (tuple(op), tuple(dp), tuple(ip))
            return out

        def body(s):
            steps, sts = s
            new = tuple(
                step_one(rays[k], sts[k]) for k in range(len(sts))
            )
            return (steps + 1, new)

        _steps, outs = lax.while_loop(cond, body, state)
        res = []
        for st in outs:
            occ_i = st[2].astype(jnp.int32)
            # pending: NOT occluded but work remained (overflow or iter cap)
            pend_i = (
                ~st[2] & ((st[1] > 0) | (st[3] > 0))
            ).astype(jnp.int32)
            res.append((occ_i, pend_i, st[4]))
        return res

    kk = max(1, min(DEFAULT_STREAMS, c))
    cpad = (-c) % kk
    xs = (
        jnp.stack(o_r, axis=1),
        jnp.stack(d_r, axis=1),
        jnp.stack(inv_r, axis=1),
        sp0,
    )
    if entry0 is not None:
        if entry0.ndim == 1:
            entry0 = entry0[:, None]
        ek = entry0.shape[1]
        e_pad = jnp.pad(
            entry0, ((0, c * chunk - n0), (0, 0)),
            constant_values=jnp.uint32(0xFFFFFFFF),
        )
        xs = xs + (
            jnp.moveaxis(e_pad.reshape(c, SUB, l, ek), 3, 1),
        )
    if cpad:  # pad to a stream multiple with inactive chunks (sp0 = 0)
        xs = tuple(
            jnp.concatenate(
                [x, jnp.zeros((cpad,) + x.shape[1:], x.dtype)], axis=0
            )
            for x in xs
        )
    c2 = (c + cpad) // kk
    xs = tuple(x.reshape((c2, kk) + x.shape[1:]) for x in xs)

    def step(args):
        o_i, d_i, inv_i, sp_i = args[:4]
        e_i = args[4] if len(args) > 4 else None
        res = loop([
            ([o_i[k, a] for a in range(3)], [d_i[k, a] for a in range(3)],
             [inv_i[k, a] for a in range(3)], sp_i[k])
            + (() if e_i is None else (e_i[k],))
            for k in range(kk)
        ])
        return (
            jnp.stack([r[0] for r in res], axis=0),
            jnp.stack([r[1] for r in res], axis=0),
            jnp.stack([r[2] for r in res], axis=0),
        )

    if c2 == 1:
        occ, pend, pops = step(tuple(x[0] for x in xs))
    elif DYN_TRIP:
        zi = jnp.zeros((c2, kk, SUB, l), jnp.int32)
        occ, pend, pops = _chunk_map(
            step, xs, (zi, zi, zi), _dyn_trip_count(xs[3].reshape(c2, -1, l))
        )
    else:
        occ, pend, pops = jax.lax.map(step, xs)
    occ_out = occ.reshape(-1)[:n0] > 0
    if return_pops:
        return occ_out, pops.reshape(-1)[:n0]
    if return_pending:
        return occ_out, pend.reshape(-1)[:n0] > 0
    return occ_out


def _occ_top_loop(bvh, top_tab, rays, sp0, served_below, tmin, tmax,
                  cull_backface, max_steps, depth, k_near):
    """Occlusion twin of _top_loop: any-hit walk of the VMEM-resident top
    slice, diverting treelet child codes (raw ucodes — the occlusion stack
    carries no tn) into a per-lane K-minimum register file above the
    served-watermark. Code order == row order, so 'K smallest codes' are
    also the most window-affine to serve together."""
    o_r, d_r, inv_r = rays
    top_limit = top_tab.shape[0]
    l = sp0.shape[-1]
    st = (
        jnp.zeros((depth, SUB, l), dtype=jnp.uint32),  # root code 0 on top
        (sp0 > 0).astype(jnp.int32),
        jnp.zeros((SUB, l), dtype=bool),  # occ
        jnp.zeros((SUB, l), dtype=jnp.int32),  # pops
    ) + tuple(jnp.full((SUB, l), _ESENT) for _ in range(k_near))
    state = (jnp.zeros((), dtype=jnp.int32), st)

    def cond(s):
        return jnp.any(s[1][1] > 0) & (s[0] < max_steps)

    def body(s):
        steps, st = s
        stack, sp, occ, pops = st[:4]
        near = list(st[4:])
        sp = jnp.where(occ, 0, sp)
        entry, sp, has = _pop(stack, sp)
        pops = pops + has.astype(jnp.int32)
        kind = entry & 3
        row = (entry >> 2).astype(jnp.int32)
        is_node = has & (kind == KIND_NODE)
        is_leaf = has & (kind == KIND_LEAF)

        gt = _gather_row(top_tab, jnp.clip(row, 0, top_limit - 1))
        tlim = jnp.full((SUB, l), tmax, dtype=jnp.float32)
        hits, _tns, codes = _expand(
            gt, is_node, o_r, inv_r, tmin, tlim, bvh.arity
        )
        push_keys, tl_keys = [], []
        for h, c in zip(hits, codes):
            is_tl = h & ((c >> 2) >= jnp.uint32(top_limit))
            push_keys.append(jnp.where(h & ~is_tl, c, jnp.uint32(0)))
            tl_keys.append(jnp.where(
                is_tl & (c > served_below), c, _ESENT
            ))
        entries_c = _sort_desc(push_keys)
        cnt = (push_keys[0] != 0).astype(jnp.int32)
        for pk in push_keys[1:]:
            cnt = cnt + (pk != 0).astype(jnp.int32)
        stack, sp = _push(stack, sp, entries_c, cnt)
        tl_sorted = _sort_desc(tl_keys)[::-1][:k_near]
        near = _merge_sorted_asc(near, tl_sorted, k_near)

        leaf_out = _leaf_hits(
            gt, is_leaf, o_r, d_r, tmin, tmax, cull_backface,
            bvh.leaf_size
        )
        for hit_k, _t, _u, _v in leaf_out:
            occ = occ | hit_k
        return (steps + 1, (stack, sp, occ, pops) + tuple(near))

    steps, st = lax.while_loop(cond, body, state)
    return st, steps


def _occ_top_pass(bvh, origin, direction, tmin, tmax, active, served_below,
                  cull_backface, max_steps, chunk, k_near):
    """One chunked occlusion top pass. Returns dict(occ, near (N, k_near)
    ascending, pops, steps)."""
    n0 = origin.shape[0]
    o_r, d_r, inv_r, sp0, _t0, c, l, n0 = _batch_tiles(
        origin, direction, active, chunk
    )
    sb_t = jnp.pad(served_below, (0, c * chunk - n0)).reshape(c, SUB, l)
    depth = max(bvh.top_stack, 4)
    top_tab = bvh.top_table
    xs = (
        jnp.stack(o_r, axis=1),
        jnp.stack(d_r, axis=1),
        jnp.stack(inv_r, axis=1),
        sp0,
        sb_t,
    )

    def step(args):
        o_i, d_i, inv_i, sp_i, sb_i = args
        st, steps = _occ_top_loop(
            bvh, top_tab,
            ([o_i[a] for a in range(3)], [d_i[a] for a in range(3)],
             [inv_i[a] for a in range(3)]),
            sp_i, sb_i, tmin, tmax, cull_backface, max_steps, depth,
            k_near,
        )
        (stack, sp, occ, pops) = st[:4]
        near = jnp.stack(st[4:], axis=0)
        return occ.astype(jnp.int32), near, pops, steps

    if c == 1:
        occ, near, pops, steps = step(tuple(x[0] for x in xs))
        occ, near, pops = occ[None], near[None], pops[None]
        steps_total = steps
    elif DYN_TRIP:
        zi = jnp.zeros((c, SUB, l), jnp.int32)
        init = (
            zi,
            jnp.full((c, k_near, SUB, l), _ESENT, jnp.uint32),
            zi,
            jnp.zeros((c,), jnp.int32),
        )
        occ, near, pops, steps = _chunk_map(
            step, xs, init, _dyn_trip_count(sp0)
        )
        steps_total = jnp.sum(steps)
    else:
        occ, near, pops, steps = jax.lax.map(step, xs)
        steps_total = jnp.sum(steps)

    return {
        "occ": occ.reshape(-1)[:n0] > 0,
        "near": jnp.moveaxis(near, 1, 3).reshape(-1, k_near)[:n0],
        "pops": pops.reshape(-1)[:n0],
        "steps": steps_total,
    }


def occluded_treelet(
    bvh: WideBVH,
    origin, direction, tmin, tmax,
    active=None,
    max_steps: int = 100_000,
    chunk: int | None = DEFAULT_CHUNK,
    cull_backface: bool = True,
    rounds: int | None = None,
    k_near: int | None = None,
):
    """Deep-scene any-hit occlusion over a treelet-laid table — the
    occlusion twin of closest_hit_treelet (same top/round/watermark
    structure; occluded lanes simply drop out of later phases). Returns
    (N,) bool, exactly equal to occluded()."""
    # resolved at CALL time so FOVTPU_TROUNDS/_TK module overrides apply
    # (a def-time default froze the import-time values — measured A/Bs
    # silently ran identical configs)
    rounds = TREELET_ROUNDS if rounds is None else rounds
    k_near = TREELET_K if k_near is None else k_near
    assert bvh.top_rows > 0 and bvh.num_instances == 0
    assert k_near & (k_near - 1) == 0, "k_near must be a power of two"
    n = origin.shape[0]
    if active is None:
        active = jnp.ones((n,), dtype=bool)
    cb = codebits(bvh.num_rows)
    lowmask = jnp.uint32((1 << cb) - 1)

    occ = jnp.zeros((n,), dtype=bool)
    served_below = jnp.zeros((n,), dtype=jnp.uint32)
    # see closest_hit_treelet: round lanes cut off at max_steps must join
    # the plain fallback re-trace (the watermark already skipped their
    # unfinished subtrees)
    need_fb = jnp.zeros((n,), dtype=bool)
    idx0 = jnp.arange(n, dtype=jnp.int32)
    eff_chunk = chunk
    if eff_chunk is None or n <= eff_chunk:
        eff_chunk = max(((n + SUB * 128 - 1) // (SUB * 128)) * SUB * 128,
                        SUB * 128)

    live = active
    for r in range(rounds + 1):
        pt = _occ_top_pass(
            bvh, origin, direction, tmin, tmax, live, served_below,
            cull_backface, max_steps, eff_chunk, k_near,
        )
        occ = occ | (live & pt["occ"])
        near = [
            jnp.where(live & ~occ, pt["near"][:, k], _ESENT)
            for k in range(k_near)
        ]
        live = live & ~occ & (near[0] != _ESENT)
        if r == rounds:
            break

        hi = jnp.zeros((n,), jnp.uint32)
        for e in near:
            hi = jnp.maximum(hi, jnp.where(e != _ESENT, e, 0))
        served_below = jnp.where(
            live, jnp.maximum(served_below, hi), served_below
        )

        row_key = jnp.where(
            live, ((near[0] & lowmask) >> 2).astype(jnp.int32),
            jnp.int32(0x7FFFFFFF),
        )
        s = lax.sort(
            [row_key, idx0,
             origin[:, 0], origin[:, 1], origin[:, 2],
             direction[:, 0], direction[:, 1], direction[:, 2]] + near,
            num_keys=2,
        )
        occ_r, pend_r = occluded(
            bvh,
            jnp.stack(s[2:5], axis=1),
            jnp.stack(s[5:8], axis=1),
            tmin, tmax,
            active=s[0] < jnp.int32(0x7FFFFFFF),
            max_steps=max_steps,
            chunk=eff_chunk,
            cull_backface=cull_backface,
            entry0=jnp.stack(s[8:8 + k_near], axis=1),
            window=True,
            stack_cap=(
                bvh.treelet_stack + k_near if bvh.treelet_stack else None
            ),
            return_pending=True,
        )
        fin = lax.sort(
            [s[1], occ_r.astype(jnp.int32), pend_r.astype(jnp.int32)],
            num_keys=1,
        )
        occ = occ | (live & (fin[1] > 0))
        need_fb = need_fb | (live & ~occ & (fin[2] > 0))
        live = live & ~occ

    # compacted plain fallback for the rare still-pending lanes
    live = live | (need_fb & ~occ)
    fkey = jnp.where(live, 0, jnp.int32(1 << 30)) | idx0
    fs = lax.sort(
        [fkey,
         origin[:, 0], origin[:, 1], origin[:, 2],
         direction[:, 0], direction[:, 1], direction[:, 2]],
        num_keys=1,
    )
    occ_f = occluded(
        bvh,
        jnp.stack(fs[1:4], axis=1),
        jnp.stack(fs[4:7], axis=1),
        tmin, tmax,
        active=fs[0] < jnp.int32(1 << 30),
        max_steps=max_steps, chunk=eff_chunk,
        cull_backface=cull_backface,
    )
    ffin = lax.sort(
        [fs[0] & jnp.int32((1 << 30) - 1), occ_f.astype(jnp.int32)],
        num_keys=1,
    )
    return occ | (live & (ffin[1] > 0))
