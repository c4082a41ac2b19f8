"""Per-ray 8-wide BVH traversal, TPU-layout-native.

The fast traversal path (data structure: ops/bvh8.py). Three hard-won TPU
rules shape this module (all measured on a v5e, see git history):

1. EVERY array in the while_loop carry and body is 2-D with the ray batch N
   as the MINOR (lane) dimension: per-ray scalars are (1, N) rows, the stack
   is one (D, N) matrix. Mixed (N,)-vector / 2-D-row state makes XLA insert
   per-row layout conversions lowered as reduces (~2ms per row per
   iteration); all-2-D state keeps everything in native (8,128) tiling.

2. Tables (nodes/leaves) are jit ARGUMENTS — closure-captured tables become
   XLA constants whose gathers scalarize (measured 300x slower).

3. One gather per step: node rows pack child boxes + bitcast meta into 64
   floats; leaf rows pack leaf_size padded triangles (9 floats each). Row
   gathers of contiguous floats run near HBM bandwidth.

One while_loop iteration pops one entry per ray (one-hot sum over the (D, N)
stack), and either expands an internal node (8 unrolled slab tests + push of
hit children, near-to-far via a Batcher sorting network on (1, N) rows) or
intersects its leaf row (unrolled Möller-Trumbore). Iterations ≈ max
per-ray pops.

``occluded`` implements the reference's occlusion ray semantics: back-face
culling + first-hit termination (deviceProgram.cu:224-248).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from fovpathtracing_optixcodelatest_tpu.ops.bvh8 import WIDTH, WideBVH

# Default ray-chunk length: each chunk runs its own while_loop under lax.map,
# so a chunk of early-finishing rays stops at ITS max pop count instead of the
# global batch max — the cheap tail-latency fix for lockstep traversal.
# 16k measured best on v5e (smaller chunks tighten the tail further but lose
# gather bandwidth).
DEFAULT_CHUNK = 1 << 14

# Batcher odd-even merge network for 8 elements (19 comparators).
_SORT_NET = (
    (0, 1), (2, 3), (4, 5), (6, 7),
    (0, 2), (1, 3), (4, 6), (5, 7),
    (1, 2), (5, 6),
    (0, 4), (1, 5), (2, 6), (3, 7),
    (2, 4), (3, 5),
    (1, 2), (3, 4), (5, 6),
)


def _rows(x):
    """(N, C) -> list of C (1, N) rows (one transpose, then free slices)."""
    xt = x.T
    return [xt[i : i + 1] for i in range(xt.shape[0])]


def _sort8_desc(keys, vals):
    k = list(keys)
    v = list(vals)
    for i, j in _SORT_NET:
        swap = k[i] < k[j]
        ki = jnp.where(swap, k[j], k[i])
        kj = jnp.where(swap, k[i], k[j])
        vi = jnp.where(swap, v[j], v[i])
        vj = jnp.where(swap, v[i], v[j])
        k[i], k[j], v[i], v[j] = ki, kj, vi, vj
    return k, v


def _gather_row(table, entry, is_leaf):
    """ONE unified row gather per step: node rows and leaf rows live in the
    same (U, W) table, so entry type never costs a second gather.

    The index stays 2-D (1, N): gathering with the (1,N) row directly is
    ~12x faster than reshaping to (N,) first — that reshape is the
    T(8,128)→T(1024) relayout pathology."""
    row = jnp.where(is_leaf, -entry - 1, jnp.maximum(entry, 0))  # (1, N)
    g = jnp.take(table, row, axis=0)  # (1, N, W)
    n = row.shape[1]
    return g.reshape(n, table.shape[1]).T  # (W, N)


def _expand(gt, is_node, o_r, inv_r, tmin, tlimit):
    """Slab-test the 8 children encoded in a gathered node row (cols 0..63).

    Returns (hits, t_nears, entries): lists of 8 (1, N) arrays. Leaf children
    get entries encoded as -(row + 1).
    """
    hits, tns, entries = [], [], []
    for c in range(WIDTH):
        tn = jnp.full_like(tlimit, -jnp.inf)
        tf = jnp.full_like(tlimit, jnp.inf)
        for a in range(3):
            lo = gt[c * 6 + a : c * 6 + a + 1]
            hi = gt[c * 6 + 3 + a : c * 6 + 3 + a + 1]
            t0 = (lo - o_r[a]) * inv_r[a]
            t1 = (hi - o_r[a]) * inv_r[a]
            tn = jnp.maximum(tn, jnp.minimum(t0, t1))
            tf = jnp.minimum(tf, jnp.maximum(t0, t1))
        meta = lax.bitcast_convert_type(
            gt[48 + c * 2 : 48 + c * 2 + 2], jnp.int32
        )
        a_val = meta[0:1]
        kind = meta[1:2]
        hit = (
            (tn <= tf) & (tf >= tmin) & (tn <= tlimit) & (kind >= 0) & is_node
        )
        child_entry = jnp.where(kind > 0, -(a_val + 1), a_val)
        hits.append(hit)
        tns.append(tn)
        entries.append(child_entry)
    return hits, tns, entries


def _leaf_hits(gt, is_leaf, o_r, d_r, tmin, tmax, cull_backface, leaf_size):
    """leaf_size unrolled Möller-Trumbore tests against a gathered leaf row.
    Returns list of tuples (hit, t, u, v) of (1, N) arrays."""
    out = []
    for k in range(leaf_size):
        b = k * 9
        v0 = (gt[b + 0 : b + 1], gt[b + 1 : b + 2], gt[b + 2 : b + 3])
        e1 = (gt[b + 3 : b + 4], gt[b + 4 : b + 5], gt[b + 5 : b + 6])
        e2 = (gt[b + 6 : b + 7], gt[b + 7 : b + 8], gt[b + 8 : b + 9])
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


def _ray_rows(origin, direction):
    o_r = _rows(origin)
    d_r = _rows(direction)
    inv_r = [
        1.0 / jnp.where(jnp.abs(c) < 1e-12, jnp.where(c < 0, -1e-12, 1e-12), c)
        for c in d_r
    ]
    return o_r, d_r, inv_r


def _pop(stack, sp):
    """stack (D, N), sp (1, N) → (entry (1, N), new sp). sp==0 pops junk that
    callers mask via has."""
    d_iota = jnp.arange(stack.shape[0], dtype=jnp.int32)[:, None]
    has = sp > 0
    spc = jnp.where(has, sp - 1, 0)
    entry = jnp.sum(jnp.where(d_iota == spc, stack, 0), axis=0, keepdims=True)
    return entry, spc, has


def _push(stack, sp, entries_c, cnt):
    """Write entries_c[0..cnt-1] to rows sp..sp+cnt-1 in one broadcast
    column assignment; overflow drops."""
    d_iota = jnp.arange(stack.shape[0], dtype=jnp.int32)[:, None]
    kk = d_iota - sp  # (D, N)
    valid = (kk >= 0) & (kk < cnt)
    eac = entries_c[0]
    for j in range(1, WIDTH):
        eac = jnp.where(kk == j, entries_c[j], eac)
    stack = jnp.where(valid, eac, stack)
    sp = jnp.minimum(sp + cnt, stack.shape[0])
    return stack, sp


def _chunked(impl, out_keys, bvh, origin, direction, active, chunk):
    """Run ``impl`` over row chunks with lax.map (see DEFAULT_CHUNK)."""
    n = origin.shape[0]
    pad = (-n) % chunk
    if pad:
        origin = jnp.pad(origin, ((0, pad), (0, 0)))
        direction = jnp.pad(direction, ((0, pad), (0, 0)), constant_values=1.0)
        active = jnp.pad(active, (0, pad))
    c = (n + pad) // chunk
    o_c = origin.reshape(c, chunk, 3)
    d_c = direction.reshape(c, chunk, 3)
    a_c = active.reshape(c, chunk)
    outs = jax.lax.map(lambda args: impl(bvh, *args), (o_c, d_c, a_c))
    flat = {k: v.reshape(-1)[:n] for k, v in outs.items() if k != "steps"}
    if "steps" in outs:
        flat["steps"] = jnp.sum(outs["steps"])
    return flat


def closest_hit(
    bvh: WideBVH,
    origin: jnp.ndarray,
    direction: jnp.ndarray,
    tmin: float,
    tmax: float,
    active=None,
    max_steps: int = 100_000,
    chunk: int | None = DEFAULT_CHUNK,
):
    """Closest-hit query. Returns dict(t, tri_id, u, v, hit, steps) of (N,)
    arrays — same contract as traverse.closest_hit."""
    n = origin.shape[0]
    if active is None:
        active = jnp.ones((n,), dtype=bool)
    if chunk is not None and n > chunk:
        return _chunked(
            lambda b, o, d, a: closest_hit(
                b, o, d, tmin, tmax, active=a, max_steps=max_steps, chunk=None
            ),
            ("t", "tri_id", "u", "v", "hit"),
            bvh, origin, direction, active, chunk,
        )
    o_r, d_r, inv_r = _ray_rows(origin, direction)

    state = (
        jnp.zeros((bvh.stack_depth, n), dtype=jnp.int32),  # stack
        active.reshape(1, n).astype(jnp.int32),  # sp (root pre-pushed)
        jnp.full((1, n), jnp.inf, dtype=jnp.float32),  # t
        jnp.zeros((1, n), dtype=jnp.float32),  # u
        jnp.zeros((1, n), dtype=jnp.float32),  # v
        jnp.full((1, n), -1, dtype=jnp.int32),  # best (leaf*8 + k)
        jnp.zeros((), dtype=jnp.int32),  # steps
    )

    def cond(s):
        return jnp.any(s[1] > 0) & (s[6] < max_steps)

    def body(s):
        stack, sp, t, u, v, best, steps = s
        entry, sp, has = _pop(stack, sp)
        is_node = has & (entry >= 0)
        is_leaf = has & (entry < 0)
        gt = _gather_row(bvh.table, entry, is_leaf)

        tlimit = jnp.minimum(t, tmax)
        hits, tns, entries = _expand(gt, is_node, o_r, inv_r, tmin, tlimit)
        keys = [jnp.where(h, tn, -jnp.inf) for h, tn in zip(hits, tns)]
        _, entries_c = _sort8_desc(keys, entries)  # far→near, misses last
        cnt = hits[0].astype(jnp.int32)
        for h in hits[1:]:
            cnt = cnt + h.astype(jnp.int32)
        stack, sp = _push(stack, sp, entries_c, cnt)

        leaf = jnp.where(is_leaf, -entry - 1, 0)
        leaf_out = _leaf_hits(
            gt, is_leaf, o_r, d_r, tmin, tmax, False, bvh.leaf_size
        )
        for k, (hit_k, t_k, u_k, v_k) in enumerate(leaf_out):
            better = hit_k & (t_k < t)
            t = jnp.where(better, t_k, t)
            u = jnp.where(better, u_k, u)
            v = jnp.where(better, v_k, v)
            best = jnp.where(better, leaf * bvh.leaf_size + k, best)
        return (stack, sp, t, u, v, best, steps + 1)

    out = lax.while_loop(cond, body, state)
    best = out[5].reshape(-1)
    perm_flat = bvh.leaf_perm.reshape(-1)
    tri_id = jnp.where(
        best >= 0, jnp.take(perm_flat, jnp.maximum(best, 0)), -1
    )
    return {
        "t": out[2].reshape(-1),
        "tri_id": tri_id,
        "u": out[3].reshape(-1),
        "v": out[4].reshape(-1),
        "hit": best >= 0,
        "steps": out[6],
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
):
    """Any-hit occlusion with first-hit termination. Back-face culling
    defaults on (the PT_sv5_ occlusion ray flag, deviceProgram.cu:237); the
    04-sample shadow ray disables it. Returns (N,) bool."""
    n = origin.shape[0]
    if active is None:
        active = jnp.ones((n,), dtype=bool)
    if chunk is not None and n > chunk:
        return _chunked(
            lambda b, o, d, a: {
                "occ": occluded(
                    b, o, d, tmin, tmax, active=a, max_steps=max_steps,
                    chunk=None, cull_backface=cull_backface,
                )
            },
            ("occ",),
            bvh, origin, direction, active, chunk,
        )["occ"]
    o_r, d_r, inv_r = _ray_rows(origin, direction)

    state = (
        jnp.zeros((bvh.stack_depth, n), dtype=jnp.int32),
        active.reshape(1, n).astype(jnp.int32),
        jnp.zeros((1, n), dtype=bool),  # occ
        jnp.zeros((), dtype=jnp.int32),
    )

    def cond(s):
        return jnp.any(s[1] > 0) & (s[3] < max_steps)

    def body(s):
        stack, sp, occ, steps = s
        sp = jnp.where(occ, 0, sp)  # occluded rays drop remaining work
        entry, sp, has = _pop(stack, sp)
        is_node = has & (entry >= 0)
        is_leaf = has & (entry < 0)
        gt = _gather_row(bvh.table, entry, is_leaf)

        tlim = jnp.full_like(occ, tmax, dtype=jnp.float32)
        hits, _tns, entries = _expand(gt, is_node, o_r, inv_r, tmin, tlim)
        keys = [h.astype(jnp.float32) for h in hits]  # compact hits first
        _, entries_c = _sort8_desc(keys, entries)
        cnt = hits[0].astype(jnp.int32)
        for h in hits[1:]:
            cnt = cnt + h.astype(jnp.int32)
        stack, sp = _push(stack, sp, entries_c, cnt)

        leaf_out = _leaf_hits(
            gt, is_leaf, o_r, d_r, tmin, tmax, cull_backface, bvh.leaf_size
        )
        for hit_k, _t, _u, _v in leaf_out:
            occ = occ | hit_k
        return (stack, sp, occ, steps + 1)

    out = lax.while_loop(cond, body, state)
    return out[2].reshape(-1)
