"""Packet BVH traversal: the TPU-fast replacement for per-ray traversal.

Per-ray threaded traversal (ops/traverse.py) is correct but gather-bound on
TPU: every step gathers ~50 floats *per ray* and XLA scalarizes gathers. This
module restructures the walk around *packets* of R consecutive rays that share
ONE node pointer:

- one node-data gather per packet per step (a few floats), not per ray;
- all per-ray math is dense (K, R) VPU work — slab tests, Möller-Trumbore;
- the packet descends if ANY of its rays hits the node AABB, so every ray
  still visits every node it needs (correctness is per-ray; sharing only adds
  conservative extra tests);
- two-phase stepping à la Aila-Laine: an inner while_loop advances packets
  through internal nodes with slab tests only (~20 flops/ray/step), and leaf
  triangle batches run in the outer loop (~60·L flops/ray) only when packets
  sit on leaves.

Ray coherence sets the efficiency: consecutive rays of a pass are samples of
neighboring pixels (pixel-major layout), so primary packets are tight;
direction-octant links are chosen per packet by majority vote. The same
octant-threaded BVH (ops/bvh.py) is used — packets are a scheduling change,
not a data-structure change.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fovpathtracing_optixcodelatest_tpu.ops.bvh import BVH, LEAF_SIZE
from fovpathtracing_optixcodelatest_tpu.ops.intersect import ray_triangle

DEFAULT_PACKET = 256


def _pad_packets(x, r, fill):
    n = x.shape[0]
    pad = (-n) % r
    if pad:
        pad_width = ((0, pad),) + ((0, 0),) * (x.ndim - 1)
        x = jnp.pad(x, pad_width, constant_values=fill)
    return x, n + pad


def _packet_octant(direction_kr3):
    """Majority direction octant per packet from the mean direction."""
    mean = jnp.sum(direction_kr3, axis=1)  # (K, 3)
    return (
        (mean[:, 0] < 0).astype(jnp.int32)
        + 2 * (mean[:, 1] < 0).astype(jnp.int32)
        + 4 * (mean[:, 2] < 0).astype(jnp.int32)
    )


def _slab_any(lo, hi, origin, inv_d, tmin, tlimit, lane_ok):
    """(K,3) node AABBs vs (K,R,3) rays → per-ray hit and packet any-hit."""
    t0 = (lo[:, None, :] - origin) * inv_d
    t1 = (hi[:, None, :] - origin) * inv_d
    tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
    hit = (tn <= tf) & (tf >= tmin) & (tn <= tlimit) & lane_ok
    return jnp.any(hit, axis=1)


def _gather_node(bvh: BVH, oct_base, node, m):
    nc = jnp.minimum(node, m - 1)
    lo = jnp.take(bvh.aabb_lo, nc, axis=0)
    hi = jnp.take(bvh.aabb_hi, nc, axis=0)
    count = jnp.take(bvh.tri_count, nc, axis=0)
    offset = jnp.take(bvh.tri_offset, nc, axis=0)
    hitl = jnp.take(bvh.hit_link.reshape(-1), oct_base + nc, axis=0)
    missl = jnp.take(bvh.miss_link.reshape(-1), oct_base + nc, axis=0)
    return lo, hi, count, offset, hitl, missl


def closest_hit(
    bvh: BVH,
    origin: jnp.ndarray,
    direction: jnp.ndarray,
    tmin: float,
    tmax: float,
    active=None,
    packet_size: int = DEFAULT_PACKET,
    leaf_cap: int = None,
):
    """Packet closest-hit. Same contract as traverse.closest_hit (exact same
    hits — packets only change scheduling)."""
    n0 = origin.shape[0]
    r = packet_size
    if active is None:
        active = jnp.ones((n0,), dtype=bool)
    origin, n = _pad_packets(origin, r, 0.0)
    direction, _ = _pad_packets(direction, r, 1.0)
    active, _ = _pad_packets(active, r, False)
    k = n // r
    m = bvh.num_nodes
    leaf_len = bvh.tri_v0.shape[0]
    lcap = int(leaf_cap) if leaf_cap else LEAF_SIZE

    o = origin.reshape(k, r, 3)
    d = direction.reshape(k, r, 3)
    lane_ok = active.reshape(k, r)
    safe_d = jnp.where(jnp.abs(d) < 1e-12, jnp.where(d < 0, -1e-12, 1e-12), d)
    inv_d = 1.0 / safe_d
    oct_base = _packet_octant(d) * m
    start = jnp.where(jnp.any(lane_ok, axis=1), 0, m).astype(jnp.int32)

    state = dict(
        node=start,
        t=jnp.full((k, r), jnp.inf, dtype=jnp.float32),
        u=jnp.zeros((k, r), dtype=jnp.float32),
        v=jnp.zeros((k, r), dtype=jnp.float32),
        slot=jnp.full((k, r), -1, dtype=jnp.int32),
        steps=jnp.zeros((), dtype=jnp.int32),
    )

    def outer_cond(s):
        return jnp.any(s["node"] < m)

    def inner_cond(s):
        # keep stepping while some packet sits on an internal node
        count = jnp.take(bvh.tri_count, jnp.minimum(s["node"], m - 1), axis=0)
        return jnp.any((s["node"] < m) & (count == 0))

    def inner_body(s):
        node = s["node"]
        act = node < m
        lo, hi, count, offset, hitl, missl = _gather_node(bvh, oct_base, node, m)
        is_internal = act & (count == 0)
        tlimit = jnp.minimum(s["t"], tmax)
        any_hit = _slab_any(lo, hi, o, inv_d, tmin, tlimit, lane_ok)
        nxt = jnp.where(any_hit, hitl, missl)
        node = jnp.where(is_internal, nxt, node)
        return dict(s, node=node, steps=s["steps"] + 1)

    def outer_body(s):
        s = jax.lax.while_loop(inner_cond, inner_body, s)
        # every live packet now sits on a leaf (or END)
        node = s["node"]
        act = node < m
        lo, hi, count, offset, hitl, missl = _gather_node(bvh, oct_base, node, m)
        is_leaf = act & (count > 0)
        # batched leaf triangles: (K, L) slots → (K, L, 3) gathers
        ks = jnp.arange(lcap, dtype=jnp.int32)
        slots = offset[:, None] + ks[None, :]
        in_leaf = (ks[None, :] < count[:, None]) & is_leaf[:, None]
        slots_c = jnp.minimum(jnp.maximum(slots, 0), leaf_len - 1)
        v0 = jnp.take(bvh.tri_v0, slots_c, axis=0)  # (K, L, 3)
        e1 = jnp.take(bvh.tri_e1, slots_c, axis=0)
        e2 = jnp.take(bvh.tri_e2, slots_c, axis=0)
        # (K, R, L) tests
        t, u, v, hit = ray_triangle(
            o[:, :, None, :], d[:, :, None, :],
            v0[:, None, :, :], e1[:, None, :, :], e2[:, None, :, :],
            tmin, tmax,
        )
        hit = hit & in_leaf[:, None, :] & lane_ok[:, :, None]
        t = jnp.where(hit, t, jnp.inf)
        j = jnp.argmin(t, axis=2)  # (K, R)
        tbest = jnp.take_along_axis(t, j[:, :, None], axis=2)[:, :, 0]
        better = tbest < s["t"]
        t_new = jnp.where(better, tbest, s["t"])
        u_new = jnp.where(
            better, jnp.take_along_axis(u, j[:, :, None], axis=2)[:, :, 0], s["u"]
        )
        v_new = jnp.where(
            better, jnp.take_along_axis(v, j[:, :, None], axis=2)[:, :, 0], s["v"]
        )
        slot_best = jnp.minimum(
            jnp.maximum(offset[:, None] + j, 0), leaf_len - 1
        )
        slot_new = jnp.where(better, slot_best, s["slot"])
        node = jnp.where(is_leaf, missl, node)
        return dict(
            node=node, t=t_new, u=u_new, v=v_new, slot=slot_new,
            steps=s["steps"] + 1,
        )

    out = jax.lax.while_loop(outer_cond, outer_body, state)
    slot = out["slot"].reshape(-1)[:n0]
    tri_id = jnp.where(slot >= 0, jnp.take(bvh.tri_perm, jnp.maximum(slot, 0)), -1)
    return {
        "t": out["t"].reshape(-1)[:n0],
        "tri_id": tri_id,
        "u": out["u"].reshape(-1)[:n0],
        "v": out["v"].reshape(-1)[:n0],
        "hit": slot >= 0,
        "steps": out["steps"],
    }


def occluded(
    bvh: BVH,
    origin: jnp.ndarray,
    direction: jnp.ndarray,
    tmin: float,
    tmax: float,
    active=None,
    packet_size: int = DEFAULT_PACKET,
    leaf_cap: int = None,
):
    """Packet any-hit occlusion with back-face culling; a packet stops early
    once every live lane is occluded."""
    n0 = origin.shape[0]
    r = packet_size
    if active is None:
        active = jnp.ones((n0,), dtype=bool)
    origin, n = _pad_packets(origin, r, 0.0)
    direction, _ = _pad_packets(direction, r, 1.0)
    active, _ = _pad_packets(active, r, False)
    k = n // r
    m = bvh.num_nodes
    leaf_len = bvh.tri_v0.shape[0]
    lcap = int(leaf_cap) if leaf_cap else LEAF_SIZE

    o = origin.reshape(k, r, 3)
    d = direction.reshape(k, r, 3)
    lane_ok = active.reshape(k, r)
    safe_d = jnp.where(jnp.abs(d) < 1e-12, jnp.where(d < 0, -1e-12, 1e-12), d)
    inv_d = 1.0 / safe_d
    oct_base = _packet_octant(d) * m
    start = jnp.where(jnp.any(lane_ok, axis=1), 0, m).astype(jnp.int32)

    state = dict(
        node=start,
        occ=jnp.zeros((k, r), dtype=bool),
        steps=jnp.zeros((), dtype=jnp.int32),
    )

    def outer_cond(s):
        return jnp.any(s["node"] < m)

    def inner_cond(s):
        count = jnp.take(bvh.tri_count, jnp.minimum(s["node"], m - 1), axis=0)
        return jnp.any((s["node"] < m) & (count == 0))

    def pending(s):
        # lanes still needing an answer
        return lane_ok & ~s["occ"]

    def inner_body(s):
        node = s["node"]
        act = node < m
        lo, hi, count, offset, hitl, missl = _gather_node(bvh, oct_base, node, m)
        is_internal = act & (count == 0)
        any_hit = _slab_any(
            lo, hi, o, inv_d, tmin, jnp.full((k, r), tmax), pending(s)
        )
        nxt = jnp.where(any_hit, hitl, missl)
        node = jnp.where(is_internal, nxt, node)
        return dict(s, node=node, steps=s["steps"] + 1)

    def outer_body(s):
        s = jax.lax.while_loop(inner_cond, inner_body, s)
        node = s["node"]
        act = node < m
        lo, hi, count, offset, hitl, missl = _gather_node(bvh, oct_base, node, m)
        is_leaf = act & (count > 0)
        ks = jnp.arange(lcap, dtype=jnp.int32)
        slots = offset[:, None] + ks[None, :]
        in_leaf = (ks[None, :] < count[:, None]) & is_leaf[:, None]
        slots_c = jnp.minimum(jnp.maximum(slots, 0), leaf_len - 1)
        v0 = jnp.take(bvh.tri_v0, slots_c, axis=0)
        e1 = jnp.take(bvh.tri_e1, slots_c, axis=0)
        e2 = jnp.take(bvh.tri_e2, slots_c, axis=0)
        _, _, _, hit = ray_triangle(
            o[:, :, None, :], d[:, :, None, :],
            v0[:, None, :, :], e1[:, None, :, :], e2[:, None, :, :],
            tmin, tmax, cull_backface=True,
        )
        hit = hit & in_leaf[:, None, :] & pending(s)[:, :, None]
        occ = s["occ"] | jnp.any(hit, axis=2)
        # early out: packet done once no pending lanes remain
        done_packet = ~jnp.any(lane_ok & ~occ, axis=1)
        node = jnp.where(is_leaf, jnp.where(done_packet, m, missl), node)
        return dict(node=node, occ=occ, steps=s["steps"] + 1)

    out = jax.lax.while_loop(outer_cond, outer_body, state)
    return out["occ"].reshape(-1)[:n0]
