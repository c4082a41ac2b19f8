"""Stackless threaded-BVH traversal over SoA ray batches.

The TPU analog of ``optixTrace`` (deviceProgram.cu:196-248): every ray carries
one int32 node pointer; a traversal step gathers its node, runs a slab test,
and follows the per-octant hit/miss link. Leaf visits run LEAF_SIZE masked
Möller-Trumbore tests. The whole batch advances in lockstep under
``lax.while_loop`` until every ray reaches the END sentinel — there is no
per-ray stack and no divergent control flow, only masks.

``closest_hit`` == the RADIANCE ray type; ``occluded`` == the OCCLUSION ray
type with back-face culling and early termination
(OPTIX_RAY_FLAG_CULL_BACK_FACING_TRIANGLES, deviceProgram.cu:237).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fovpathtracing_optixcodelatest_tpu.ops.bvh import BVH, LEAF_SIZE
from fovpathtracing_optixcodelatest_tpu.ops.intersect import ray_triangle


def _inv_dir(direction):
    d = direction
    safe = jnp.where(jnp.abs(d) < 1e-12, jnp.where(d < 0, -1e-12, 1e-12), d)
    return 1.0 / safe


def _octant(direction):
    return (
        (direction[:, 0] < 0).astype(jnp.int32)
        + 2 * (direction[:, 1] < 0).astype(jnp.int32)
        + 4 * (direction[:, 2] < 0).astype(jnp.int32)
    )


def _slab_test(lo, hi, origin, inv_d, tmin, tlimit):
    t0 = (lo - origin) * inv_d
    t1 = (hi - origin) * inv_d
    tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
    return (tn <= tf) & (tf >= tmin) & (tn <= tlimit)


def _leaf_intersect(bvh: BVH, offset, count, origin, direction, tmin, tmax,
                    cull_backface: bool):
    """Masked LEAF_SIZE-wide triangle test. Returns (t, u, v, slot, hit) of the
    per-ray best (closest) candidate within this leaf."""
    n = origin.shape[0]
    ks = jnp.arange(LEAF_SIZE, dtype=jnp.int32)
    slots = offset[:, None] + ks[None, :]  # (N, L)
    in_leaf = ks[None, :] < count[:, None]
    slots_c = jnp.clip(slots, 0, bvh.tri_v0.shape[0] - 1)
    v0 = jnp.take(bvh.tri_v0, slots_c, axis=0)  # (N, L, 3)
    e1 = jnp.take(bvh.tri_e1, slots_c, axis=0)
    e2 = jnp.take(bvh.tri_e2, slots_c, axis=0)
    t, u, v, hit = ray_triangle(
        origin[:, None, :], direction[:, None, :], v0, e1, e2, tmin, tmax,
        cull_backface=cull_backface,
    )
    hit = hit & in_leaf
    t = jnp.where(hit, t, jnp.inf)
    k = jnp.argmin(t, axis=1)
    rows = jnp.arange(n)
    return t[rows, k], u[rows, k], v[rows, k], slots_c[rows, k], hit[rows, k]


def closest_hit(
    bvh: BVH,
    origin: jnp.ndarray,
    direction: jnp.ndarray,
    tmin: float,
    tmax: float,
    max_steps: int = 1 << 30,
    active=None,
):
    """Closest-hit traversal.

    ``active`` (optional (N,) bool) masks dead rays out of the walk entirely
    (they start at END) — the wavefront loop's done-mask hook.

    Returns dict: t (N,), tri_id (N,) int32 original ids (-1 miss), u, v,
    hit (N,) bool, steps () int32 (total while-loop iterations, for stats).
    """
    n = origin.shape[0]
    m = bvh.num_nodes
    inv_d = _inv_dir(direction)
    oct_base = _octant(direction) * m
    hit_flat = bvh.hit_link.reshape(-1)
    miss_flat = bvh.miss_link.reshape(-1)
    start_node = (
        jnp.zeros((n,), dtype=jnp.int32)
        if active is None
        else jnp.where(active, 0, m).astype(jnp.int32)
    )

    state = dict(
        node=start_node,
        t=jnp.full((n,), jnp.inf, dtype=jnp.float32),
        u=jnp.zeros((n,), dtype=jnp.float32),
        v=jnp.zeros((n,), dtype=jnp.float32),
        slot=jnp.full((n,), -1, dtype=jnp.int32),
        steps=jnp.zeros((), dtype=jnp.int32),
    )

    def cond(s):
        return jnp.any(s["node"] < m) & (s["steps"] < max_steps)

    def body(s):
        node = s["node"]
        active = node < m
        nc = jnp.where(active, node, 0)
        lo = jnp.take(bvh.aabb_lo, nc, axis=0)
        hi = jnp.take(bvh.aabb_hi, nc, axis=0)
        count = jnp.take(bvh.tri_count, nc, axis=0)
        offset = jnp.take(bvh.tri_offset, nc, axis=0)
        hitl = jnp.take(hit_flat, oct_base + nc, axis=0)
        missl = jnp.take(miss_flat, oct_base + nc, axis=0)

        tlimit = jnp.minimum(s["t"], tmax)
        aabb_hit = _slab_test(lo, hi, origin, inv_d, tmin, tlimit)

        is_leaf = count > 0
        lt, lu, lv, lslot, lhit = _leaf_intersect(
            bvh, offset, count, origin, direction, tmin, tmax, cull_backface=False
        )
        take = active & is_leaf & aabb_hit & lhit & (lt < s["t"])
        t_new = jnp.where(take, lt, s["t"])
        u_new = jnp.where(take, lu, s["u"])
        v_new = jnp.where(take, lv, s["v"])
        slot_new = jnp.where(take, lslot, s["slot"])

        nxt = jnp.where(aabb_hit, hitl, missl)
        node_new = jnp.where(active, nxt, node)
        return dict(
            node=node_new, t=t_new, u=u_new, v=v_new, slot=slot_new,
            steps=s["steps"] + 1,
        )

    out = jax.lax.while_loop(cond, body, state)
    slot = out["slot"]
    tri_id = jnp.where(slot >= 0, jnp.take(bvh.tri_perm, jnp.maximum(slot, 0)), -1)
    return {
        "t": out["t"],
        "tri_id": tri_id,
        "u": out["u"],
        "v": out["v"],
        "hit": slot >= 0,
        "steps": out["steps"],
    }


def occluded(
    bvh: BVH,
    origin: jnp.ndarray,
    direction: jnp.ndarray,
    tmin: float,
    tmax: float,
    max_steps: int = 1 << 30,
    active=None,
):
    """Any-hit occlusion query with back-face culling; rays terminate on first
    hit (the TERMINATE_ON_FIRST_HIT/CULL_BACK_FACING semantics of the
    reference's occlusion ray, deviceProgram.cu:224-248). Returns (N,) bool."""
    n = origin.shape[0]
    m = bvh.num_nodes
    inv_d = _inv_dir(direction)
    oct_base = _octant(direction) * m
    hit_flat = bvh.hit_link.reshape(-1)
    miss_flat = bvh.miss_link.reshape(-1)
    start_node = (
        jnp.zeros((n,), dtype=jnp.int32)
        if active is None
        else jnp.where(active, 0, m).astype(jnp.int32)
    )

    state = dict(
        node=start_node,
        occ=jnp.zeros((n,), dtype=bool),
        steps=jnp.zeros((), dtype=jnp.int32),
    )

    def cond(s):
        return jnp.any(s["node"] < m) & (s["steps"] < max_steps)

    def body(s):
        node = s["node"]
        active = node < m
        nc = jnp.where(active, node, 0)
        lo = jnp.take(bvh.aabb_lo, nc, axis=0)
        hi = jnp.take(bvh.aabb_hi, nc, axis=0)
        count = jnp.take(bvh.tri_count, nc, axis=0)
        offset = jnp.take(bvh.tri_offset, nc, axis=0)
        hitl = jnp.take(hit_flat, oct_base + nc, axis=0)
        missl = jnp.take(miss_flat, oct_base + nc, axis=0)

        aabb_hit = _slab_test(lo, hi, origin, inv_d, tmin, tmax)
        is_leaf = count > 0
        _, _, _, _, lhit = _leaf_intersect(
            bvh, offset, count, origin, direction, tmin, tmax, cull_backface=True
        )
        occ_new = s["occ"] | (active & is_leaf & aabb_hit & lhit)
        nxt = jnp.where(aabb_hit, hitl, missl)
        # early out: occluded rays jump straight to END
        node_new = jnp.where(active & ~occ_new, nxt, jnp.where(active, m, node))
        return dict(node=node_new, occ=occ_new, steps=s["steps"] + 1)

    out = jax.lax.while_loop(cond, body, state)
    return out["occ"]
