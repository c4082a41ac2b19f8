"""Host-side BVH build → stackless threaded device layout.

The reference's acceleration structure is OptiX's opaque hardware BVH
(optixAccelBuild, SimplePathtracer.cpp:602-746). The TPU replacement is built
host-side (vectorized numpy binned-SAH, median fallback) and flattened to a
*threaded* layout: nodes in DFS preorder, each carrying hit ("descend") and
miss ("skip subtree") links. Traversal then needs a single int32 of control
state per ray —

    next = aabb_hit ? hit_link : miss_link      (internal nodes)
    next = miss_link                            (leaves, after tri tests)

— the lockstep-friendly shape for the TPU VPU: no per-ray stack, no divergent
push/pop; every step is one gather + one AABB slab test (+ masked leaf
triangle tests). Front-to-back pruning is approximated with 8 precomputed link
tables, one per ray-direction octant (octant bit a = sign of dir[a]): each ray
walks its subtrees near-to-far for its direction class, keeping the t_best
prune effective without a stack.

Leaf triangles are reordered contiguous; ``tri_perm`` maps slots back to
original triangle ids (for material/texture lookup).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

LEAF_SIZE = 4  # max triangles per leaf
NUM_SAH_BINS = 16


@dataclasses.dataclass
class _BuildNode:
    lo: np.ndarray
    hi: np.ndarray
    start: int  # range into the primitive order array
    count: int  # 0 for internal
    left: int = -1
    right: int = -1
    axis: int = 0  # split axis (drives octant child ordering)


def build_bvh2(tris: np.ndarray, leaf_size: int = LEAF_SIZE):
    """Binned-SAH binary BVH over (T, 3, 3) float32 triangle corners.
    Returns (nodes: list[_BuildNode], order: (T,) permutation of tri ids)."""
    t_count = tris.shape[0]
    lo_all = tris.min(axis=1)
    hi_all = tris.max(axis=1)
    centroid = 0.5 * (lo_all + hi_all)
    order = np.arange(t_count, dtype=np.int64)
    nodes: list[_BuildNode] = []

    def make_node(start: int, count: int) -> int:
        ids = order[start : start + count]
        nodes.append(
            _BuildNode(
                lo=lo_all[ids].min(axis=0),
                hi=hi_all[ids].max(axis=0),
                start=start,
                count=count,
            )
        )
        return len(nodes) - 1

    stack = [make_node(0, t_count)]
    while stack:
        ni = stack.pop()
        node = nodes[ni]
        count = node.count
        if count <= leaf_size:
            continue  # stays a leaf
        start = node.start
        ids = order[start : start + count]
        cen = centroid[ids]
        cmin = cen.min(axis=0)
        cmax = cen.max(axis=0)
        ext = cmax - cmin
        axis = int(np.argmax(ext))
        mid = 0
        if ext[axis] > 1e-12:
            # binned SAH along the widest axis
            nb = NUM_SAH_BINS
            scale = nb * (1.0 - 1e-6) / ext[axis]
            bin_ids = np.clip(
                ((cen[:, axis] - cmin[axis]) * scale).astype(np.int64), 0, nb - 1
            )
            bin_lo = np.full((nb, 3), np.inf)
            bin_hi = np.full((nb, 3), -np.inf)
            bin_n = np.zeros(nb, dtype=np.int64)
            np.add.at(bin_n, bin_ids, 1)
            for a in range(3):
                np.minimum.at(bin_lo[:, a], bin_ids, lo_all[ids][:, a])
                np.maximum.at(bin_hi[:, a], bin_ids, hi_all[ids][:, a])
            lcount = np.cumsum(bin_n)[:-1]
            rcount = count - lcount
            llo = np.minimum.accumulate(bin_lo, axis=0)[:-1]
            lhi = np.maximum.accumulate(bin_hi, axis=0)[:-1]
            rlo = np.minimum.accumulate(bin_lo[::-1], axis=0)[::-1][1:]
            rhi = np.maximum.accumulate(bin_hi[::-1], axis=0)[::-1][1:]

            def sa(lo, hi):
                d = np.maximum(hi - lo, 0.0)
                return 2.0 * (
                    d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2] + d[:, 2] * d[:, 0]
                )

            cost = np.where(
                (lcount > 0) & (rcount > 0),
                sa(llo, lhi) * lcount + sa(rlo, rhi) * rcount,
                np.inf,
            )
            best = int(np.argmin(cost))
            if np.isfinite(cost[best]):
                left_mask = bin_ids <= best
                mid = int(left_mask.sum())
                if 0 < mid < count:
                    seg = ids.copy()
                    order[start : start + mid] = seg[left_mask]
                    order[start + mid : start + count] = seg[~left_mask]
                else:
                    mid = 0
        if mid == 0:
            # median split by centroid order (degenerate or SAH-failed)
            mid = count // 2
            key = np.argsort(cen[:, axis], kind="stable")
            order[start : start + count] = ids[key]
        li = make_node(start, mid)
        ri = make_node(start + mid, count - mid)
        node.left, node.right, node.axis, node.count = li, ri, axis, 0
        stack.append(li)
        stack.append(ri)
    return nodes, order


@dataclasses.dataclass(frozen=True)
class BVH:
    """Device threaded BVH. Node arrays are SoA in canonical DFS preorder.

    ``hit_link``/``miss_link`` have shape (8, M): one threading per
    ray-direction octant. ``num_nodes`` is the END sentinel value. Leaf slots
    reference the reordered ``tri_v0/e1/e2``; ``tri_perm`` maps a slot to the
    original triangle id (-1 = padding).
    """

    aabb_lo: jnp.ndarray  # (M, 3)
    aabb_hi: jnp.ndarray  # (M, 3)
    hit_link: jnp.ndarray  # (8, M) int32
    miss_link: jnp.ndarray  # (8, M) int32
    tri_offset: jnp.ndarray  # (M,) int32 (valid for leaves)
    tri_count: jnp.ndarray  # (M,) int32 (0 = internal)
    tri_v0: jnp.ndarray  # (Tp, 3) leaf-ordered
    tri_e1: jnp.ndarray
    tri_e2: jnp.ndarray
    tri_perm: jnp.ndarray  # (Tp,) int32

    @property
    def num_nodes(self) -> int:
        return self.aabb_lo.shape[0]


jax.tree_util.register_dataclass(
    BVH,
    data_fields=[
        "aabb_lo", "aabb_hi", "hit_link", "miss_link", "tri_offset",
        "tri_count", "tri_v0", "tri_e1", "tri_e2", "tri_perm",
    ],
    meta_fields=[],
)


def flatten_bvh(nodes, order, tris: np.ndarray) -> BVH:
    """Flatten the build tree: canonical preorder numbering + 8 octant link
    tables + leaf-contiguous triangle slots."""
    m = len(nodes)
    pre_index = np.full(m, -1, dtype=np.int64)
    preorder = []
    stack = [0]
    while stack:
        ni = stack.pop()
        pre_index[ni] = len(preorder)
        preorder.append(ni)
        n = nodes[ni]
        if n.count == 0:
            stack.append(n.right)
            stack.append(n.left)
    assert len(preorder) == m

    aabb_lo = np.stack([nodes[ni].lo for ni in preorder]).astype(np.float32)
    aabb_hi = np.stack([nodes[ni].hi for ni in preorder]).astype(np.float32)
    counts = np.asarray([nodes[ni].count for ni in preorder], dtype=np.int32)

    hit_link = np.zeros((8, m), dtype=np.int32)
    miss_link = np.zeros((8, m), dtype=np.int32)
    for o in range(8):
        stack2 = [(0, m)]  # (build node id, miss target in canonical numbering)
        while stack2:
            ni, miss = stack2.pop()
            p = pre_index[ni]
            miss_link[o, p] = miss
            n = nodes[ni]
            if n.count > 0:
                hit_link[o, p] = miss  # leaf: proceed after tri tests
                continue
            first, second = n.left, n.right
            # Near-to-far: left child covers the low side of the split axis, so
            # rays with negative direction on that axis (octant bit set) visit
            # the right child first.
            if (o >> n.axis) & 1:
                first, second = second, first
            hit_link[o, p] = pre_index[first]
            stack2.append((first, pre_index[second]))
            stack2.append((second, miss))

    slot_of = np.zeros(m, dtype=np.int32)
    total = 0
    for p, ni in enumerate(preorder):
        if nodes[ni].count > 0:
            slot_of[p] = total
            total += nodes[ni].count
    total = max(total, 1)
    tri_v0 = np.zeros((total, 3), dtype=np.float32)
    tri_e1 = np.zeros_like(tri_v0)
    tri_e2 = np.zeros_like(tri_v0)
    tri_perm = np.full(total, -1, dtype=np.int32)
    for p, ni in enumerate(preorder):
        n = nodes[ni]
        if n.count > 0:
            ids = order[n.start : n.start + n.count]
            s = slot_of[p]
            tri_v0[s : s + n.count] = tris[ids, 0]
            tri_e1[s : s + n.count] = tris[ids, 1] - tris[ids, 0]
            tri_e2[s : s + n.count] = tris[ids, 2] - tris[ids, 0]
            tri_perm[s : s + n.count] = ids

    return BVH(
        aabb_lo=jnp.asarray(aabb_lo),
        aabb_hi=jnp.asarray(aabb_hi),
        hit_link=jnp.asarray(hit_link),
        miss_link=jnp.asarray(miss_link),
        tri_offset=jnp.asarray(slot_of),
        tri_count=jnp.asarray(counts),
        tri_v0=jnp.asarray(tri_v0),
        tri_e1=jnp.asarray(tri_e1),
        tri_e2=jnp.asarray(tri_e2),
        tri_perm=jnp.asarray(tri_perm),
    )


def build(tris: np.ndarray, leaf_size: int = LEAF_SIZE) -> BVH:
    """Build the device BVH from (T, 3, 3) triangle corners."""
    nodes, order = build_bvh2(tris, leaf_size)
    return flatten_bvh(nodes, order, tris)
