"""8-wide BVH: SAH BVH2 collapsed to branching factor 8, laid out for wide
contiguous gathers.

Why 8-wide on TPU: traversal cost = while_loop iterations × per-iteration
memory traffic. TPU gathers run near HBM bandwidth for large ray batches
(measured ~300-460 GB/s) but iterations serialize, so the win is *fewer,
fatter* iterations: one pop tests 8 child AABBs from a single contiguous
(8,6)-float row. Compared with the threaded BVH2 walk (ops/traverse.py) this
cuts iteration count ~10-20× for the same total bytes touched.

Node layout (SoA, node-major):
  boxes (M, 8, 6) f32 — child AABBs, empty slots = inverted boxes
  meta  (M, 8, 2) i32 — [a, count]: count>0 ⇒ leaf (a = tri_offset),
                         count==0 ⇒ internal (a = child node id),
                         count==-1 ⇒ empty slot
Leaf triangles are contiguous slots in tri_v0/e1/e2 with tri_perm mapping back
to original ids (same scheme as ops/bvh.py).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from fovpathtracing_optixcodelatest_tpu.ops.bvh import build_bvh2

WIDTH = 8
LEAF_SIZE8 = 4  # default leaf size (A/B'd on v5e: 4 beats 8 by ~8%)


@dataclasses.dataclass(frozen=True)
class WideBVH:
    """Packed for ONE-gather-per-step traversal (see ops/traverse8.py).

    table (U, W) f32 — unified rows (W = max(64, 9·leaf_size));
      the first M rows are internal nodes,
      the rest leaves, so each traversal step gathers exactly one row
      regardless of entry type:
      - node row: 8 children × [lo3, hi3] (48 floats) then 8 × [a, kind]
        int32 bitcast to f32. kind: 0 = internal (a = child row id),
        1 = leaf (a = leaf row id, already offset by M), -1 = empty.
      - leaf row: leaf_size packed triangles [v0, e1, e2]; unused slots
        are degenerate (all-zero ⇒ det == 0 ⇒ never hit).
    leaf_perm (U, leaf_size) i32 — original triangle id per leaf-row slot (-1
      for node rows/padding); indexed by best = row*leaf_size + k.
    """

    table: jnp.ndarray  # (U, W) f32
    leaf_perm: jnp.ndarray  # (U, leaf_size) i32
    leaf_size: int = LEAF_SIZE8
    # static: exact worst-case stack entries = (WIDTH-1)·height + 1
    stack_depth: int = 28

    @property
    def num_rows(self) -> int:
        return self.table.shape[0]


jax.tree_util.register_dataclass(
    WideBVH,
    data_fields=["table", "leaf_perm"],
    meta_fields=["leaf_size", "stack_depth"],
)


def pack_wide(boxes: np.ndarray, meta: np.ndarray, tris: np.ndarray,
              order_slots: np.ndarray, leaf_size: int) -> WideBVH:
    """Pack (M,8,6) boxes + (M,8,2) meta + leaf slot permutation into the
    gather-friendly WideBVH layout.

    ``meta`` convention on input: [a, count] with count>0 leaf (a=slot
    offset), 0 internal (a=node id), -1 empty. ``order_slots`` maps slot
    index -> original tri id (-1 pad).
    """
    m = boxes.shape[0]
    counts = meta[..., 1]
    a_vals = meta[..., 0]
    leaf_mask = counts > 0
    lw, ls = np.nonzero(leaf_mask)
    num_leaves = max(len(lw), 1)
    s_len = len(order_slots)
    u = m + num_leaves
    width = max(64, 9 * leaf_size)

    new_a = a_vals.copy()
    new_kind = np.where(counts > 0, 1, np.where(counts == 0, 0, -1)).astype(
        np.int32
    )
    table = np.zeros((u, width), dtype=np.float32)
    leaf_perm = np.full((u, leaf_size), -1, dtype=np.int32)
    if len(lw):
        offs = a_vals[lw, ls].astype(np.int64)
        cnts = counts[lw, ls].astype(np.int64)
        k = np.arange(leaf_size, dtype=np.int64)
        slot_idx = np.clip(offs[:, None] + k[None, :], 0, s_len - 1)
        valid = k[None, :] < cnts[:, None]
        tid = np.where(valid, order_slots[slot_idx], -1)
        safe = np.maximum(tid, 0)
        p = tris[safe]  # (L, 8, 3, 3)
        v0 = p[:, :, 0]
        e1 = p[:, :, 1] - v0
        e2 = p[:, :, 2] - v0
        packed = np.concatenate([v0, e1, e2], axis=-1)  # (L, leaf_size, 9)
        packed[~valid] = 0.0
        table[m:, : 9 * leaf_size] = packed.reshape(len(lw), 9 * leaf_size)
        leaf_perm[m:] = tid.astype(np.int32)
        # leaf child pointers address unified rows (offset by M)
        new_a[lw, ls] = m + np.arange(len(lw), dtype=np.int32)

    meta_packed = np.zeros((m, 8, 2), dtype=np.int32)
    meta_packed[..., 0] = new_a
    meta_packed[..., 1] = new_kind
    table[:m, :48] = boxes.reshape(m, 48)
    table[:m, 48:64] = meta_packed.reshape(m, 16).view(np.float32)

    # exact tree height → minimal correct stack depth (no silent drops)
    height = 0
    frontier = np.asarray([0], dtype=np.int64)
    while frontier.size:
        kids = new_a[frontier]  # (F, 8)
        internal = new_kind[frontier] == 0
        frontier = kids[internal].astype(np.int64)
        height += 1
        if height > 64:  # defensive: malformed tree
            break
    stack_depth = (WIDTH - 1) * height + 2

    return WideBVH(
        table=jnp.asarray(table),
        leaf_perm=jnp.asarray(leaf_perm),
        leaf_size=leaf_size,
        stack_depth=stack_depth,
    )


def _surface_area(lo, hi):
    d = np.maximum(hi - lo, 0.0)
    return 2.0 * (d[0] * d[1] + d[1] * d[2] + d[2] * d[0])


def build(tris: np.ndarray, leaf_size: int = LEAF_SIZE8) -> WideBVH:
    """Build the wide BVH from (T, 3, 3) triangle corners."""
    nodes, order = build_bvh2(tris, leaf_size)

    # Collapse: each wide node absorbs up to 8 BVH2 descendants, repeatedly
    # expanding the largest-surface-area internal candidate.
    wide_children: list[list[int]] = []  # wide node -> list of bvh2 node ids
    wide_index: dict[int, int] = {}  # bvh2 id -> wide node id

    def make_wide(b2: int) -> int:
        n = nodes[b2]
        group = [n.left, n.right] if n.count == 0 else [b2]
        while len(group) < WIDTH:
            best, best_sa = -1, -1.0
            for i, c in enumerate(group):
                cn = nodes[c]
                if cn.count == 0:
                    sa = _surface_area(cn.lo, cn.hi)
                    if sa > best_sa:
                        best, best_sa = i, sa
                    # expanding must not overflow the 8 slots
            if best < 0 or len(group) + 1 > WIDTH:
                break
            cn = nodes[group[best]]
            group[best : best + 1] = [cn.left, cn.right]
        idx = len(wide_children)
        wide_children.append(group)
        wide_index[b2] = idx
        return idx

    # BFS from root so parents get indices before children
    root = make_wide(0)
    queue = [root]
    while queue:
        w = queue.pop()
        for c in wide_children[w]:
            if nodes[c].count == 0 and c not in wide_index:
                make_wide(c)
                queue.append(wide_index[c])

    m = len(wide_children)
    boxes = np.zeros((m, WIDTH, 6), dtype=np.float32)
    boxes[..., 0:3] = np.inf
    boxes[..., 3:6] = -np.inf
    meta = np.full((m, WIDTH, 2), [0, -1], dtype=np.int32)

    # leaf triangle slots (slot-offset form; pack_wide converts to leaf rows)
    total = int(sum(nodes[c].count for g in wide_children for c in g))
    total = max(total, 1)
    order_slots = np.full(total, -1, dtype=np.int64)
    cursor = 0
    for w, group in enumerate(wide_children):
        for s, c in enumerate(group):
            cn = nodes[c]
            boxes[w, s, 0:3] = cn.lo
            boxes[w, s, 3:6] = cn.hi
            if cn.count == 0:
                meta[w, s] = (wide_index[c], 0)
            else:
                ids = order[cn.start : cn.start + cn.count]
                meta[w, s] = (cursor, cn.count)
                order_slots[cursor : cursor + cn.count] = ids
                cursor += cn.count

    return pack_wide(boxes, meta, tris, order_slots, leaf_size)
