"""Wide BVH (arity A, default 16) packed for one-row-gather traversal.

Why wide-and-packed on TPU: traversal cost = while_loop iterations x
per-iteration cost, and the per-iteration cost is dominated by the row
gather, which is ROW-RATE-bound (~1.5 ns/row on v5e regardless of row width
up to >=512 B — measured, see PLAN.md). So the win is *fewer, fatter* rows:

- arity 16 nodes halve tree depth vs 8-wide at the same gather cost;
- child AABBs are stored as CONSERVATIVE bfloat16 pairs packed two-per-f32
  (lo rounded toward -inf, hi toward +inf), so 16 children x 6 bounds fit in
  48 f32 columns — the transpose that follows the gather is byte-bound, and
  bf16 boxes halve it;
- child metadata is pre-encoded as the traversal's own entry code (one i32
  per child), so expansion needs no [a, kind] decode.

Node row layout (W = max(4A, 10*leaf_size) f32 columns; first M rows):
  cols [3c + a], c < A, a < 3: uint32 = (bf16_bits(lo_a) << 16)
                                      | bf16_bits(hi_a), bitcast to f32.
    decode: u = bitcast_u32(col); lo = bitcast_f32(u & 0xFFFF0000);
            hi = bitcast_f32(u << 16).
  cols [3A + c]: entry code ("ucode") i32 bitcast to f32:
    (row << 2) | kind, kind 0 = internal (row = wide row id), 1 = leaf
    (row = unified leaf row), 2 = instance (row = instance id — ops/tlas.py);
    EMPTY slot = 0 (ucode 0 decodes to "internal row 0" = the root, which is
    never anyone's child). Keeping the code unsigned-small lets the traversal
    pack (quantized tn | ucode) into ONE u32 stack entry — near-to-far child
    ordering, stale-pop draining and the push all ride a single array (see
    ops/traverse8.py; the twin (entry, tn) stacks cost 2x the one-hot
    traffic and a 3-operand Batcher sort per step).
Leaf rows (rows M..U): leaf_size packed triangles [v0, e1, e2] f32; unused
slots degenerate (all-zero => det == 0 => never hit); cols
[9*leaf_size + k] carry slot k's ORIGINAL triangle id (i32 bitcast, -1 pad)
so the winning hit's tri id falls out of the row gather already in hand — a
separate leaf_perm gather at the batch epilogue measured ~18 ms at 1.9M
rays on the v5e (gathers from small 1-D tables are element-rate-bound; the
row gather is row-rate-bound so 14 extra columns are free). leaf_perm
still maps (row, slot) -> original triangle id for host-side tooling.

Conservative bf16 boxes only ADD false-positive box hits; hit results stay
exactly equal to full-precision traversal (leaf tests are f32).

``build_legacy8`` keeps the round-1 8-wide full-f32 [a, kind] format for the
experimental Pallas/packet kernels.
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from fovpathtracing_optixcodelatest_tpu.ops.bvh import build_bvh2

ARITY = 16
# Best measured default (round 3): L6/A16 packs rows into 64 f32 columns
# (nodes 3*16 box floats + 16 codes = 64; leaves 9*6 + 6 ids = 60). The row
# gather is ~48 us fixed + ~0.8 us/col at 32k indices, so the 140-col L14
# rows cost 2.6x more per pop than the extra pops L6 adds: frame-scale
# 638 -> 538 ms, raw primary closest-hit 221 -> 87 ms (scratch/r3_width_frame,
# exp_r3_width64; PLAN.md rule 16).
LEAF_SIZE = 6
# ucode kinds (entry code = (row << 2) | kind); EMPTY = 0 (see module doc)
KIND_NODE, KIND_LEAF, KIND_INST = 0, 1, 2
EMPTY = np.int32(0)

# legacy (round-1) constants, used by the experimental Pallas kernels
WIDTH = 8
LEAF_SIZE8 = 4


@dataclasses.dataclass(frozen=True)
class WideBVH:
    """Packed for ONE-gather-per-step traversal (see ops/traverse8.py).

    ``packed=True`` -> the bf16-pair/entry-code layout in the module
    docstring; ``packed=False`` -> the legacy 8-wide f32 [a, kind] layout.
    """

    table: jnp.ndarray  # (U, W) f32
    leaf_perm: jnp.ndarray  # (U, leaf_size) i32
    # treelet layouts upload rows [0, top_rows) AGAIN as a separate small
    # array: a static lax.slice of the big table gets FUSED back into the
    # gather (operand stays HBM, per-index rate); a genuinely separate
    # device array keeps the top-pass gather VMEM-resident. None otherwise.
    top_table: jnp.ndarray | None = None
    leaf_size: int = LEAF_SIZE
    arity: int = ARITY
    packed: bool = True
    # static: worst-case stack entries = (arity-1) * height + 2
    stack_depth: int = 28
    # two-level (instanced) tables (ops/tlas.py): rows [0, inst_base) are
    # TLAS nodes, [inst_base, blas_base) are instance rows (root code +
    # inverse transform), [blas_base, U) are the per-unique-mesh BLAS
    # forests. num_instances == 0 -> single-level (the default layout).
    num_instances: int = 0
    inst_base: int = 0
    blas_base: int = 0
    # rows are DFS-interleaved (each subtree's node AND leaf rows contiguous)
    # — the layout the deep-scene windowed traversal wants (a ray's working
    # set stays inside a small row band; see dfs_permute_host)
    dfs: bool = False
    # treelet layout (treelet_permute_host): rows [0, top_rows) are the
    # tree's TOP (every node whose subtree exceeds the treelet budget, plus
    # the leaf rows those nodes own); rows >= top_rows are the bottom
    # treelets, each DFS-contiguous and <= the budget. 0 = not treelet-laid.
    top_rows: int = 0
    # exact worst-case stack occupancy of a TOP-ONLY walk (treelet children
    # are diverted, not pushed — ops/traverse8._top_loop); tiny vs the full
    # tree bound, so the top pass's stack one-hots stay cheap.
    top_stack: int = 0
    # exact worst-case stack occupancy of any SINGLE treelet subtree walk —
    # the windowed rounds' stacks are capped at treelet_stack + K instead of
    # the full-tree bound (157 vs ~40 at 1.9M tris; the (D, 8, L) one-hot
    # stack ops scale with D).
    treelet_stack: int = 0

    @property
    def num_rows(self) -> int:
        return self.table.shape[0]

    @property
    def instanced(self) -> bool:
        return self.num_instances > 0


jax.tree_util.register_dataclass(
    WideBVH,
    data_fields=["table", "leaf_perm", "top_table"],
    meta_fields=["leaf_size", "arity", "packed", "stack_depth",
                 "num_instances", "inst_base", "blas_base", "dfs",
                 "top_rows", "top_stack", "treelet_stack"],
)

def codebits(num_rows: int) -> int:
    """Static bit width of the ucode field: the traversal packs
    (tn_mono & ~((1 << codebits) - 1)) | ucode into one u32 stack entry."""
    return max(int(num_rows - 1).bit_length() + 2, 3)


def _bf16_down_bits(x: np.ndarray) -> np.ndarray:
    """uint32 bf16-aligned bits of the largest bf16 <= x (finite x)."""
    x = np.asarray(x, dtype=np.float32)
    t = (x.view(np.uint32) & np.uint32(0xFFFF0000)).view(np.float32)
    # truncation moves toward zero: correct for x >= 0, one ulp high for x < 0
    need = t > x
    b = t.view(np.uint32)
    sign = (b & np.uint32(0x80000000)) != 0
    stepped = np.where(
        sign,
        b + np.uint32(0x10000),  # negative: larger magnitude = toward -inf
        np.where(b == 0, np.uint32(0x80010000), b - np.uint32(0x10000)),
    )
    out = np.where(need, stepped, b)
    return out & np.uint32(0xFFFF0000)


def _bf16_up_bits(x: np.ndarray) -> np.ndarray:
    """uint32 bf16-aligned bits of the smallest bf16 >= x (finite x)."""
    neg = _bf16_down_bits(-np.asarray(x, dtype=np.float32))
    return neg ^ np.uint32(0x80000000)


def pack_boxes_into(table: np.ndarray, row0: int, boxes: np.ndarray,
                    entry: np.ndarray, arity: int) -> None:
    """Write node rows (bf16-pair conservative boxes + entry codes) into
    ``table`` rows ``row0..row0+M`` — the node-row layout in the module
    docstring. Shared by single-level packing and the TLAS builder."""
    m = boxes.shape[0]
    lo = boxes[..., 0:3]  # (M, A, 3)
    hi = boxes[..., 3:6]
    finite = np.isfinite(lo) & np.isfinite(hi)
    lo_b = np.where(finite, _bf16_down_bits(np.where(finite, lo, 0.0)),
                    np.float32(np.inf).view(np.uint32) & np.uint32(0xFFFF0000))
    hi_b = np.where(finite, _bf16_up_bits(np.where(finite, hi, 0.0)),
                    (-np.float32(np.inf)).view(np.uint32) & np.uint32(0xFFFF0000))
    pair = (lo_b & np.uint32(0xFFFF0000)) | (hi_b >> np.uint32(16))
    table[row0 : row0 + m, : 3 * arity] = (
        pair.astype(np.uint32).reshape(m, 3 * arity).view(np.float32)
    )
    table[row0 : row0 + m, 3 * arity : 4 * arity] = (
        entry.astype(np.int32).view(np.float32)
    )


def pack_region_into(table, leaf_perm, row0, tri_base, boxes, meta, tris,
                     order_slots, leaf_size, arity):
    """Pack one collapsed wide BVH (node rows then leaf rows) into ``table``
    starting at ``row0``, entry codes offset by ``row0`` and triangle ids by
    ``tri_base``. Returns (rows_used, entry) — ``entry`` is the (M, A) node
    child-code array (absolute codes) for stack-depth walks.

    ``meta`` convention: [a, count] with count>0 leaf (a=slot offset),
    0 internal (a=wide node id), -1 empty; ``order_slots`` maps slot index ->
    local tri id (-1 pad). The ONE writer of the row layout — pack_wide and
    ops/tlas.py both go through here.
    """
    m = boxes.shape[0]
    counts = meta[..., 1]
    a_vals = meta[..., 0]
    leaf_mask = counts > 0
    lw, ls = np.nonzero(leaf_mask)
    s_len = len(order_slots)

    entry = np.full((m, arity), EMPTY, dtype=np.int32)
    entry[counts == 0] = (a_vals[counts == 0] + row0) << 2
    if len(lw):
        offs = a_vals[lw, ls].astype(np.int64)
        cnts = counts[lw, ls].astype(np.int64)
        k = np.arange(leaf_size, dtype=np.int64)
        slot_idx = np.clip(offs[:, None] + k[None, :], 0, s_len - 1)
        valid = k[None, :] < cnts[:, None]
        tid = np.where(valid, order_slots[slot_idx], -1)
        safe = np.maximum(tid, 0)
        p = tris[safe]  # (L, leaf_size, 3, 3)
        v0 = p[:, :, 0]
        e1 = p[:, :, 1] - v0
        e2 = p[:, :, 2] - v0
        packed = np.concatenate([v0, e1, e2], axis=-1)  # (L, leaf_size, 9)
        packed[~valid] = 0.0
        lr0 = row0 + m
        table[lr0 : lr0 + len(lw), : 9 * leaf_size] = packed.reshape(
            len(lw), 9 * leaf_size
        )
        gid = np.where(tid >= 0, tid + tri_base, -1).astype(np.int32)
        table[lr0 : lr0 + len(lw), 9 * leaf_size : 10 * leaf_size] = (
            gid.view(np.float32)
        )
        leaf_perm[lr0 : lr0 + len(lw)] = gid
        # leaf entry code addresses the unified row
        entry[lw, ls] = (
            (lr0 + np.arange(len(lw), dtype=np.int32)) << 2
        ) | KIND_LEAF
    pack_boxes_into(table, row0, boxes, entry, arity)
    return m + len(lw), entry


def dfs_permute_host(table: np.ndarray, leaf_perm: np.ndarray,
                     arity: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Permute a packed single-level table into DFS-interleaved row order:
    parent node row, then its leaf rows, then each child subtree contiguous.

    Default pack order puts ALL node rows first and ALL leaf rows after them,
    so a descending ray alternates between the table's two halves — the
    worst case for the deep-scene windowed traversal, which gathers from an
     8k-row dynamic_slice window (measured: a windowed gather erases the
    whole HBM-gather penalty, 641→433 us/iter at 243k rows, scratch/
    r4_window2.py). After this permute a subtree of R rows spans exactly R
    contiguous rows, so coherent rays share windows.

    Pure row permutation + entry-code rewrite: traversal RESULTS are
    unchanged (same boxes, same triangles, same f32 math); only pop order
    among equal-keyed stack entries can differ. Returns
    (new_table, new_leaf_perm, perm) with perm[old_row] = new_row; the root
    stays row 0.
    """
    u = table.shape[0]
    codes_all = table[:, 3 * arity : 4 * arity].view(np.int32)  # (U, A)
    perm = np.full(u, -1, dtype=np.int64)
    node_mask = np.zeros(u, dtype=bool)
    cursor = 0
    stack = [0]
    while stack:
        r = stack.pop()
        if perm[r] >= 0:
            continue
        perm[r] = cursor
        cursor += 1
        node_mask[r] = True
        c = codes_all[r]
        nz = c[c != EMPTY]
        kinds = nz & 3
        rows = (nz >> 2).astype(np.int64)
        for lr in rows[kinds == KIND_LEAF]:
            if perm[lr] < 0:
                perm[lr] = cursor
                cursor += 1
        kid_nodes = rows[kinds == KIND_NODE]
        for kn in kid_nodes[::-1]:  # reversed push => slot order visit
            if perm[kn] < 0:
                stack.append(kn)
    unreached = np.nonzero(perm < 0)[0]  # padding rows (e.g. leafless pad)
    perm[unreached] = cursor + np.arange(len(unreached))

    new_table = np.empty_like(table)
    new_table[perm] = table
    new_leaf_perm = np.empty_like(leaf_perm)
    new_leaf_perm[perm] = leaf_perm
    # rewrite node rows' child codes to the new row ids
    nodes_old = np.nonzero(node_mask)[0]
    oc = codes_all[nodes_old]  # (K, A)
    nc = np.where(
        oc == EMPTY, EMPTY,
        ((perm[oc >> 2] << 2) | (oc & 3)).astype(np.int32),
    ).astype(np.int32)
    new_table[perm[nodes_old], 3 * arity : 4 * arity] = nc.view(np.float32)
    return new_table, new_leaf_perm, perm


_EMPTY_BOX_PAIR = np.uint32(0x7F80FF80)  # bf16 pair (lo=+inf, hi=-inf)


def group_small_siblings_host(
    table: np.ndarray, leaf_perm: np.ndarray, arity: int, budget: int
) -> tuple[np.ndarray, np.ndarray]:
    """Merge runs of SMALL sibling subtrees under new synthetic group nodes
    so every treelet approaches ``budget`` rows regardless of scene scale.

    Why: subtree row spans quantize by ~arity between levels (at 1.34M rows
    / arity 32 the natural treelets are ~1.3k rows), so rays cross tens of
    treelets and the K-nearest phased serving loses to plain gathers (PLAN
    rule 47). Grouping consecutive small siblings (combined span + 1 <=
    budget) under one new interior node makes each group ONE treelet entry
    (~budget rows, window-sized) at the cost of one extra pop per crossed
    group.

    Hit results are unchanged: the group node's box is the exact bf16 union
    of its members' conservative boxes, members keep their bit-identical
    rows, and `_expand` masks EMPTY codes — only pop order and (documented)
    equal-t tie resolution can differ. Returns (table2, leaf_perm2) with
    the group rows APPENDED (row ids >= the old row count); run
    treelet_permute_host on the result to lay it out.
    """
    u = table.shape[0]
    codes_all = table[:, 3 * arity : 4 * arity].view(np.int32)

    kids: dict[int, np.ndarray] = {}  # node row -> child codes (non-empty)
    order_found: list[int] = []
    stack = [0]
    seen = np.zeros(u, dtype=bool)
    seen[0] = True
    while stack:
        r = stack.pop()
        order_found.append(r)
        c = codes_all[r]
        nz = c[c != EMPTY]
        kids[r] = nz
        for code in nz[::-1]:
            if (code & 3) == KIND_NODE:
                k = int(code) >> 2
                if not seen[k]:
                    seen[k] = True
                    stack.append(k)

    span = np.zeros(u, dtype=np.int64)
    for r in reversed(order_found):
        n_leaf = sum(1 for c in kids[r] if (c & 3) == KIND_LEAF)
        n_sub = sum(
            int(span[c >> 2]) for c in kids[r] if (c & 3) == KIND_NODE
        )
        span[r] = 1 + n_leaf + n_sub

    if span[0] <= budget:
        return table, leaf_perm

    # Only children SMALL relative to the budget join groups: measured at
    # 1.9M tris (224k rows, natural treelets ~7k ≈ budget), grouping the
    # near-budget siblings REGRESSED the phased traversal (frame 0.79 ->
    # 0.47 Mrays/s vs plain 0.68 — deeper round stacks, no fewer rounds);
    # the quantization failure grouping exists to fix only appears when
    # children run ~budget/arity (10M tris: ~1.3k-row treelets, rays cross
    # tens of them).
    member_max = budget // int(os.environ.get("FOVTPU_TGROUP_DIV", "4"))

    # group pass over every TOP node (span > budget): greedy first-fit over
    # slot order; groups need >= 2 members to pay for their extra row
    new_rows: list[np.ndarray] = []  # full-width f32 rows
    for r in order_found:
        if span[r] <= budget:
            continue
        row_codes = codes_all[r]
        small = [
            s for s in range(arity)
            if row_codes[s] != EMPTY
            and (row_codes[s] & 3) == KIND_NODE
            and span[row_codes[s] >> 2] <= member_max
        ]
        groups: list[list[int]] = []
        cur: list[int] = []
        cur_span = 1  # the group row itself
        for s in small:
            sp = int(span[row_codes[s] >> 2])
            if cur and (cur_span + sp > budget or len(cur) == arity):
                groups.append(cur)
                cur, cur_span = [], 1
            cur.append(s)
            cur_span += sp
        if cur:
            groups.append(cur)
        for g in groups:
            if len(g) < 2:
                continue
            grow = np.zeros((table.shape[1],), dtype=np.float32)
            gu = grow[: 4 * arity].view(np.uint32)
            gu[: 3 * arity] = _EMPTY_BOX_PAIR
            lo_u = np.full(3, np.uint32(0x7F800000))  # +inf
            hi_u = np.full(3, np.uint32(0xFF800000))  # -inf
            tu = table[r, : 4 * arity].view(np.uint32)
            for j, s in enumerate(g):
                for a in range(3):
                    p = tu[3 * s + a]
                    mlo = p & np.uint32(0xFFFF0000)
                    mhi = p << np.uint32(16)
                    if mlo.view(np.float32) < lo_u[a].view(np.float32):
                        lo_u[a] = mlo
                    if mhi.view(np.float32) > hi_u[a].view(np.float32):
                        hi_u[a] = mhi
                    gu[3 * j + a] = p
                gu[3 * arity + j] = tu[3 * arity + s]
            # parent: first member slot becomes the group node; the group
            # box is the exact bf16 union (still conservative)
            s0 = g[0]
            new_id = u + len(new_rows)
            for a in range(3):
                tu[3 * s0 + a] = (lo_u[a] & np.uint32(0xFFFF0000)) | (
                    hi_u[a] >> np.uint32(16)
                )
            codes_all[r, s0] = np.int32((new_id << 2) | KIND_NODE)
            for s in g[1:]:
                codes_all[r, s] = EMPTY
                for a in range(3):
                    tu[3 * s + a] = _EMPTY_BOX_PAIR
            new_rows.append(grow)

    if not new_rows:
        return table, leaf_perm
    table2 = np.vstack([table, np.stack(new_rows, axis=0)])
    pad = np.full((len(new_rows), leaf_perm.shape[1]), -1, dtype=np.int32)
    return table2, np.vstack([leaf_perm, pad])


def treelet_permute_host(
    table: np.ndarray, leaf_perm: np.ndarray, arity: int, budget: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """Permute a packed single-level table into the TREELET layout the
    deep-scene phased traversal wants (ops/traverse8.closest_hit_treelet):

      rows [0, top_rows)  — the tree's TOP: every node whose subtree spans
                            more than ``budget`` rows, plus the leaf rows
                            those nodes own directly. The top is gathered
                            from a static VMEM-resident slice.
      rows [top_rows, U)  — bottom treelets (subtree span <= budget rows),
                            each DFS-interleaved-contiguous, laid out in the
                            top's DFS encounter order. A lane traversing one
                            treelet stays inside a ``budget``-row band, so
                            the windowed gather serves whole row-sorted
                            chunks from one dynamic_slice window.

    Same bit-exactness argument as dfs_permute_host (pure row permutation +
    child-code rewrite). Returns (table, leaf_perm, perm, top_rows,
    top_stack, treelet_stack, full_stack) — top_stack is the exact
    worst-case stack occupancy of a top-only walk (treelet children
    diverted, not pushed); treelet_stack the max occupancy of any single
    treelet subtree walk; full_stack the exact whole-tree bound (needed by
    the plain-traversal fallback — group_small_siblings_host may have
    changed the topology since pack_region_into's bound was computed)."""
    u = table.shape[0]
    codes_all = table[:, 3 * arity : 4 * arity].view(np.int32)

    # pass 1: discover node rows + per-node children via DFS from the root
    kids_node: dict[int, np.ndarray] = {}
    kids_leaf: dict[int, np.ndarray] = {}
    order_found: list[int] = []
    stack = [0]
    seen = np.zeros(u, dtype=bool)
    seen[0] = True
    while stack:
        r = stack.pop()
        order_found.append(r)
        c = codes_all[r]
        nz = c[c != EMPTY]
        kinds = nz & 3
        rows = (nz >> 2).astype(np.int64)
        kn = rows[kinds == KIND_NODE]
        kids_node[r] = kn
        kids_leaf[r] = rows[kinds == KIND_LEAF]
        for k in kn[::-1]:
            if not seen[k]:
                seen[k] = True
                stack.append(int(k))

    # pass 2: subtree ROW spans, children before parents (reverse DFS order)
    span = np.zeros(u, dtype=np.int64)
    for r in reversed(order_found):
        span[r] = 1 + len(kids_leaf[r]) + int(span[kids_node[r]].sum())

    # exact whole-tree LIFO bound on THIS topology (see lifo_stack_bound)
    gf: dict[int, int] = {}
    for r in reversed(order_found):
        c = len(kids_node[r]) + len(kids_leaf[r])
        sub = max([gf[int(k)] for k in kids_node[r]], default=0)
        gf[r] = c - 1 + max(1, sub)
    full_stack = max(1, gf.get(0, 1))

    if span[0] <= budget:  # tiny tree: no top/bottom split to make
        nt, nl, perm = dfs_permute_host(table, leaf_perm, arity)
        return nt, nl, perm, 0, 0, 0, full_stack

    # pass 3: top DFS — assign top rows, collect treelet roots in encounter
    # order; then each treelet DFS-interleaved
    perm = np.full(u, -1, dtype=np.int64)
    cursor = 0
    treelet_roots: list[int] = []
    stack = [0]
    while stack:
        r = stack.pop()
        if perm[r] >= 0:
            continue
        perm[r] = cursor
        cursor += 1
        for lr in kids_leaf[r]:
            if perm[lr] < 0:
                perm[lr] = cursor
                cursor += 1
        big = [int(k) for k in kids_node[r] if span[k] > budget]
        treelet_roots.extend(
            int(k) for k in kids_node[r] if span[k] <= budget
        )
        for k in big[::-1]:
            stack.append(k)
    top_rows = cursor

    for root in treelet_roots:
        stack = [root]
        while stack:
            r = stack.pop()
            if perm[r] >= 0:
                continue
            perm[r] = cursor
            cursor += 1
            for lr in kids_leaf[r]:
                if perm[lr] < 0:
                    perm[lr] = cursor
                    cursor += 1
            for k in kids_node[r][::-1]:
                if perm[k] < 0:
                    stack.append(int(k))
    unreached = np.nonzero(perm < 0)[0]
    perm[unreached] = cursor + np.arange(len(unreached))

    new_table = np.empty_like(table)
    new_table[perm] = table
    new_leaf_perm = np.empty_like(leaf_perm)
    new_leaf_perm[perm] = leaf_perm
    nodes_old = np.asarray(order_found, dtype=np.int64)
    oc = codes_all[nodes_old]
    nc = np.where(
        oc == EMPTY, EMPTY,
        ((perm[oc >> 2] << 2) | (oc & 3)).astype(np.int32),
    ).astype(np.int32)
    new_table[perm[nodes_old], 3 * arity : 4 * arity] = nc.view(np.float32)

    # exact top-only LIFO stack bound (see lifo_stack_bound): pushed
    # children of a top node = its top-node children + its own leaf rows;
    # treelet-root children are diverted, not pushed
    g: dict[int, int] = {}
    top_nodes = [r for r in order_found if span[r] > budget]
    for r in reversed(top_nodes):
        kids_top = [int(k) for k in kids_node[r] if span[k] > budget]
        c = len(kids_top) + len(kids_leaf[r])
        sub = max([g[k] for k in kids_top], default=0)
        g[r] = c - 1 + max(1, sub)
    top_stack = max(1, g.get(0, 1)) + 1

    # exact per-treelet LIFO bound (children before parents in reverse DFS)
    gt: dict[int, int] = {}
    for r in reversed(order_found):
        if span[r] > budget:
            continue
        kids = [int(k) for k in kids_node[r]]
        c = len(kids) + len(kids_leaf[r])
        sub = max([gt[k] for k in kids], default=0)
        gt[r] = c - 1 + max(1, sub)
    treelet_stack = max(
        [gt[r] for r in treelet_roots], default=1
    ) + 1
    return (new_table, new_leaf_perm, perm, int(top_rows), int(top_stack),
            int(treelet_stack), int(full_stack))


def pack_wide(boxes: np.ndarray, meta: np.ndarray, tris: np.ndarray,
              order_slots: np.ndarray, leaf_size: int,
              arity: int | None = None, dfs: bool = False,
              treelet_budget: int = 0) -> WideBVH:
    """Pack (M,A,6) boxes + (M,A,2) meta + leaf slot permutation into the
    packed gather-friendly WideBVH layout (see pack_region_into for the
    ``meta``/``order_slots`` conventions). ``dfs=True`` applies the
    DFS-interleaved row order (dfs_permute_host) before upload;
    ``treelet_budget > 0`` applies the treelet layout instead
    (treelet_permute_host)."""
    m, a_width = boxes.shape[0], boxes.shape[1]
    arity = a_width if arity is None else arity
    assert a_width == arity
    num_leaves = max(int((meta[..., 1] > 0).sum()), 1)
    u = m + num_leaves
    width = max(4 * arity, 10 * leaf_size)

    table = np.zeros((u, width), dtype=np.float32)
    table[:, 9 * leaf_size : 10 * leaf_size] = np.float32(
        np.int32(-1).view(np.float32)
    )
    leaf_perm = np.full((u, leaf_size), -1, dtype=np.int32)
    _, entry = pack_region_into(
        table, leaf_perm, 0, 0, boxes, meta, tris, order_slots,
        leaf_size, arity,
    )

    # exact worst-case occupancy (adversarial pop order) + 1 safety row —
    # typically far below the full-tree closed form (arity-1)*height+2
    stack_depth = lifo_stack_bound(entry) + 1

    top_rows = 0
    top_stack = 0
    treelet_stack = 0
    if treelet_budget > 0:
        # fill treelets to the budget regardless of scene scale (see
        # group_small_siblings_host) before the top/bottom layout; the
        # grouped topology's exact full-tree bound replaces the
        # pre-grouping one (the plain fallback traversal uses it).
        # FOVTPU_TGROUP=0 disables grouping (A/B escape hatch).
        if os.environ.get("FOVTPU_TGROUP", "1") != "0":
            table, leaf_perm = group_small_siblings_host(
                table, leaf_perm, arity, treelet_budget
            )
        (table, leaf_perm, _, top_rows, top_stack,
         treelet_stack, full_stack) = treelet_permute_host(
            table, leaf_perm, arity, treelet_budget
        )
        stack_depth = full_stack + 1
        dfs = True
    elif dfs:
        table, leaf_perm, _ = dfs_permute_host(table, leaf_perm, arity)

    top_np = table[:top_rows].copy() if top_rows else None
    dev = jax.device_put((table, leaf_perm, top_np))  # one batched upload
    return WideBVH(
        table=dev[0],
        leaf_perm=dev[1],
        top_table=dev[2],
        leaf_size=leaf_size,
        arity=arity,
        packed=True,
        stack_depth=stack_depth,
        dfs=dfs,
        top_rows=top_rows,
        top_stack=top_stack,
        treelet_stack=treelet_stack,
    )


def lifo_stack_bound(entry: np.ndarray, row0: int = 0) -> int:
    """EXACT worst-case traversal stack occupancy for the wide tree whose
    node rows carry child codes ``entry`` (M, A).

    The traversal pops one entry and pushes all non-EMPTY children of an
    internal node, so occupancy peaks right after a push: base + c(v), and
    descending into child u leaves base + c(v) - 1 behind. Worst case over
    (adversarial) pop orders is popping the deepest child first:

        g(v) = c(v) - 1 + max(1, max over internal children u of g(u))

    and the answer is max(1, g(root)). The closed-form (arity-1)*height+2
    is this bound for a FULL tree — real trees thin out near the leaves,
    so the exact bound is typically ~30-50% smaller (fewer one-hot rows in
    every push/pop of ops/traverse8.py, whose stack selects are ~16% of
    frame time at depth 62).

    ``entry`` ucodes: (row << 2) | kind — kind 0 internal at absolute row
    (row - row0 is the local node index), 1 leaf, 2 instance (occupies a
    slot but contributes no subtree here — ops/tlas.py accounts for the
    BLAS separately); EMPTY = 0.
    """
    m = entry.shape[0]
    if m == 0:
        return 1
    internal = (entry != EMPTY) & ((entry & 3) == KIND_NODE)
    child_local = np.where(internal, (entry >> 2) - row0, 0).astype(np.int64)
    valid = internal & (child_local >= 0) & (child_local < m)
    c = (entry != EMPTY).sum(axis=1).astype(np.int64)  # slots pushed
    # BFS levels from the root, then a reverse-level bottom-up pass
    levels = []
    frontier = np.asarray([0], dtype=np.int64)
    seen = np.zeros(m, dtype=bool)
    seen[0] = True
    while frontier.size:
        levels.append(frontier)
        kids = child_local[frontier]
        k = kids[valid[frontier]]
        k = k[~seen[k]]
        if k.size:
            k = np.unique(k)
        seen[k] = True
        frontier = k
    g = np.zeros(m, dtype=np.int64)
    for lvl in reversed(levels):
        kid_g = np.where(valid[lvl], g[child_local[lvl]], 0)  # (F, A)
        g[lvl] = c[lvl] - 1 + np.maximum(1, kid_g.max(axis=1))
    return int(max(1, g[0]))


def _surface_area(lo, hi):
    d = np.maximum(hi - lo, 0.0)
    return 2.0 * (d[0] * d[1] + d[1] * d[2] + d[2] * d[0])


def collapse_bvh2(tris: np.ndarray, leaf_size: int, arity: int):
    """Build a BVH2 and collapse it to branching factor ``arity`` with leaf
    MERGING: sibling BVH2 leaves inside a wide node are bin-packed
    (first-fit decreasing) into shared slots of up to leaf_size triangles, so
    packed leaf rows run full and the expansion absorbs more internals.

    Returns (boxes (M,A,6), meta (M,A,2) [a, count], order_slots) in the
    pack_wide input convention. Pure-Python mirror of the native builder.
    """
    nodes, order = build_bvh2(tris, leaf_size)

    wide_slots: list[list] = []  # per wide node: list of slot records
    wide_index: dict[int, int] = {}

    def slots_needed(group):
        internals = sum(1 for c in group if nodes[c].count == 0)
        leaf_counts = sorted(
            (nodes[c].count for c in group if nodes[c].count > 0),
            reverse=True,
        )
        bins: list[int] = []
        for lc in leaf_counts:
            for i, b in enumerate(bins):
                if b + lc <= leaf_size:
                    bins[i] += lc
                    break
            else:
                bins.append(lc)
        return internals + len(bins)

    def make_wide(b2: int) -> int:
        n = nodes[b2]
        group = [n.left, n.right] if n.count == 0 else [b2]
        while True:
            best, best_sa = -1, -1.0
            for i, c in enumerate(group):
                cn = nodes[c]
                if cn.count == 0:
                    sa = _surface_area(cn.lo, cn.hi)
                    if sa > best_sa:
                        best, best_sa = i, sa
            if best < 0:
                break
            cn = nodes[group[best]]
            trial = group[:best] + [cn.left, cn.right] + group[best + 1 :]
            if slots_needed(trial) > arity:
                break
            group = trial
        # slot records: ("i", b2) internal | ("l", [leaf ids]) merged leaves
        slots = [("i", c) for c in group if nodes[c].count == 0]
        leaf_ids = sorted(
            (c for c in group if nodes[c].count > 0),
            key=lambda c: -nodes[c].count,
        )
        bin_fill: list[int] = []
        bin_slot: list[int] = []
        for lid in leaf_ids:
            lc = nodes[lid].count
            for k in range(len(bin_fill)):
                if bin_fill[k] + lc <= leaf_size:
                    bin_fill[k] += lc
                    slots[bin_slot[k]][1].append(lid)
                    break
            else:
                bin_fill.append(lc)
                bin_slot.append(len(slots))
                slots.append(("l", [lid]))
        wide_slots.append(slots)
        wide_index[b2] = len(wide_slots) - 1
        return wide_index[b2]

    root = make_wide(0)
    queue = [root]
    while queue:
        w = queue.pop()
        for kind, payload in wide_slots[w]:
            if kind == "i" and payload not in wide_index:
                make_wide(payload)
                queue.append(wide_index[payload])

    m = len(wide_slots)
    boxes = np.zeros((m, arity, 6), dtype=np.float32)
    boxes[..., 0:3] = np.inf
    boxes[..., 3:6] = -np.inf
    meta = np.full((m, arity, 2), [0, -1], dtype=np.int32)

    total = int(
        sum(
            nodes[lid].count
            for g in wide_slots
            for kind, payload in g
            if kind == "l"
            for lid in payload
        )
    )
    total = max(total, 1)
    order_slots = np.full(total, -1, dtype=np.int64)
    cursor = 0
    for w, group in enumerate(wide_slots):
        for s, (kind, payload) in enumerate(group):
            if kind == "i":
                cn = nodes[payload]
                boxes[w, s, 0:3] = cn.lo
                boxes[w, s, 3:6] = cn.hi
                meta[w, s] = (wide_index[payload], 0)
            else:
                cnt = 0
                lo = np.full(3, np.inf, dtype=np.float32)
                hi = np.full(3, -np.inf, dtype=np.float32)
                start = cursor
                for lid in payload:
                    cn = nodes[lid]
                    lo = np.minimum(lo, cn.lo)
                    hi = np.maximum(hi, cn.hi)
                    ids = order[cn.start : cn.start + cn.count]
                    order_slots[cursor : cursor + cn.count] = ids
                    cursor += cn.count
                    cnt += cn.count
                boxes[w, s, 0:3] = lo
                boxes[w, s, 3:6] = hi
                meta[w, s] = (start, cnt)

    return boxes, meta, order_slots


def build(tris: np.ndarray, leaf_size: int = LEAF_SIZE,
          arity: int = ARITY, dfs: bool = False,
          treelet_budget: int = 0) -> WideBVH:
    """Build the packed wide BVH from (T, 3, 3) triangle corners (Python
    collapse; prefer ops/bvh_native.build which uses the C++ builder)."""
    boxes, meta, order_slots = collapse_bvh2(tris, leaf_size, arity)
    return pack_wide(boxes, meta, tris, order_slots, leaf_size, arity,
                     dfs=dfs, treelet_budget=treelet_budget)


# --------------------------------------------------------------------------
# Legacy round-1 format (8-wide, full-f32 boxes, [a, kind] meta) — still used
# by the experimental Pallas packet kernels (ops/pallas_traverse.py,
# ops/traverse_packet.py).
# --------------------------------------------------------------------------


def pack_wide_legacy8(boxes: np.ndarray, meta: np.ndarray, tris: np.ndarray,
                      order_slots: np.ndarray, leaf_size: int) -> WideBVH:
    """Round-1 layout: 8 children x [lo3, hi3] f32 (48 cols) then 8 x
    [a, kind] i32 bitcast (16 cols); kind: 0 internal, 1 leaf, -1 empty."""
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
        p = tris[safe]
        v0 = p[:, :, 0]
        e1 = p[:, :, 1] - v0
        e2 = p[:, :, 2] - v0
        packed = np.concatenate([v0, e1, e2], axis=-1)
        packed[~valid] = 0.0
        table[m:, : 9 * leaf_size] = packed.reshape(len(lw), 9 * leaf_size)
        leaf_perm[m:] = tid.astype(np.int32)
        new_a[lw, ls] = m + np.arange(len(lw), dtype=np.int32)

    meta_packed = np.zeros((m, 8, 2), dtype=np.int32)
    meta_packed[..., 0] = new_a
    meta_packed[..., 1] = new_kind
    table[:m, :48] = boxes.reshape(m, 48)
    table[:m, 48:64] = meta_packed.reshape(m, 16).view(np.float32)

    height = 0
    frontier = np.asarray([0], dtype=np.int64)
    while frontier.size:
        kids = new_a[frontier]
        internal = new_kind[frontier] == 0
        frontier = kids[internal].astype(np.int64)
        height += 1
        if height > 64:
            break
    stack_depth = (8 - 1) * height + 2

    dev = jax.device_put((table, leaf_perm))
    return WideBVH(
        table=dev[0],
        leaf_perm=dev[1],
        leaf_size=leaf_size,
        arity=8,
        packed=False,
        stack_depth=stack_depth,
    )


def build_legacy8(tris: np.ndarray, leaf_size: int = LEAF_SIZE8) -> WideBVH:
    """Build the legacy 8-wide f32 BVH (Pallas experiment format)."""
    boxes, meta, order_slots = collapse_bvh2(tris, leaf_size, 8)
    return pack_wide_legacy8(boxes, meta, tris, order_slots, leaf_size)
