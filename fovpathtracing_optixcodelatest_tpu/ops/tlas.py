"""Two-level acceleration structure: TLAS over instances + shared BLAS
forests — render-time instancing.

Twin of the SDK scene framework's IAS/GAS split (sutil/Scene.h:113-115: one
GAS per unique mesh, a top-level IAS of [transform, mesh] instances) — device
memory scales with UNIQUE geometry, not world triangles. Round 2's
``models/instance.py flatten()`` expanded instances host-side, so a
1000-instance scene stored 1000 copies; this module packs everything into the
ONE unified row table the traversal gathers from (ops/traverse8.py):

  rows [0, inst_base)        TLAS node rows (bf16 child boxes of instance
                             WORLD AABBs; child entries are either TLAS rows
                             or instance ucodes (instance_id << 2) | 2)
  rows [inst_base, blas_base) instance rows: 13 f32 =
                             [bitcast(blas_root_code), A (3x3 row-major),
                              b (3)] where x_object = A @ x_world + b is the
                             INVERSE instance transform
  rows [blas_base, U)        per-unique-mesh BLAS regions (node rows + leaf
                             rows, exact pack_wide layout, row/tri offsets
                             pre-applied to every entry code)

Traversal (traverse8 with ``bvh.instanced``): popping an instance code
switches the lane into that instance's object space (ray transformed by the
row's A/b; direction left UNNORMALIZED so t stays world-scale) and pushes the
BLAS root. Stack discipline guarantees at most one instance's BLAS rows are
on a lane's stack at any time, so a single per-lane ``cur`` register replaces
an instance stack.

Known limitation (documented): occlusion-ray back-face culling tests the
OBJECT-space winding, so mirroring (negative-determinant) instance
transforms flip it — same caveat as compile-time flipped windings in the
reference's OBJ path.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import numpy as np

from fovpathtracing_optixcodelatest_tpu.ops import bvh8 as bvh8_py
from fovpathtracing_optixcodelatest_tpu.ops.bvh8 import (
    ARITY,
    EMPTY,
    KIND_INST,
    KIND_NODE,
    LEAF_SIZE,
    WideBVH,
    pack_boxes_into,
    pack_region_into,
)
from fovpathtracing_optixcodelatest_tpu.ops.bvh_native import collapse_native


def _collapse(tris: np.ndarray, leaf_size: int, arity: int):
    out = collapse_native(tris, leaf_size, arity)
    if out is None:
        out = bvh8_py.collapse_bvh2(tris, leaf_size, arity)
    return out


def _stack_depth_of(entry: np.ndarray, arity: int) -> int:
    """Exact worst-case TLAS stack occupancy (bvh8.lifo_stack_bound;
    instance codes occupy slots but have no subtree here)."""
    return bvh8_py.lifo_stack_bound(entry)


def build_instanced(
    unique_tris: Sequence[np.ndarray],
    mesh_of_instance: Sequence[int],
    transforms: Sequence[np.ndarray],
    leaf_size: int = LEAF_SIZE,
    arity: int = ARITY,
) -> WideBVH:
    """Build the two-level table.

    ``unique_tris``: per unique mesh, (T_i, 3, 3) OBJECT-space triangle
    corners (triangle ids in the combined space are offset by the cumulative
    count, matching ``flatten_meshes(unique)`` order).
    ``mesh_of_instance[i]`` / ``transforms[i]``: each instance's mesh and its
    4x4 object->world matrix.
    """
    n_mesh = len(unique_tris)
    n_inst = len(mesh_of_instance)
    assert n_inst >= 1 and n_mesh >= 1
    assert len(transforms) == n_inst

    # ---- per-mesh BLAS collapse + object bounds -------------------------
    blas = [_collapse(np.asarray(t, np.float32), leaf_size, arity)
            for t in unique_tris]
    obj_lo = [np.asarray(t, np.float32).reshape(-1, 3).min(0)
              for t in unique_tris]
    obj_hi = [np.asarray(t, np.float32).reshape(-1, 3).max(0)
              for t in unique_tris]

    # ---- instance world boxes -> TLAS over them -------------------------
    world_boxes = np.zeros((n_inst, 6), dtype=np.float32)
    inv_a = np.zeros((n_inst, 3, 3), dtype=np.float32)
    inv_b = np.zeros((n_inst, 3), dtype=np.float32)
    for i, (mid, mtx) in enumerate(zip(mesh_of_instance, transforms)):
        m4 = np.asarray(mtx, dtype=np.float64)
        lo, hi = obj_lo[mid], obj_hi[mid]
        cs = np.array([
            [x, y, z]
            for x in (lo[0], hi[0])
            for y in (lo[1], hi[1])
            for z in (lo[2], hi[2])
        ])
        wc = cs @ m4[:3, :3].T + m4[:3, 3]
        world_boxes[i, 0:3] = wc.min(0)
        world_boxes[i, 3:6] = wc.max(0)
        a = np.linalg.inv(m4[:3, :3])
        inv_a[i] = a.astype(np.float32)
        inv_b[i] = (-a @ m4[:3, 3]).astype(np.float32)

    # TLAS build: synthesize one degenerate triangle per instance whose bbox
    # and centroid equal the instance's world box (the BVH2 builder only
    # reads bounds/centroids); leaf_size=1 keeps one instance per slot
    fake = np.stack(
        [world_boxes[:, 0:3], world_boxes[:, 3:6],
         0.5 * (world_boxes[:, 0:3] + world_boxes[:, 3:6])],
        axis=1,
    ).astype(np.float32)
    t_boxes, t_meta, t_order = _collapse(fake, 1, arity)
    mt = t_boxes.shape[0]

    # ---- layout ----------------------------------------------------------
    width = max(4 * arity, 10 * leaf_size, 13)
    inst_base = mt
    blas_base = mt + n_inst
    blas_rows = []
    off = blas_base
    tri_base = 0
    for (boxes, meta, order), t in zip(blas, unique_tris):
        m = boxes.shape[0]
        counts = meta[..., 1]
        n_leaf_rows = int((counts > 0).sum())
        blas_rows.append((off, tri_base))
        off += m + n_leaf_rows
        tri_base += len(t)
    u = off

    table = np.zeros((u, width), dtype=np.float32)
    leaf_perm = np.full((u, leaf_size), -1, dtype=np.int32)

    # TLAS node rows: internal -> TLAS row, leaf slot -> instance code
    t_counts = t_meta[..., 1]
    t_avals = t_meta[..., 0]
    t_entry = np.full((mt, arity), EMPTY, dtype=np.int32)
    t_entry[t_counts == 0] = (t_avals[t_counts == 0] << 2) | KIND_NODE
    lw, ls = np.nonzero(t_counts > 0)
    inst_ids = t_order[
        np.clip(t_avals[lw, ls].astype(np.int64), 0, max(len(t_order) - 1, 0))
    ].astype(np.int32)
    t_entry[lw, ls] = (inst_ids << 2) | KIND_INST
    pack_boxes_into(table, 0, t_boxes, t_entry, arity)

    # instance rows
    max_blas_sd = 2
    for i, mid in enumerate(mesh_of_instance):
        root_code = (blas_rows[mid][0] << 2) | KIND_NODE  # BLAS root ucode
        row = np.zeros(width, dtype=np.float32)
        row[0] = np.int32(root_code).view(np.float32)
        row[1:10] = inv_a[i].reshape(9)
        row[10:13] = inv_b[i]
        table[inst_base + i] = row

    # BLAS regions
    for (boxes, meta, order), t, (row0, tb) in zip(
        blas, unique_tris, blas_rows
    ):
        _, ent = pack_region_into(
            table, leaf_perm, row0, tb, boxes, meta,
            np.asarray(t, np.float32), order, leaf_size, arity,
        )
        max_blas_sd = max(
            max_blas_sd, _stack_depth_of_region(ent, arity, row0)
        )

    # exact combined bound: when a lane is inside a BLAS, the TLAS residue
    # on its stack is at most (g_tlas - 1) — the instance entry was popped
    # before the BLAS root was pushed — and the BLAS peak adds g_blas.
    # +1 safety row.
    tlas_sd = _stack_depth_of(t_entry, arity)
    stack_depth = max(tlas_sd, tlas_sd - 1 + max_blas_sd) + 1

    dev = jax.device_put((table, leaf_perm))
    return WideBVH(
        table=dev[0],
        leaf_perm=dev[1],
        leaf_size=leaf_size,
        arity=arity,
        packed=True,
        stack_depth=stack_depth,
        num_instances=n_inst,
        inst_base=inst_base,
        blas_base=blas_base,
    )


def _stack_depth_of_region(entry: np.ndarray, arity: int, row0: int) -> int:
    """Exact worst-case stack occupancy of one BLAS region whose internal
    codes are absolute row ids starting at row0 (bvh8.lifo_stack_bound)."""
    return bvh8_py.lifo_stack_bound(entry, row0=row0)


def scene_tables_from_instanced(instanced_scene) -> tuple:
    """(unique_tris list, mesh ids, transforms) from a models/instance.py
    InstancedScene — instances with multiple mesh_ids expand to one instance
    per (mesh, transform) pair."""
    from fovpathtracing_optixcodelatest_tpu.models.mesh import host_triangles

    unique_tris = [host_triangles([m]) for m in instanced_scene.unique]
    mesh_ids: List[int] = []
    mats: List[np.ndarray] = []
    for inst in instanced_scene.instances:
        for mid in inst.mesh_ids:
            mesh_ids.append(mid)
            mats.append(np.asarray(inst.transform, dtype=np.float64))
    return unique_tris, mesh_ids, mats
