"""Scene instancing: unique object-space meshes + an instance table.

Twin of the SDK scene framework's two-level acceleration layout
(sutil/Scene.h:113-115: one GAS per mesh + a top-level IAS of [transform,
mesh] instances). On TPU the render-time structure stays a single
world-space pool (one wide BVH — a TLAS/BLAS split would put a transform
and a second pointer chase in the traversal inner loop), so the instance
layer lives ahead of it: unique geometry is stored ONCE, the instance table
carries (mesh ids, 4x4 transform) rows, and ``flatten()`` expands to the
world-space HostMesh list that ``build_scene`` consumes. Editing a
transform and re-flattening is the IAS-rebuild analog (the GAS-equivalent
vertex data is untouched and shared).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np

from fovpathtracing_optixcodelatest_tpu.models.mesh import HostMesh


def transform_mesh(mesh: HostMesh, world: np.ndarray) -> HostMesh:
    """Apply a 4x4 affine transform: positions by the matrix, normals by the
    inverse-transpose (renormalized) — Scene.cpp processGLTFNode semantics."""
    world = np.asarray(world, dtype=np.float64)
    rot = world[:3, :3]
    pos = mesh.vertex.astype(np.float64) @ rot.T + world[:3, 3]
    normal = None
    if mesh.normal is not None:
        nrm_mat = np.linalg.inv(rot).T
        normal = mesh.normal.astype(np.float64) @ nrm_mat.T
        norms = np.linalg.norm(normal, axis=1, keepdims=True)
        normal = (normal / np.maximum(norms, 1e-12)).astype(np.float32)
    return dataclasses.replace(
        mesh, vertex=pos.astype(np.float32), normal=normal
    )


@dataclasses.dataclass(frozen=True)
class Instance:
    """One IAS row: which unique meshes, placed where."""

    mesh_ids: Tuple[int, ...]
    transform: np.ndarray  # (4, 4)


@dataclasses.dataclass
class InstancedScene:
    """Unique meshes + instance table + shared textures."""

    unique: List[HostMesh]
    instances: List[Instance]
    textures: List[np.ndarray]

    @property
    def num_unique_triangles(self) -> int:
        return sum(len(m.index) for m in self.unique)

    @property
    def num_world_triangles(self) -> int:
        return sum(
            len(self.unique[mid].index)
            for inst in self.instances
            for mid in inst.mesh_ids
        )

    def flatten(self) -> List[HostMesh]:
        """Expand to the world-space mesh list build_scene consumes."""
        out: List[HostMesh] = []
        for inst in self.instances:
            for mid in inst.mesh_ids:
                out.append(transform_mesh(self.unique[mid], inst.transform))
        return out

    def replace_transform(self, index: int, transform: np.ndarray) -> None:
        """Edit one instance's placement (the IAS-update analog)."""
        inst = self.instances[index]
        self.instances[index] = Instance(
            mesh_ids=inst.mesh_ids,
            transform=np.asarray(transform, dtype=np.float64),
        )


def instanced(
    unique: Sequence[HostMesh],
    placements: Sequence[Tuple[int, np.ndarray]],
    textures: Optional[Sequence[np.ndarray]] = None,
) -> InstancedScene:
    """Convenience constructor: each placement is (unique mesh id, 4x4)."""
    return InstancedScene(
        unique=list(unique),
        instances=[
            Instance(mesh_ids=(mid,), transform=np.asarray(m, np.float64))
            for mid, m in placements
        ],
        textures=list(textures or []),
    )
