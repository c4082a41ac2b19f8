"""Triangle meshes and the flattened device scene.

The reference keeps one ``TriangleMesh`` per (shape × material) with its own
vertex/index/normal/texcoord CUDA buffers plus one SBT hit-group record per
mesh×raytype (Model.h:10-20, SimplePathtracer.cpp:571-634). On TPU there is no
SBT dispatch: the whole scene flattens into single global SoA arrays, with
per-triangle material/texture ids replacing the SBT record lookup. Triangles are
stored as (v0, e1, e2) so the intersector needs one gather per triangle id.

Procedural geometry (``make_box`` twin: Model.cpp:219-291 addBox) and simple
generators live here too, since no model assets ship with the reference.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from fovpathtracing_optixcodelatest_tpu.models.material import Material, MaterialTable


@dataclasses.dataclass
class HostMesh:
    """One mesh on the host: the Model.h TriangleMesh twin (numpy)."""

    vertex: np.ndarray  # (V, 3) float32
    index: np.ndarray  # (F, 3) int32
    normal: Optional[np.ndarray] = None  # (V, 3) float32 or None
    texcoord: Optional[np.ndarray] = None  # (V, 2) float32 or None
    material: Material = dataclasses.field(default_factory=Material)
    diffuse_texture_id: int = -1  # index into the scene's texture list, -1 = none

    @property
    def num_triangles(self) -> int:
        return int(self.index.shape[0])


def make_box(pos, extent, material: Material, texture_id: int = -1) -> HostMesh:
    """Axis-aligned box: 8 corners, 12 triangles, 36 unshared vertices with
    per-face normals — same topology and winding as Model.cpp addBox:219-291."""
    px, py, pz = pos
    ex, ey, ez = extent
    A = (-ex + px, -ey + py, ez + pz)
    B = (ex + px, -ey + py, ez + pz)
    C = (ex + px, ey + py, ez + pz)
    D = (-ex + px, ey + py, ez + pz)
    E = (-ex + px, -ey + py, -ez + pz)
    F = (ex + px, -ey + py, -ez + pz)
    G = (ex + px, ey + py, -ez + pz)
    H = (-ex + px, ey + py, -ez + pz)
    verts = [
        A, B, C, A, C, D,  # front (+z)
        E, H, G, E, G, F,  # back (-z)
        E, A, D, E, D, H,  # left (-x)
        B, F, G, B, G, C,  # right (+x)
        D, C, G, D, G, H,  # top (+y)
        E, A, B, E, B, F,  # bottom (-y)
    ]
    face_normals = [
        (0, 0, 1), (0, 0, -1), (-1, 0, 0), (1, 0, 0), (0, 1, 0), (0, -1, 0)
    ]
    normals = np.repeat(np.asarray(face_normals, dtype=np.float32), 6, axis=0)
    vertex = np.asarray(verts, dtype=np.float32)
    index = np.arange(36, dtype=np.int32).reshape(12, 3)
    texcoord = np.zeros((36, 2), dtype=np.float32)
    return HostMesh(
        vertex=vertex,
        index=index,
        normal=normals,
        texcoord=texcoord,
        material=material,
        diffuse_texture_id=texture_id,
    )


def make_quad(p0, p1, p2, p3, material: Material, texture_id: int = -1) -> HostMesh:
    """Two-triangle quad p0→p1→p2→p3 (counter-clockwise) with unit texcoords."""
    vertex = np.asarray([p0, p1, p2, p3], dtype=np.float32)
    index = np.asarray([[0, 1, 2], [0, 2, 3]], dtype=np.int32)
    n = np.cross(vertex[1] - vertex[0], vertex[2] - vertex[0])
    n = n / max(np.linalg.norm(n), 1e-12)
    normal = np.tile(n.astype(np.float32), (4, 1))
    texcoord = np.asarray([[0, 0], [1, 0], [1, 1], [0, 1]], dtype=np.float32)
    return HostMesh(vertex=vertex, index=index, normal=normal, texcoord=texcoord,
                    material=material, diffuse_texture_id=texture_id)


def make_icosphere(center, radius, subdivisions: int, material: Material) -> HostMesh:
    """Subdivided icosahedron (smooth normals). Handy triangle-count knob for
    traversal tests/benchmarks: 20 * 4^s triangles."""
    t = (1.0 + np.sqrt(5.0)) / 2.0
    verts = np.asarray(
        [
            [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
            [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
            [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1],
        ],
        dtype=np.float64,
    )
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    faces = np.asarray(
        [
            [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
            [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
            [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
            [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
        ],
        dtype=np.int64,
    )
    for _ in range(subdivisions):
        edge_mid: dict = {}
        verts_list = list(verts)
        new_faces = []

        def midpoint(a: int, b: int) -> int:
            key = (min(a, b), max(a, b))
            if key not in edge_mid:
                m = verts_list[a] + verts_list[b]
                m = m / np.linalg.norm(m)
                edge_mid[key] = len(verts_list)
                verts_list.append(m)
            return edge_mid[key]

        for f in faces:
            a, b, c = int(f[0]), int(f[1]), int(f[2])
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            new_faces += [[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]]
        verts = np.asarray(verts_list)
        faces = np.asarray(new_faces, dtype=np.int64)
    center = np.asarray(center, dtype=np.float64)
    vertex = (center + radius * verts).astype(np.float32)
    normal = verts.astype(np.float32)
    return HostMesh(
        vertex=vertex,
        index=faces.astype(np.int32),
        normal=normal,
        texcoord=np.zeros((len(vertex), 2), dtype=np.float32),
        material=material,
    )


@dataclasses.dataclass(frozen=True)
class SceneGeometry:
    """Flattened device scene geometry: the TPU analog of the GAS build inputs +
    per-mesh SBT data (SimplePathtracer.cpp:602-746, LaunchParams.h:38-47).

    Triangles are globally indexed; ``tri_material``/``tri_texture`` replace the
    SBT hit-group record, and ``tri_n*``/``tri_uv*`` are per-corner shading
    attributes pre-gathered per triangle so the hot path needs a single
    triangle-id gather.
    """

    tri_v0: jnp.ndarray  # (T, 3)
    tri_e1: jnp.ndarray  # (T, 3)  v1 - v0
    tri_e2: jnp.ndarray  # (T, 3)  v2 - v0
    tri_n0: jnp.ndarray  # (T, 3) shading normals per corner
    tri_n1: jnp.ndarray
    tri_n2: jnp.ndarray
    tri_uv0: jnp.ndarray  # (T, 2)
    tri_uv1: jnp.ndarray
    tri_uv2: jnp.ndarray
    tri_material: jnp.ndarray  # (T,) int32
    tri_texture: jnp.ndarray  # (T,) int32, -1 = untextured
    has_shading_normals: jnp.ndarray  # (T,) bool
    # packed per-triangle attribute rows so the integrator's hit shading costs
    # ONE gather: cols [gn(3), uv0(2), uv1(2), uv2(2), mat_bits, tex_bits,
    # pad, pad] + cols 12:36 = the triangle's MaterialTable packed row (see
    # MaterialTable.packed_rows_numpy — shading reads materials with NO
    # second gather) + cols 36:45 = [v0, e1, e2] (the Möller-Trumbore inputs,
    # bit-identical to the BVH leaf packing, so shading can RECOMPUTE t/u/v
    # from tri_id instead of carrying them through the compaction sorts —
    # row gathers are width-flat on TPU, sort cost is per-operand). Keep in
    # sync with integrator.trace_paths slices.
    tri_pack: jnp.ndarray  # (T, 48) f32
    # static: any triangle references an atlas texture (tri_texture >= 0) —
    # lets the integrator compile out the texel-gather stage entirely for
    # untextured scenes (and take the fused-shading kernel path)
    has_textures: bool = True
    # static: the unpacked per-corner arrays above are (1, *) placeholders —
    # large scenes carry ONLY tri_pack on device (the path-tracing hot path
    # reads nothing else; ~108 B/tri saved, 1.1 GB at 10M tris). The oracle
    # intersector and the simple raycaster require slim=False.
    slim: bool = False
    # static: inside a shard_map whose mesh axis this names, tri_pack is a
    # LOCAL row block (global rows [d*R, (d+1)*R)) of a pack_shard_n-way
    # row split; the integrator's shading gathers become a ppermute ring
    # over the blocks (parallel/scene_shard.py — per-device tri table
    # memory = 1/D; indices are device-varying so a masked psum would mix
    # chips' lookups).
    pack_shard_axis: str | None = None
    pack_shard_n: int = 0

    @property
    def num_triangles(self) -> int:
        return self.tri_pack.shape[0]

    def geometric_normal(self, tri_ids: jnp.ndarray) -> jnp.ndarray:
        """normalize(cross(e1, e2)) — the CH program's N_0
        (deviceProgram.cu:629-632)."""
        e1 = jnp.take(self.tri_e1, tri_ids, axis=0)
        e2 = jnp.take(self.tri_e2, tri_ids, axis=0)
        n = jnp.cross(e1, e2)
        return n * jax.lax.rsqrt(
            jnp.maximum(jnp.sum(n * n, axis=-1, keepdims=True), 1e-20)
        )


jax.tree_util.register_dataclass(
    SceneGeometry,
    data_fields=[
        f.name
        for f in dataclasses.fields(SceneGeometry)
        if f.name not in (
            "has_textures", "slim", "pack_shard_axis", "pack_shard_n"
        )
    ],
    meta_fields=["has_textures", "slim", "pack_shard_axis", "pack_shard_n"],
)

# Scenes at or past this triangle count keep only tri_pack on device (the
# wavefront integrator's one shading gather); matches the deep-scene packing
# threshold (ops/bvh_native.DEEP_TRIS_THRESHOLD).
SLIM_TRIS_THRESHOLD = 1_000_000


def flatten_meshes(
    meshes: Sequence[HostMesh], slim: bool | None = None
) -> tuple[SceneGeometry, MaterialTable]:
    """Concatenate meshes into global SoA arrays + build the material table.

    Mirrors what buildAccel + buildSBT accomplish together: one geometry pool,
    per-triangle attribution (SimplePathtracer.cpp:602-746, :534-599).

    ``slim`` (default: auto at SLIM_TRIS_THRESHOLD) uploads ONLY tri_pack;
    the unpacked per-corner arrays become (1, *) placeholders (see
    SceneGeometry.slim).
    """
    v0s, e1s, e2s = [], [], []
    n0s, n1s, n2s = [], [], []
    t0s, t1s, t2s = [], [], []
    mat_ids, tex_ids, has_ns = [], [], []
    materials: List[Material] = []
    for mesh in meshes:
        mat_id = len(materials)
        materials.append(mesh.material)
        v = mesh.vertex.astype(np.float32)
        idx = mesh.index.astype(np.int64)
        p0, p1, p2 = v[idx[:, 0]], v[idx[:, 1]], v[idx[:, 2]]
        v0s.append(p0)
        e1s.append(p1 - p0)
        e2s.append(p2 - p0)
        if mesh.normal is not None and len(mesh.normal):
            n = mesh.normal.astype(np.float32)
            n0s.append(n[idx[:, 0]])
            n1s.append(n[idx[:, 1]])
            n2s.append(n[idx[:, 2]])
            has_ns.append(np.ones(len(idx), dtype=bool))
        else:
            z = np.zeros_like(p0)
            n0s.append(z)
            n1s.append(z)
            n2s.append(z)
            has_ns.append(np.zeros(len(idx), dtype=bool))
        if mesh.texcoord is not None and len(mesh.texcoord):
            tc = mesh.texcoord.astype(np.float32)
            t0s.append(tc[idx[:, 0]])
            t1s.append(tc[idx[:, 1]])
            t2s.append(tc[idx[:, 2]])
        else:
            z2 = np.zeros((len(idx), 2), dtype=np.float32)
            t0s.append(z2)
            t1s.append(z2)
            t2s.append(z2)
        mat_ids.append(np.full(len(idx), mat_id, dtype=np.int32))
        tex_ids.append(np.full(len(idx), mesh.diffuse_texture_id, dtype=np.int32))

    v0_all = np.concatenate(v0s)
    e1_all = np.concatenate(e1s)
    e2_all = np.concatenate(e2s)
    uv0_all = np.concatenate(t0s)
    uv1_all = np.concatenate(t1s)
    uv2_all = np.concatenate(t2s)
    mat_all = np.concatenate(mat_ids)
    tex_all = np.concatenate(tex_ids)
    t_count = len(v0_all)

    gn = np.cross(e1_all, e2_all)
    gn /= np.maximum(np.linalg.norm(gn, axis=1, keepdims=True), 1e-20)
    # cols 12:36 embed the triangle's MATERIAL packed row so shading needs
    # ONE attribute gather (a separate (M,24) material gather measured
    # ~14 ms/bounce at 1.9M rays); TPU tiling pads the minor dim to 128
    # lanes either way, so the extra 24 columns are physically free.
    mat_rows = MaterialTable.packed_rows_numpy(materials)
    safe_mat = np.clip(mat_all.astype(np.int64), 0, len(mat_rows) - 1)
    tri_pack = np.zeros((t_count, 48), dtype=np.float32)
    tri_pack[:, 0:3] = gn
    tri_pack[:, 3:5] = uv0_all
    tri_pack[:, 5:7] = uv1_all
    tri_pack[:, 7:9] = uv2_all
    tri_pack[:, 9] = mat_all.astype(np.int32).view(np.float32)
    tri_pack[:, 10] = tex_all.astype(np.int32).view(np.float32)
    tri_pack[:, 12:36] = mat_rows[safe_mat]
    # Möller-Trumbore inputs: same np.float32 values the BVH leaf rows pack,
    # so a shading-time re-intersection reproduces the traversal's t/u/v bits
    tri_pack[:, 36:39] = v0_all
    tri_pack[:, 39:42] = e1_all
    tri_pack[:, 42:45] = e2_all

    if slim is None:
        slim = t_count >= SLIM_TRIS_THRESHOLD
    if slim:
        z3 = np.zeros((1, 3), np.float32)
        z2p = np.zeros((1, 2), np.float32)
        unpacked = dict(
            tri_v0=z3, tri_e1=z3, tri_e2=z3,
            tri_n0=z3, tri_n1=z3, tri_n2=z3,
            tri_uv0=z2p, tri_uv1=z2p, tri_uv2=z2p,
            tri_material=np.zeros(1, np.int32),
            tri_texture=np.zeros(1, np.int32),
            has_shading_normals=np.zeros(1, bool),
        )
    else:
        unpacked = dict(
            tri_v0=v0_all,
            tri_e1=e1_all,
            tri_e2=e2_all,
            tri_n0=np.concatenate(n0s),
            tri_n1=np.concatenate(n1s),
            tri_n2=np.concatenate(n2s),
            tri_uv0=uv0_all,
            tri_uv1=uv1_all,
            tri_uv2=uv2_all,
            tri_material=mat_all,
            tri_texture=tex_all,
            has_shading_normals=np.concatenate(has_ns),
        )
    # One device_put for the whole geometry (separate per-array uploads cost
    # a tunnel round trip each; the batched pytree put is ~10x cheaper).
    geom = SceneGeometry(
        **jax.device_put(dict(tri_pack=tri_pack, **unpacked)),
        has_textures=bool((tex_all >= 0).any()),
        slim=slim,
    )
    table = MaterialTable.from_materials(materials)
    return geom, table


def host_triangles(meshes: Sequence[HostMesh]) -> np.ndarray:
    """(T, 3, 3) float32 triangle corners on the host — BVH build input."""
    tris = []
    for mesh in meshes:
        v = mesh.vertex.astype(np.float32)
        idx = mesh.index.astype(np.int64)
        tris.append(np.stack([v[idx[:, 0]], v[idx[:, 1]], v[idx[:, 2]]], axis=1))
    return np.concatenate(tris, axis=0)
