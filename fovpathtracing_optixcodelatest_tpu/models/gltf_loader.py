"""Minimal glTF 2.0 importer → HostMesh list (+ textures).

Capability twin of the SDK's tinygltf scene framework (sutil/Scene.cpp:256
loadScene / :109 processGLTFNode) which the reference tree carries but the
foveated renderer never calls. Supports the subset that matters for static
triangle scenes:

- .gltf (JSON + external/in-line base64 .bin) and .glb containers
- node hierarchy with TRS / matrix transforms; nodes sharing a mesh share
  its geometry through the instance layer (models/instance.py — the
  per-mesh GAS + IAS analog, Scene.h:113-115). ``load_gltf`` flattens to
  the world-space pool; ``load_gltf_instanced`` exposes the table.
- triangle primitives: POSITION / NORMAL / TEXCOORD_0 accessors (+ indices,
  u8/u16/u32), strides respected
- pbrMetallicRoughness materials: baseColorFactor/-Texture, metallic/
  roughness factors, emissiveFactor → Disney parameters
"""

from __future__ import annotations

import base64
import json
import os
import struct
from typing import Dict, List, Optional, Tuple

import numpy as np

from fovpathtracing_optixcodelatest_tpu.models.material import Material
from fovpathtracing_optixcodelatest_tpu.models.mesh import HostMesh

_COMPONENT_DTYPE = {
    5120: np.int8, 5121: np.uint8, 5122: np.int16,
    5123: np.uint16, 5125: np.uint32, 5126: np.float32,
}
_TYPE_COUNT = {"SCALAR": 1, "VEC2": 2, "VEC3": 3, "VEC4": 4, "MAT4": 16}


def _load_buffers(doc: dict, base: str, glb_bin: Optional[bytes]) -> List[bytes]:
    bufs = []
    for buf in doc.get("buffers", []):
        uri = buf.get("uri")
        if uri is None:
            bufs.append(glb_bin or b"")
        elif uri.startswith("data:"):
            bufs.append(base64.b64decode(uri.split(",", 1)[1]))
        else:
            with open(os.path.join(base, uri), "rb") as fh:
                bufs.append(fh.read())
    return bufs


def _read_accessor(doc: dict, bufs: List[bytes], idx: int) -> np.ndarray:
    acc = doc["accessors"][idx]
    view = doc["bufferViews"][acc["bufferView"]]
    dtype = _COMPONENT_DTYPE[acc["componentType"]]
    ncomp = _TYPE_COUNT[acc["type"]]
    count = acc["count"]
    itemsize = np.dtype(dtype).itemsize * ncomp
    stride = view.get("byteStride", itemsize)
    start = view.get("byteOffset", 0) + acc.get("byteOffset", 0)
    raw = bufs[view["buffer"]]
    if stride == itemsize:
        arr = np.frombuffer(raw, dtype=dtype, count=count * ncomp,
                            offset=start).reshape(count, ncomp)
    else:
        out = np.empty((count, ncomp), dtype=dtype)
        for i in range(count):
            off = start + i * stride
            out[i] = np.frombuffer(raw, dtype=dtype, count=ncomp, offset=off)
        arr = out
    return np.array(arr)


def _node_matrix(node: dict) -> np.ndarray:
    if "matrix" in node:
        return np.asarray(node["matrix"], dtype=np.float64).reshape(4, 4).T
    m = np.eye(4)
    if "scale" in node:
        m = m @ np.diag([*node["scale"], 1.0])
    if "rotation" in node:
        x, y, z, w = node["rotation"]
        r = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ])
        m4 = np.eye(4)
        m4[:3, :3] = r
        m = m4 @ m
    if "translation" in node:
        t = np.eye(4)
        t[:3, 3] = node["translation"]
        m = t @ m
    return m


def _material_from_pbr(doc: dict, idx: Optional[int]) -> Tuple[Material, Optional[int]]:
    if idx is None or idx >= len(doc.get("materials", [])):
        return Material(color=(0.8, 0.8, 0.8), emission=(0, 0, 0),
                        metallic=0.0, roughness=1.0, transmission=0.0,
                        specular=0.5, specular_tint=0.0), None
    m = doc["materials"][idx]
    pbr = m.get("pbrMetallicRoughness", {})
    base = pbr.get("baseColorFactor", [1, 1, 1, 1])
    tex_info = pbr.get("baseColorTexture")
    tex_source = None
    if tex_info is not None and "textures" in doc:
        tex = doc["textures"][tex_info["index"]]
        tex_source = tex.get("source")
    return Material(
        color=tuple(base[:3]),
        emission=tuple(m.get("emissiveFactor", [0, 0, 0])),
        metallic=float(pbr.get("metallicFactor", 1.0)),
        roughness=float(np.clip(pbr.get("roughnessFactor", 1.0), 0.05, 1.0)),
        transmission=0.0,
        specular=0.5,
        specular_tint=0.0,
        eta=1.45,
    ), tex_source


def _load_images(doc: dict, bufs: List[bytes], base: str) -> List[Optional[np.ndarray]]:
    images: List[Optional[np.ndarray]] = []
    for img in doc.get("images", []):
        data = None
        if "uri" in img and not img["uri"].startswith("data:"):
            try:
                from fovpathtracing_optixcodelatest_tpu.models.obj_loader import (
                    load_texture,
                )

                data = load_texture(os.path.join(base, img["uri"]))
            except Exception:  # noqa: BLE001
                data = None
        elif "bufferView" in img or ("uri" in img and img["uri"].startswith("data:")):
            try:
                import io

                from PIL import Image

                if "bufferView" in img:
                    view = doc["bufferViews"][img["bufferView"]]
                    start = view.get("byteOffset", 0)
                    blob = bufs[view["buffer"]][start : start + view["byteLength"]]
                else:
                    blob = base64.b64decode(img["uri"].split(",", 1)[1])
                pim = Image.open(io.BytesIO(blob)).convert("RGB")
                data = (np.asarray(pim, dtype=np.float32) / 255.0)[::-1].copy()
            except Exception:  # noqa: BLE001
                data = None
        images.append(data)
    return images


def load_gltf(path: str) -> Tuple[List[HostMesh], List[np.ndarray]]:
    """Load a .gltf/.glb file; returns (world-space meshes, texture_images).

    Convenience wrapper over :func:`load_gltf_instanced` + flatten."""
    scene = load_gltf_instanced(path)
    return scene.flatten(), scene.textures


def load_gltf_instanced(path: str) -> "InstancedScene":
    """Load a .gltf/.glb into unique object-space meshes + an instance table
    (the Scene.h:113-115 per-mesh-GAS + IAS layout; models/instance.py).
    Nodes sharing a glTF mesh share its geometry instead of duplicating it."""
    from fovpathtracing_optixcodelatest_tpu.models.instance import (
        Instance,
        InstancedScene,
    )

    base = os.path.dirname(os.path.abspath(path))
    glb_bin: Optional[bytes] = None
    if path.lower().endswith(".glb"):
        with open(path, "rb") as fh:
            magic, _version, _length = struct.unpack("<III", fh.read(12))
            assert magic == 0x46546C67, "not a GLB"
            doc = None
            while True:
                hdr = fh.read(8)
                if len(hdr) < 8:
                    break
                clen, ctype = struct.unpack("<II", hdr)
                payload = fh.read(clen)
                if ctype == 0x4E4F534A:  # 'JSON'
                    doc = json.loads(payload)
                elif ctype == 0x004E4942:  # 'BIN\0'
                    glb_bin = payload
        assert doc is not None, "GLB missing JSON chunk"
    else:
        with open(path) as fh:
            doc = json.load(fh)

    bufs = _load_buffers(doc, base, glb_bin)
    images = _load_images(doc, bufs, base)

    unique: List[HostMesh] = []
    instances: List[Instance] = []
    textures: List[np.ndarray] = []
    tex_remap: Dict[int, int] = {}
    mesh_cache: Dict[int, Tuple[int, ...]] = {}  # glTF mesh -> unique ids

    def build_unique(mesh_idx: int) -> Tuple[int, ...]:
        """Object-space HostMesh per triangle primitive, built once per glTF
        mesh (the per-mesh GAS analog)."""
        if mesh_idx in mesh_cache:
            return mesh_cache[mesh_idx]
        mesh = doc["meshes"][mesh_idx]
        ids = []
        for prim in mesh.get("primitives", []):
            if prim.get("mode", 4) != 4:  # triangles only
                continue
            attrs = prim["attributes"]
            pos = _read_accessor(doc, bufs, attrs["POSITION"]).astype(np.float32)
            normal = None
            if "NORMAL" in attrs:
                normal = _read_accessor(doc, bufs, attrs["NORMAL"]).astype(
                    np.float32
                )
            texcoord = None
            if "TEXCOORD_0" in attrs:
                texcoord = _read_accessor(doc, bufs, attrs["TEXCOORD_0"]).astype(
                    np.float32
                )
            if "indices" in prim:
                idx = _read_accessor(doc, bufs, prim["indices"]).reshape(-1)
            else:
                idx = np.arange(len(pos))
            index = idx.reshape(-1, 3).astype(np.int32)
            material, tex_source = _material_from_pbr(doc, prim.get("material"))
            tex_id = -1
            if tex_source is not None and images[tex_source] is not None:
                if tex_source not in tex_remap:
                    tex_remap[tex_source] = len(textures)
                    textures.append(images[tex_source])
                tex_id = tex_remap[tex_source]
            ids.append(len(unique))
            unique.append(
                HostMesh(
                    vertex=pos,
                    index=index,
                    normal=normal,
                    texcoord=texcoord,
                    material=material,
                    diffuse_texture_id=tex_id,
                )
            )
        mesh_cache[mesh_idx] = tuple(ids)
        return mesh_cache[mesh_idx]

    def walk(node_idx: int, parent: np.ndarray) -> None:
        node = doc["nodes"][node_idx]
        world = parent @ _node_matrix(node)
        if "mesh" in node:
            ids = build_unique(node["mesh"])
            if ids:
                instances.append(Instance(mesh_ids=ids, transform=world))
        for c in node.get("children", []):
            walk(c, world)

    scene_idx = doc.get("scene", 0)
    scenes_list = doc.get("scenes", [{"nodes": list(range(len(doc.get("nodes", []))))}])
    roots = scenes_list[scene_idx].get("nodes", [])
    for r in roots:
        walk(r, np.eye(4))
    if not instances:  # no scene graph: instance all meshes untransformed
        for i in range(len(doc.get("meshes", []))):
            ids = build_unique(i)
            if ids:
                instances.append(Instance(mesh_ids=ids, transform=np.eye(4)))
    return InstancedScene(unique=unique, instances=instances, textures=textures)
