"""GLTF importer tests on generated .gltf and .glb files."""

import base64
import json
import struct

import numpy as np

from fovpathtracing_optixcodelatest_tpu.models.gltf_loader import load_gltf


def _tri_gltf_doc():
    # one triangle + one quad mesh, node with translation
    positions = np.asarray(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0]], dtype=np.float32
    )
    normals = np.tile(np.asarray([[0, 0, 1]], dtype=np.float32), (3, 1))
    uvs = np.asarray([[0, 0], [1, 0], [0, 1]], dtype=np.float32)
    indices = np.asarray([0, 1, 2], dtype=np.uint16)
    blob = (
        positions.tobytes() + normals.tobytes() + uvs.tobytes() + indices.tobytes()
    )
    doc = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0, "translation": [2.0, 0.0, 0.0]}],
        "meshes": [{
            "primitives": [{
                "attributes": {"POSITION": 0, "NORMAL": 1, "TEXCOORD_0": 2},
                "indices": 3,
                "material": 0,
            }]
        }],
        "materials": [{
            "pbrMetallicRoughness": {
                "baseColorFactor": [0.9, 0.5, 0.1, 1.0],
                "metallicFactor": 0.3,
                "roughnessFactor": 0.7,
            },
            "emissiveFactor": [0.0, 1.0, 0.0],
        }],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 3, "type": "VEC3"},
            {"bufferView": 1, "componentType": 5126, "count": 3, "type": "VEC3"},
            {"bufferView": 2, "componentType": 5126, "count": 3, "type": "VEC2"},
            {"bufferView": 3, "componentType": 5123, "count": 3, "type": "SCALAR"},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 36},
            {"buffer": 0, "byteOffset": 36, "byteLength": 36},
            {"buffer": 0, "byteOffset": 72, "byteLength": 24},
            {"buffer": 0, "byteOffset": 96, "byteLength": 6},
        ],
        "buffers": [{"byteLength": len(blob)}],
    }
    return doc, blob


def test_gltf_json_with_data_uri(tmp_path):
    doc, blob = _tri_gltf_doc()
    doc["buffers"][0]["uri"] = (
        "data:application/octet-stream;base64," + base64.b64encode(blob).decode()
    )
    p = tmp_path / "t.gltf"
    p.write_text(json.dumps(doc))
    meshes, textures = load_gltf(str(p))
    assert len(meshes) == 1 and textures == []
    m = meshes[0]
    assert m.num_triangles == 1
    # translation applied
    np.testing.assert_allclose(m.vertex[0], [2, 0, 0], atol=1e-6)
    np.testing.assert_allclose(m.vertex[1], [3, 0, 0], atol=1e-6)
    np.testing.assert_allclose(m.normal[0], [0, 0, 1], atol=1e-6)
    np.testing.assert_allclose(m.material.color, (0.9, 0.5, 0.1))
    np.testing.assert_allclose(m.material.emission, (0.0, 1.0, 0.0))
    assert abs(m.material.metallic - 0.3) < 1e-6


def test_glb_container(tmp_path):
    doc, blob = _tri_gltf_doc()
    json_bytes = json.dumps(doc).encode()
    json_bytes += b" " * ((4 - len(json_bytes) % 4) % 4)
    bin_bytes = blob + b"\x00" * ((4 - len(blob) % 4) % 4)
    total = 12 + 8 + len(json_bytes) + 8 + len(bin_bytes)
    p = tmp_path / "t.glb"
    with open(p, "wb") as fh:
        fh.write(struct.pack("<III", 0x46546C67, 2, total))
        fh.write(struct.pack("<II", len(json_bytes), 0x4E4F534A))
        fh.write(json_bytes)
        fh.write(struct.pack("<II", len(bin_bytes), 0x004E4942))
        fh.write(bin_bytes)
    meshes, _ = load_gltf(str(p))
    assert len(meshes) == 1 and meshes[0].num_triangles == 1
    np.testing.assert_allclose(meshes[0].vertex[2], [2, 1, 0], atol=1e-6)


def test_gltf_renders(tmp_path):
    """Imported GLTF goes straight through the scene build + raycast."""
    from fovpathtracing_optixcodelatest_tpu.models.camera import Camera
    from fovpathtracing_optixcodelatest_tpu.models.scene import build_scene
    from fovpathtracing_optixcodelatest_tpu.render import simple

    doc, blob = _tri_gltf_doc()
    doc["buffers"][0]["uri"] = (
        "data:application/octet-stream;base64," + base64.b64encode(blob).decode()
    )
    p = tmp_path / "t.gltf"
    p.write_text(json.dumps(doc))
    meshes, textures = load_gltf(str(p))
    scene = build_scene(meshes, texture_images=textures)
    cam = Camera(eye=(2.3, 0.3, 3.0), lookat=(2.3, 0.3, 0.0), fov_y=60.0)
    frame = np.asarray(simple.raycast(scene, cam.device_params(), 32, 32,
                                      light_pos=(2, 1, 5)))
    assert frame.max() > 20  # the triangle is visible


def test_instancing_shares_geometry(tmp_path):
    """Three nodes referencing ONE mesh → 1 unique mesh, 3 instances
    (Scene.h:113-115 per-mesh GAS + IAS analog); flatten() places each
    by its own transform."""
    from fovpathtracing_optixcodelatest_tpu.models.gltf_loader import (
        load_gltf_instanced,
    )

    doc, blob = _tri_gltf_doc()
    doc["nodes"] = [
        {"mesh": 0, "translation": [0.0, 0.0, 0.0]},
        {"mesh": 0, "translation": [5.0, 0.0, 0.0]},
        {"mesh": 0, "scale": [2.0, 2.0, 2.0], "translation": [0.0, 7.0, 0.0]},
    ]
    doc["scenes"] = [{"nodes": [0, 1, 2]}]
    doc["buffers"][0]["uri"] = (
        "data:application/octet-stream;base64,"
        + base64.b64encode(blob).decode()
    )
    p = tmp_path / "inst.gltf"
    p.write_text(json.dumps(doc))

    scene = load_gltf_instanced(str(p))
    assert len(scene.unique) == 1
    assert len(scene.instances) == 3
    assert scene.num_unique_triangles == 1
    assert scene.num_world_triangles == 3

    flat = scene.flatten()
    assert len(flat) == 3
    # instance 1: translated by +5x
    np.testing.assert_allclose(
        flat[1].vertex, flat[0].vertex + [5.0, 0.0, 0.0], atol=1e-6
    )
    # instance 2: scaled 2x then translated; normals stay unit length
    np.testing.assert_allclose(
        flat[2].vertex, flat[0].vertex * 2.0 + [0.0, 7.0, 0.0], atol=1e-6
    )
    np.testing.assert_allclose(
        np.linalg.norm(flat[2].normal, axis=1), 1.0, atol=1e-6
    )

    # IAS-update analog: move instance 1 and re-flatten — unique untouched
    m = np.eye(4)
    m[0, 3] = -3.0
    scene.replace_transform(1, m)
    flat2 = scene.flatten()
    np.testing.assert_allclose(
        flat2[1].vertex, flat[0].vertex + [-3.0, 0.0, 0.0], atol=1e-6
    )
    assert len(scene.unique) == 1


def test_instanced_scene_renders(tmp_path):
    """flatten() output feeds build_scene like any mesh list."""
    from fovpathtracing_optixcodelatest_tpu.models.gltf_loader import (
        load_gltf_instanced,
    )
    from fovpathtracing_optixcodelatest_tpu.models.scene import build_scene
    from fovpathtracing_optixcodelatest_tpu.ops import traverse8

    import jax.numpy as jnp

    doc, blob = _tri_gltf_doc()
    doc["nodes"] = [
        {"mesh": 0},
        {"mesh": 0, "translation": [3.0, 0.0, 0.0]},
    ]
    doc["scenes"] = [{"nodes": [0, 1]}]
    doc["buffers"][0]["uri"] = (
        "data:application/octet-stream;base64,"
        + base64.b64encode(blob).decode()
    )
    p = tmp_path / "inst2.gltf"
    p.write_text(json.dumps(doc))
    sc = load_gltf_instanced(str(p))
    scene = build_scene(sc.flatten(), texture_images=sc.textures)
    assert scene.num_triangles == 2
    # a ray down +z through each copy hits it
    o = jnp.asarray([[0.3, 0.3, 2.0], [3.3, 0.3, 2.0], [6.3, 0.3, 2.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]] * 3)
    out = traverse8.closest_hit(scene.bvh, o, d, 1e-3, 1e9)
    assert bool(out["hit"][0]) and bool(out["hit"][1])
    assert not bool(out["hit"][2])
