"""Packet traversal must produce EXACTLY the same hits as per-ray traversal
(packets change scheduling, never results)."""

import jax.numpy as jnp
import numpy as np

from fovpathtracing_optixcodelatest_tpu.models.material import Material
from fovpathtracing_optixcodelatest_tpu.models.mesh import (
    flatten_meshes,
    host_triangles,
    make_box,
    make_icosphere,
)
from fovpathtracing_optixcodelatest_tpu.ops import bvh as bvh_mod
from fovpathtracing_optixcodelatest_tpu.ops import traverse, traverse_packet


def _scene(seed=0):
    rng = np.random.default_rng(seed)
    meshes = [make_icosphere((0, 0, 0), 1.0, 2, Material())]
    for _ in range(15):
        pos = rng.uniform(-4, 4, 3)
        ext = rng.uniform(0.2, 0.8, 3)
        meshes.append(make_box(tuple(pos), tuple(ext), Material()))
    return host_triangles(meshes)


def _rand_rays(n, seed=1, coherent=False):
    rng = np.random.default_rng(seed)
    if coherent:
        o = np.tile([[0.0, 0.0, 8.0]], (n, 1)).astype(np.float32)
        d = rng.normal(size=(n, 3)) * [0.2, 0.2, 1.0]
        d[:, 2] = -np.abs(d[:, 2])
    else:
        o = rng.uniform(-6, 6, (n, 3)).astype(np.float32)
        d = rng.normal(size=(n, 3))
    d = (d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32)
    return jnp.asarray(o), jnp.asarray(d)


def test_packet_closest_hit_parity():
    tris = _scene()
    bvh = bvh_mod.build(tris)
    for coherent in (True, False):
        o, d = _rand_rays(1000, seed=3, coherent=coherent)  # non-multiple of R
        ref = traverse.closest_hit(bvh, o, d, 0.01, 1e16)
        got = traverse_packet.closest_hit(bvh, o, d, 0.01, 1e16, packet_size=128)
        np.testing.assert_array_equal(np.asarray(got["hit"]), np.asarray(ref["hit"]))
        h = np.asarray(ref["hit"])
        np.testing.assert_allclose(
            np.asarray(got["t"])[h], np.asarray(ref["t"])[h], rtol=1e-6
        )
        same = (np.asarray(got["tri_id"]) == np.asarray(ref["tri_id"]))[h]
        assert same.mean() > 0.999  # ties on shared edges only


def test_packet_occlusion_parity():
    tris = _scene(seed=4)
    bvh = bvh_mod.build(tris)
    o, d = _rand_rays(777, seed=5)
    ref = np.asarray(traverse.occluded(bvh, o, d, 0.01, 1e16))
    got = np.asarray(
        traverse_packet.occluded(bvh, o, d, 0.01, 1e16, packet_size=64)
    )
    np.testing.assert_array_equal(got, ref)


def test_packet_active_mask():
    tris = _scene(seed=6)
    bvh = bvh_mod.build(tris)
    o, d = _rand_rays(300, seed=7, coherent=True)
    active = jnp.asarray(np.arange(300) % 3 != 0)
    got = traverse_packet.closest_hit(
        bvh, o, d, 0.01, 1e16, active=active, packet_size=32
    )
    assert not np.asarray(got["hit"])[::3].any()
    ref = traverse.closest_hit(bvh, o, d, 0.01, 1e16, active=active)
    np.testing.assert_array_equal(np.asarray(got["hit"]), np.asarray(ref["hit"]))
