"""Experimental Pallas packet-traversal kernel: correctness in interpret mode
(runs on any backend; it consumes the legacy round-1 8-wide f32 table —
the fast XLA path moved to the packed bf16 format in round 2)."""

import jax.numpy as jnp
import numpy as np

from fovpathtracing_optixcodelatest_tpu.models import scenes
from fovpathtracing_optixcodelatest_tpu.models.mesh import (
    flatten_meshes,
    host_triangles,
)
from fovpathtracing_optixcodelatest_tpu.ops import bvh8, pallas_traverse
from fovpathtracing_optixcodelatest_tpu.ops.intersect import (
    brute_force_occluded,
)


def test_packet_occlusion_parity_interpret():
    meshes, _ = scenes.box_city(n=12, seed=0)
    wb = bvh8.build_legacy8(host_triangles(meshes))
    geom, _ = flatten_meshes(meshes)
    rng = np.random.default_rng(1)
    n = 2048
    o = rng.uniform(-35, 35, (n, 3)).astype(np.float32)
    o[:, 1] = np.abs(o[:, 1])
    d = rng.normal(size=(n, 3))
    d = (d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32)
    o, d = jnp.asarray(o), jnp.asarray(d)
    ref = np.asarray(brute_force_occluded(geom, o, d, 0.01, 1e16))
    got = np.asarray(
        pallas_traverse.occluded_packets(wb, o, d, 0.01, 1e16, interpret=True)
    )
    # back-face-cull any-hit: t-epsilon edge cases can differ on grazing rays
    assert (got == ref).mean() > 0.999


def test_packet_occlusion_active_mask_and_padding():
    meshes, _ = scenes.box_city(n=8, seed=3)
    wb = bvh8.build_legacy8(host_triangles(meshes))
    geom, _ = flatten_meshes(meshes)
    rng = np.random.default_rng(5)
    n = 1500  # non-multiple of the 1024-ray packet
    o = rng.uniform(-30, 30, (n, 3)).astype(np.float32)
    o[:, 1] = np.abs(o[:, 1])
    d = rng.normal(size=(n, 3))
    d = (d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32)
    o, d = jnp.asarray(o), jnp.asarray(d)
    active = jnp.asarray(np.arange(n) % 2 == 0)
    got = np.asarray(
        pallas_traverse.occluded_packets(
            wb, o, d, 0.01, 1e16, active=active, interpret=True
        )
    )
    assert got.shape == (n,)
    assert not got[1::2].any()  # inactive rays never occluded
    ref = np.asarray(brute_force_occluded(geom, o, d, 0.01, 1e16))
    agree = (got[::2] == ref[::2]).mean()
    assert agree > 0.999
