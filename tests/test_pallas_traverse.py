"""Experimental Pallas packet-traversal kernel: correctness in interpret mode
(runs on any backend; the compiled-TPU perf path is round-2 work, PLAN.md)."""

import jax.numpy as jnp
import numpy as np

from fovpathtracing_optixcodelatest_tpu.models import scenes
from fovpathtracing_optixcodelatest_tpu.models.mesh import host_triangles
from fovpathtracing_optixcodelatest_tpu.ops import (
    bvh_native,
    pallas_traverse,
    traverse8,
)


def test_packet_occlusion_parity_interpret():
    meshes, _ = scenes.box_city(n=12, seed=0)
    wb = bvh_native.build(host_triangles(meshes))
    rng = np.random.default_rng(1)
    n = 2048
    o = rng.uniform(-35, 35, (n, 3)).astype(np.float32)
    o[:, 1] = np.abs(o[:, 1])
    d = rng.normal(size=(n, 3))
    d = (d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32)
    o, d = jnp.asarray(o), jnp.asarray(d)
    ref = np.asarray(traverse8.occluded(wb, o, d, 0.01, 1e16))
    got = np.asarray(
        pallas_traverse.occluded_packets(wb, o, d, 0.01, 1e16, interpret=True)
    )
    np.testing.assert_array_equal(got, ref)


def test_packet_occlusion_active_mask_and_padding():
    meshes, _ = scenes.box_city(n=8, seed=3)
    wb = bvh_native.build(host_triangles(meshes))
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
    ref = np.asarray(traverse8.occluded(wb, o, d, 0.01, 1e16, active=active))
    np.testing.assert_array_equal(got, ref)
