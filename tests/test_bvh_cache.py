"""Packed-BVH disk cache (ops/bvh_native): a cache round trip must return a
bit-identical table + metadata, and the key must change with packing params
(round-5: 10M rebuilds went 198 s -> 32 s warm off this cache)."""

import numpy as np

from fovpathtracing_optixcodelatest_tpu.models.material import Material
from fovpathtracing_optixcodelatest_tpu.models.mesh import (
    host_triangles,
    make_box,
    make_icosphere,
)
from fovpathtracing_optixcodelatest_tpu.ops import bvh_native


def _tris():
    rng = np.random.default_rng(7)
    meshes = [make_icosphere((0, 0, 0), 1.0, 2, Material())]
    for _ in range(8):
        meshes.append(
            make_box(tuple(rng.uniform(-3, 3, 3)),
                     tuple(rng.uniform(0.2, 0.6, 3)), Material())
        )
    return host_triangles(meshes)


def test_bvh_cache_round_trip(tmp_path, monkeypatch):
    monkeypatch.setattr(bvh_native, "BVH_CACHE_DIR", str(tmp_path))
    monkeypatch.setattr(bvh_native, "BVH_CACHE_MIN_TRIS", 1)
    tris = _tris()

    wb1 = bvh_native.build(tris)
    files = list(tmp_path.iterdir())
    assert len(files) == 1 and files[0].suffix == ".npz"

    wb2 = bvh_native.build(tris)  # cache hit
    np.testing.assert_array_equal(np.asarray(wb1.table), np.asarray(wb2.table))
    np.testing.assert_array_equal(
        np.asarray(wb1.leaf_perm), np.asarray(wb2.leaf_perm)
    )
    for f in ("leaf_size", "arity", "stack_depth", "dfs", "top_rows",
              "top_stack", "treelet_stack"):
        assert getattr(wb1, f) == getattr(wb2, f), f

    # different packing params -> different key -> second entry
    bvh_native.build(tris, leaf_size=4, arity=8)
    assert len(list(tmp_path.iterdir())) == 2

    # different geometry -> different key
    tris2 = tris.copy()
    tris2[0, 0, 0] += 0.25
    bvh_native.build(tris2)
    assert len(list(tmp_path.iterdir())) == 3
