"""BVH build + traversal parity vs the brute-force oracle (SURVEY.md §7
milestone 3 validation strategy)."""

import jax
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
from fovpathtracing_optixcodelatest_tpu.ops import traverse
from fovpathtracing_optixcodelatest_tpu.ops.intersect import (
    brute_force_closest_hit,
    brute_force_occluded,
    ray_triangle,
)


def _scene(seed=0):
    rng = np.random.default_rng(seed)
    meshes = [make_icosphere((0, 0, 0), 1.0, 2, Material())]
    for _ in range(20):
        pos = rng.uniform(-4, 4, 3)
        ext = rng.uniform(0.2, 0.8, 3)
        meshes.append(make_box(tuple(pos), tuple(ext), Material()))
    geom, _ = flatten_meshes(meshes)
    tris = host_triangles(meshes)
    return geom, tris


def _rand_rays(n, seed=1):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-6, 6, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3))
    d = (d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32)
    return jnp.asarray(o), jnp.asarray(d)


def test_ray_triangle_basics():
    v0 = jnp.asarray([[0.0, 0.0, 0.0]])
    e1 = jnp.asarray([[1.0, 0.0, 0.0]])
    e2 = jnp.asarray([[0.0, 1.0, 0.0]])
    o = jnp.asarray([[0.25, 0.25, 1.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    t, u, v, hit = ray_triangle(o, d, v0, e1, e2, 0.0, 10.0)
    assert bool(hit[0])
    np.testing.assert_allclose(float(t[0]), 1.0, atol=1e-6)
    np.testing.assert_allclose([float(u[0]), float(v[0])], [0.25, 0.25], atol=1e-6)
    # outside barycentric range
    o2 = jnp.asarray([[0.9, 0.9, 1.0]])
    _, _, _, hit2 = ray_triangle(o2, d, v0, e1, e2, 0.0, 10.0)
    assert not bool(hit2[0])
    # back-face culling: hit from below is culled
    o3 = jnp.asarray([[0.25, 0.25, -1.0]])
    d3 = jnp.asarray([[0.0, 0.0, 1.0]])
    _, _, _, hit3 = ray_triangle(o3, d3, v0, e1, e2, 0.0, 10.0, cull_backface=True)
    assert not bool(hit3[0])
    _, _, _, hit4 = ray_triangle(o3, d3, v0, e1, e2, 0.0, 10.0, cull_backface=False)
    assert bool(hit4[0])


def test_bvh_structure():
    _, tris = _scene()
    bvh = bvh_mod.build(tris)
    m = bvh.num_nodes
    counts = np.asarray(bvh.tri_count)
    assert (counts <= bvh_mod.LEAF_SIZE).all()
    assert counts.sum() == tris.shape[0]
    perm = np.asarray(bvh.tri_perm)
    used = perm[perm >= 0]
    assert sorted(used.tolist()) == list(range(tris.shape[0]))
    # links stay in range and miss links strictly advance DFS position
    for o in range(8):
        ml = np.asarray(bvh.miss_link[o])
        hl = np.asarray(bvh.hit_link[o])
        assert (ml <= m).all() and (hl <= m).all()
    # root covers everything
    np.testing.assert_allclose(np.asarray(bvh.aabb_lo[0]), tris.min(axis=(0, 1)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(bvh.aabb_hi[0]), tris.max(axis=(0, 1)), atol=1e-5)


def test_closest_hit_parity_with_brute_force():
    geom, tris = _scene()
    bvh = bvh_mod.build(tris)
    o, d = _rand_rays(2048)
    ref = jax.jit(
        lambda o, d: brute_force_closest_hit(geom, o, d, 0.01, 1e16)
    )(o, d)
    got = jax.jit(
        lambda o, d: traverse.closest_hit(bvh, o, d, 0.01, 1e16)
    )(o, d)
    hit_ref = np.asarray(ref["hit"])
    hit_got = np.asarray(got["hit"])
    np.testing.assert_array_equal(hit_got, hit_ref)
    t_ref = np.asarray(ref["t"])[hit_ref]
    t_got = np.asarray(got["t"])[hit_ref]
    np.testing.assert_allclose(t_got, t_ref, rtol=1e-4, atol=1e-5)
    # same triangle except exact-tie cases (shared edges): compare hit points
    same_tri = (np.asarray(ref["tri_id"]) == np.asarray(got["tri_id"]))[hit_ref]
    assert same_tri.mean() > 0.99


def test_occlusion_parity_with_brute_force():
    geom, tris = _scene(seed=5)
    bvh = bvh_mod.build(tris)
    o, d = _rand_rays(2048, seed=7)
    ref = np.asarray(brute_force_occluded(geom, o, d, 0.01, 1e16))
    got = np.asarray(traverse.occluded(bvh, o, d, 0.01, 1e16))
    # back-face-cull any-hit: t-epsilon edge cases can differ on grazing rays
    assert (ref == got).mean() > 0.999


def test_traversal_prunes():
    """Octant-ordered traversal must visit far fewer nodes than the node count
    for coherent rays (sanity check that miss links + t_best pruning engage)."""
    _, tris = _scene(seed=2)
    bvh = bvh_mod.build(tris)
    n = 512
    o = jnp.tile(jnp.asarray([[0.0, 0.0, 10.0]], dtype=jnp.float32), (n, 1))
    rng = np.random.default_rng(0)
    d = rng.normal(size=(n, 3)) * np.asarray([0.05, 0.05, 1.0])
    d[:, 2] = -np.abs(d[:, 2])
    d = jnp.asarray((d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32))
    out = traverse.closest_hit(bvh, o, d, 0.01, 1e16)
    assert int(out["steps"]) < bvh.num_nodes


def test_single_triangle_and_empty_leaf_padding():
    tris = np.asarray(
        [[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], dtype=np.float32
    )
    bvh = bvh_mod.build(tris)
    o = jnp.asarray([[0.2, 0.2, 5.0]], dtype=jnp.float32)
    d = jnp.asarray([[0.0, 0.0, -1.0]], dtype=jnp.float32)
    out = traverse.closest_hit(bvh, o, d, 0.0, 100.0)
    assert bool(out["hit"][0]) and int(out["tri_id"][0]) == 0
    np.testing.assert_allclose(float(out["t"][0]), 5.0, atol=1e-5)


def test_bf16_box_rounding_conservative():
    """Packed node boxes must bracket the exact bounds: decode(lo) <= lo and
    decode(hi) >= hi for every finite input."""
    from fovpathtracing_optixcodelatest_tpu.ops.bvh8 import (
        _bf16_down_bits,
        _bf16_up_bits,
    )

    rng = np.random.default_rng(0)
    x = np.concatenate([
        rng.uniform(-1e6, 1e6, 4096).astype(np.float32),
        rng.normal(scale=1e-5, size=1024).astype(np.float32),
        np.asarray([0.0, -0.0, 1.0, -1.0, 3.14159, -2.71828], np.float32),
    ])
    lo = _bf16_down_bits(x).view(np.float32)
    hi = _bf16_up_bits(x).view(np.float32)
    assert (lo <= x).all(), "down-rounding must not exceed the input"
    assert (hi >= x).all(), "up-rounding must not undershoot the input"
    # within one bf16 ulp (2^-8 relative) plus denormal slack
    assert (x - lo <= np.maximum(np.abs(x) * 2**-7, 1e-37)).all()
    assert (hi - x <= np.maximum(np.abs(x) * 2**-7, 1e-37)).all()


def test_wide_packed_closest_hit_parity():
    """The packed arity-16 bf16-box BVH must return exactly the oracle's
    hits (conservative boxes only add box visits, never change results)."""
    from fovpathtracing_optixcodelatest_tpu.ops import bvh_native, traverse8

    geom, tris = _scene()
    for arity, force_py in ((16, False), (8, False), (16, True)):
        wb = bvh_native.build(tris, arity=arity, force_python=force_py)
        o, d = _rand_rays(2048)
        ref = jax.jit(
            lambda o, d: brute_force_closest_hit(geom, o, d, 0.01, 1e16)
        )(o, d)
        got = jax.jit(
            lambda o, d: traverse8.closest_hit(wb, o, d, 0.01, 1e16)
        )(o, d)
        hit_ref = np.asarray(ref["hit"])
        np.testing.assert_array_equal(np.asarray(got["hit"]), hit_ref)
        np.testing.assert_allclose(
            np.asarray(got["t"])[hit_ref], np.asarray(ref["t"])[hit_ref],
            rtol=1e-4, atol=1e-5,
        )
        same_tri = (
            np.asarray(ref["tri_id"]) == np.asarray(got["tri_id"])
        )[hit_ref]
        assert same_tri.mean() > 0.99


def test_wide_packed_occlusion_parity():
    from fovpathtracing_optixcodelatest_tpu.ops import bvh_native, traverse8

    geom, tris = _scene(seed=5)
    wb = bvh_native.build(tris)
    o, d = _rand_rays(2048, seed=7)
    ref = np.asarray(brute_force_occluded(geom, o, d, 0.01, 1e16))
    got = np.asarray(traverse8.occluded(wb, o, d, 0.01, 1e16))
    assert (ref == got).mean() > 0.999


def test_narrow_leaf_build_parity():
    """L6/A16 packs the unified row in 64 f32 cols (the HBM-regime
    bytes/row variant, build_scene(leaf_size=6)) — results must stay exactly
    equal to the oracle, like every other packing."""
    from fovpathtracing_optixcodelatest_tpu.ops import bvh_native, traverse8

    geom, tris = _scene(seed=11)
    wb = bvh_native.build(tris, leaf_size=6, arity=16)
    assert wb.table.shape[1] == 64, wb.table.shape
    o, d = _rand_rays(2048, seed=3)
    ref = jax.jit(
        lambda o, d: brute_force_closest_hit(geom, o, d, 0.01, 1e16)
    )(o, d)
    got = jax.jit(
        lambda o, d: traverse8.closest_hit(wb, o, d, 0.01, 1e16)
    )(o, d)
    hit_ref = np.asarray(ref["hit"])
    np.testing.assert_array_equal(np.asarray(got["hit"]), hit_ref)
    np.testing.assert_allclose(
        np.asarray(got["t"])[hit_ref], np.asarray(ref["t"])[hit_ref],
        rtol=1e-4, atol=1e-5,
    )
