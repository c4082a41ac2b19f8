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


def test_dfs_interleaved_build_parity():
    """DFS-interleaved row order (the deep-scene windowed-traversal layout,
    bvh8.dfs_permute_host) is a pure row permutation: closest-hit and
    occlusion results must be BIT-IDENTICAL to the default node-rows-first
    layout, and the oracle parity must hold."""
    from fovpathtracing_optixcodelatest_tpu.ops import bvh_native, traverse8

    geom, tris = _scene(seed=13)
    wb0 = bvh_native.build(tris, leaf_size=6, arity=16, dfs=False)
    wb1 = bvh_native.build(tris, leaf_size=6, arity=16, dfs=True)
    assert wb1.dfs and not wb0.dfs
    assert wb1.table.shape == wb0.table.shape
    # same rows as a SET (permutation, nothing dropped/duplicated) up to the
    # child-code rewrite; leaf rows are untouched by the rewrite
    t0 = np.asarray(wb0.table)
    t1 = np.asarray(wb1.table)
    assert not np.array_equal(t0, t1)  # actually permuted
    o, d = _rand_rays(4096, seed=5)
    h0 = jax.jit(lambda o, d: traverse8.closest_hit(wb0, o, d, 0.01, 1e16))(o, d)
    h1 = jax.jit(lambda o, d: traverse8.closest_hit(wb1, o, d, 0.01, 1e16))(o, d)
    for k in ("hit", "t", "tri", "u", "v"):
        if k in h0:
            np.testing.assert_array_equal(
                np.asarray(h0[k]), np.asarray(h1[k]), err_msg=k
            )
    ref = jax.jit(
        lambda o, d: brute_force_closest_hit(geom, o, d, 0.01, 1e16)
    )(o, d)
    np.testing.assert_array_equal(
        np.asarray(h1["hit"]), np.asarray(ref["hit"])
    )
    occ0 = np.asarray(traverse8.occluded(wb0, o, d, 0.01, 1e16))
    occ1 = np.asarray(traverse8.occluded(wb1, o, d, 0.01, 1e16))
    np.testing.assert_array_equal(occ0, occ1)


def test_dfs_permute_row_structure():
    """After dfs_permute_host every internal subtree occupies a CONTIGUOUS
    row range — the invariant the windowed traversal relies on."""
    from fovpathtracing_optixcodelatest_tpu.ops import bvh8, bvh_native

    _geom, tris = _scene(seed=17)
    wb = bvh_native.build(tris, leaf_size=6, arity=16, dfs=True)
    table = np.asarray(wb.table)
    a = wb.arity
    codes = table[:, 3 * a : 4 * a].view(np.int32)

    def subtree_range(row):
        lo = hi = row
        stack = [row]
        while stack:
            r = stack.pop()
            lo, hi = min(lo, r), max(hi, r)
            for c in codes[r]:
                if c == bvh8.EMPTY:
                    continue
                if (c & 3) == bvh8.KIND_NODE:
                    stack.append(c >> 2)
                elif (c & 3) == bvh8.KIND_LEAF:
                    r2 = c >> 2
                    lo, hi = min(lo, r2), max(hi, r2)
        return lo, hi

    def subtree_size(row):
        n = 1
        for c in codes[row]:
            if c == bvh8.EMPTY:
                continue
            if (c & 3) == bvh8.KIND_NODE:
                n += subtree_size(c >> 2)
            elif (c & 3) == bvh8.KIND_LEAF:
                n += 1
        return n

    # root spans the whole reachable prefix, and each level-1 child subtree
    # is contiguous: span == size
    for c in codes[0]:
        if c != bvh8.EMPTY and (c & 3) == bvh8.KIND_NODE:
            lo, hi = subtree_range(c >> 2)
            assert hi - lo + 1 == subtree_size(c >> 2), (lo, hi)


def test_windowed_traversal_bit_identical(monkeypatch):
    """The deep-scene windowed step (dynamic_slice band + out-of-window
    deferral, OPT-IN via closest_hit(window=True)) must return BIT-IDENTICAL
    results to the plain gather path. Window constants are shrunk so a small
    test tree spans many windows and deferral really triggers."""
    from fovpathtracing_optixcodelatest_tpu.ops import bvh_native, traverse8

    geom, tris = _scene(seed=19)
    wb = bvh_native.build(tris, leaf_size=6, arity=16, dfs=True)
    assert wb.num_rows > 64
    o, d = _rand_rays(4096, seed=9)

    ref_ch = jax.jit(
        lambda o, d: traverse8.closest_hit(wb, o, d, 0.01, 1e16)
    )(o, d)

    monkeypatch.setattr(traverse8, "WINDOW_ROWS", 64)
    assert traverse8._use_window(wb)
    # window=False (the default) never windows, even on an eligible table
    got_plain = jax.jit(
        lambda o, d: traverse8.closest_hit(wb, o, d, 0.01, 1e16)
    )(o, d)
    assert int(got_plain["steps"]) == int(ref_ch["steps"])
    got_ch = jax.jit(
        lambda o, d: traverse8.closest_hit(
            wb, o, d, 0.01, 1e16, window=True
        )
    )(o, d)
    for k in ("hit", "t", "tri_id", "u", "v"):
        np.testing.assert_array_equal(
            np.asarray(got_ch[k]), np.asarray(ref_ch[k]), err_msg=k
        )
    # the windowed run really deferred (more iterations than the plain run)
    assert int(got_ch["steps"]) > int(ref_ch["steps"])


def test_treelet_phased_closest_hit_exact(monkeypatch):
    """closest_hit_treelet (top phase + row-sorted windowed rounds) must
    return EXACTLY the plain traversal's results. A small tree is forced
    into the treelet layout with a tiny budget, window constants shrunk so
    the rounds really window, and slot overflow really triggers the
    full-re-trace fallback."""
    from fovpathtracing_optixcodelatest_tpu.ops import bvh8, traverse8

    _geom, tris = _scene(seed=23)
    wb_plain = bvh8.build(tris, leaf_size=4, arity=8)
    wb = bvh8.build(tris, leaf_size=4, arity=8, treelet_budget=16)
    assert wb.top_rows > 0, "treelet split must engage"
    # grouping may APPEND synthetic group rows (group_small_siblings_host)
    # but never drops any
    assert wb.num_rows >= wb_plain.num_rows

    # treelet contiguity: every pending-root subtree spans <= budget rows
    table = np.asarray(wb.table)
    codes = table[:, 3 * wb.arity : 4 * wb.arity].view(np.int32)

    o, d = _rand_rays(4096, seed=11)
    ref = jax.jit(
        lambda o, d: traverse8.closest_hit(wb_plain, o, d, 0.01, 1e16)
    )(o, d)

    monkeypatch.setattr(traverse8, "WINDOW_ROWS", 32)
    got = jax.jit(
        lambda o, d: traverse8.closest_hit_treelet(wb, o, d, 0.01, 1e16)
    )(o, d)
    hit_ref = np.asarray(ref["hit"])
    np.testing.assert_array_equal(np.asarray(got["hit"]), hit_ref)
    np.testing.assert_array_equal(
        np.asarray(got["tri_id"]), np.asarray(ref["tri_id"])
    )
    np.testing.assert_array_equal(
        np.asarray(got["t"])[hit_ref], np.asarray(ref["t"])[hit_ref]
    )
    np.testing.assert_array_equal(
        np.asarray(got["u"])[hit_ref], np.asarray(ref["u"])[hit_ref]
    )
    assert not np.asarray(got["pending"]).any()

    # active masking: inactive lanes report miss
    act = jnp.asarray(np.arange(4096) % 3 == 0)
    got_m = jax.jit(
        lambda o, d, a: traverse8.closest_hit_treelet(
            wb, o, d, 0.01, 1e16, active=a
        )
    )(o, d, act)
    gm = np.asarray(got_m["tri_id"])
    np.testing.assert_array_equal(
        gm[np.asarray(act)], np.asarray(ref["tri_id"])[np.asarray(act)]
    )
    assert (gm[~np.asarray(act)] == -1).all()


def test_treelet_scene_render_bit_identical(monkeypatch):
    """A frame rendered through the integrator's treelet branch (deep-scene
    routing, scene.bvh.top_rows > 0) is BIT-IDENTICAL to the default staged
    path — the whole closest-hit contract survives the phased traversal."""
    import dataclasses

    from fovpathtracing_optixcodelatest_tpu.config import (
        FoveationSchedule,
        RenderConfig,
    )
    from fovpathtracing_optixcodelatest_tpu.models import scenes
    from fovpathtracing_optixcodelatest_tpu.models.mesh import host_triangles
    from fovpathtracing_optixcodelatest_tpu.models.probe import constant_probe
    from fovpathtracing_optixcodelatest_tpu.models.scene import build_scene
    from fovpathtracing_optixcodelatest_tpu.ops import bvh8, traverse8
    from fovpathtracing_optixcodelatest_tpu.render.renderer import Renderer

    monkeypatch.setattr(traverse8, "WINDOW_ROWS", 64)
    # routing is default-off since round 5 (PLAN rule 59) — force it so the
    # integrator branch under test actually engages
    monkeypatch.setattr(traverse8, "TREELET_MAX_ROWS", 1 << 40)

    meshes, cam = scenes.box_city(n=3, seed=2)
    config = RenderConfig(width=48, height=32, max_depth=3)
    schedule = FoveationSchedule.uniform(spp=2)
    probe = constant_probe((1.5, 1.5, 1.5))

    r0 = Renderer(meshes=meshes, config=config, schedule=schedule,
                  probe=probe)
    r0.set_camera(dataclasses.replace(cam, aspect=48 / 32))
    f0 = r0.render()

    tris = host_triangles(meshes)
    twb = bvh8.build(tris, leaf_size=r0.scene.bvh.leaf_size,
                     arity=r0.scene.bvh.arity, treelet_budget=24)
    assert twb.top_rows > 0
    scene_t = dataclasses.replace(r0.scene, bvh=twb)
    r1 = Renderer(scene=scene_t, config=config, schedule=schedule)
    r1.set_camera(dataclasses.replace(cam, aspect=48 / 32))
    f1 = r1.render()
    np.testing.assert_array_equal(f0, f1)


def test_treelet_occlusion_exact(monkeypatch):
    """occluded_treelet (occlusion twin of the phased traversal) must equal
    occluded() exactly, windows shrunk so rounds really window."""
    from fovpathtracing_optixcodelatest_tpu.ops import bvh8, traverse8

    _geom, tris = _scene(seed=29)
    wb_plain = bvh8.build(tris, leaf_size=4, arity=8)
    wb = bvh8.build(tris, leaf_size=4, arity=8, treelet_budget=16)
    assert wb.top_rows > 0 and wb.treelet_stack > 0
    o, d = _rand_rays(4096, seed=13)
    ref = np.asarray(
        jax.jit(lambda o, d: traverse8.occluded(wb_plain, o, d, 0.01, 1e16))(
            o, d
        )
    )
    monkeypatch.setattr(traverse8, "WINDOW_ROWS", 32)
    got = np.asarray(
        jax.jit(
            lambda o, d: traverse8.occluded_treelet(wb, o, d, 0.01, 1e16)
        )(o, d)
    )
    np.testing.assert_array_equal(got, ref)

    act = jnp.asarray(np.arange(4096) % 4 == 0)
    got_m = np.asarray(
        jax.jit(
            lambda o, d, a: traverse8.occluded_treelet(
                wb, o, d, 0.01, 1e16, active=a
            )
        )(o, d, act)
    )
    np.testing.assert_array_equal(got_m[np.asarray(act)], ref[np.asarray(act)])
    assert not got_m[~np.asarray(act)].any()


def test_group_small_siblings_bit_identical():
    """group_small_siblings_host (round 5: fill treelets to the window
    budget by merging runs of small sibling subtrees under synthetic group
    nodes) must leave PLAIN traversal results exactly equal — the grouped
    table is a different topology (extra interior pops) over the same
    leaves and bit-identical boxes/triangles."""
    from fovpathtracing_optixcodelatest_tpu.ops import bvh8, traverse8

    _geom, tris = _scene(seed=31)
    wb_plain = bvh8.build(tris, leaf_size=4, arity=8)
    wb = bvh8.build(tris, leaf_size=4, arity=8, treelet_budget=24)
    # groups must actually form on this shape (else the test is vacuous)
    assert wb.num_rows > wb_plain.num_rows
    assert wb.top_rows > 0

    # every bottom (treelet-region) subtree reachable from a top NODE row
    # spans <= budget rows (only NODE rows carry child codes — leaf rows'
    # code columns are triangle data)
    table = np.asarray(wb.table)
    codes = table[:, 3 * wb.arity : 4 * wb.arity].view(np.int32)
    node_rows = set()
    stack = [0]
    while stack:
        r = stack.pop()
        if r in node_rows:
            continue
        node_rows.add(r)
        for c in codes[r]:
            if c != bvh8.EMPTY and (c & 3) == bvh8.KIND_NODE:
                stack.append(int(c) >> 2)
    spans = {}

    def span_of(row):
        if row in spans:
            return spans[row]
        total = 1
        for c in codes[row]:
            if c == bvh8.EMPTY:
                continue
            if (c & 3) == bvh8.KIND_LEAF:
                total += 1
            elif (c & 3) == bvh8.KIND_NODE:
                total += span_of(int(c) >> 2)
        spans[row] = total
        return total

    checked = 0
    for r in sorted(node_rows):
        if r >= wb.top_rows:
            continue
        for c in codes[r]:
            if c != bvh8.EMPTY and (c & 3) == bvh8.KIND_NODE:
                child = int(c) >> 2
                if child >= wb.top_rows:  # a treelet root
                    assert span_of(child) <= 24
                    checked += 1
    assert checked > 0

    o, d = _rand_rays(4096, seed=17)
    ref = jax.jit(
        lambda o, d: traverse8.closest_hit(wb_plain, o, d, 0.01, 1e16)
    )(o, d)
    got = jax.jit(
        lambda o, d: traverse8.closest_hit(wb, o, d, 0.01, 1e16)
    )(o, d)
    hit_ref = np.asarray(ref["hit"])
    np.testing.assert_array_equal(np.asarray(got["hit"]), hit_ref)
    np.testing.assert_array_equal(
        np.asarray(got["tri_id"]), np.asarray(ref["tri_id"])
    )
    for k in ("t", "u", "v"):
        np.testing.assert_array_equal(
            np.asarray(got[k])[hit_ref], np.asarray(ref[k])[hit_ref],
            err_msg=k,
        )
    occ_ref = np.asarray(
        jax.jit(lambda o, d: traverse8.occluded(wb_plain, o, d, 0.01, 1e16))(
            o, d
        )
    )
    occ_got = np.asarray(
        jax.jit(lambda o, d: traverse8.occluded(wb, o, d, 0.01, 1e16))(o, d)
    )
    np.testing.assert_array_equal(occ_got, occ_ref)
