"""Render-time instancing (two-level TLAS/BLAS traversal, ops/tlas.py).

Twin: sutil/Scene.h:113-115 — one GAS per unique mesh shared by N instances
via a top-level IAS. Checks: (1) traversal parity vs the flattened
world-space build on a multi-instance scene (same hits/t), (2) device
memory scales with UNIQUE geometry on a 1000-instance scene, (3) the full
integrator renders instanced scenes with matching radiance, (4) rotated
instances get correctly transformed shading normals.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from fovpathtracing_optixcodelatest_tpu.config import RenderConfig
from fovpathtracing_optixcodelatest_tpu.models.camera import Camera
from fovpathtracing_optixcodelatest_tpu.models.instance import instanced
from fovpathtracing_optixcodelatest_tpu.models.material import Material
from fovpathtracing_optixcodelatest_tpu.models.mesh import (
    make_box,
    make_icosphere,
)
from fovpathtracing_optixcodelatest_tpu.models.probe import constant_probe
from fovpathtracing_optixcodelatest_tpu.models.scene import (
    build_scene,
    build_scene_instanced,
)
from fovpathtracing_optixcodelatest_tpu.ops import traverse8
from fovpathtracing_optixcodelatest_tpu.render.integrator import trace_paths

CFG = RenderConfig(width=16, height=16)


def _translate(x, y, z):
    m = np.eye(4)
    m[:3, 3] = (x, y, z)
    return m


def _rot_y(deg):
    a = np.radians(deg)
    m = np.eye(4)
    m[0, 0] = np.cos(a)
    m[0, 2] = np.sin(a)
    m[2, 0] = -np.sin(a)
    m[2, 2] = np.cos(a)
    return m


def _grid_scene(nx=4, nz=4, rot=False):
    mat = Material(color=(0.8, 0.6, 0.4), roughness=0.8)
    box = make_box((-0.4, 0.0, -0.4), (0.4, 0.8, 0.4), mat)
    ball = make_icosphere((0.0, 1.1, 0.0), 0.25, 1,
                          Material(color=(0.3, 0.5, 0.9), roughness=0.4))
    placements = []
    k = 0
    for i in range(nx):
        for j in range(nz):
            m = _translate(i * 1.5, 0.0, j * 1.5)
            if rot and (k % 3 == 1):
                m = m @ _rot_y(35.0)
            placements.append((k % 2, m))
            k += 1
    return instanced([box, ball], placements)


def _rays_grid(n, seed=0, extent=6.0):
    rng = np.random.default_rng(seed)
    o = np.stack([
        rng.uniform(-1.0, extent, n),
        np.full(n, 5.0),
        rng.uniform(-1.0, extent, n),
    ], 1).astype(np.float32)
    d = rng.normal(size=(n, 3))
    d[:, 1] = -np.abs(d[:, 1]) - 1.0
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d.astype(np.float32))


def test_two_level_traversal_matches_flattened():
    sc = _grid_scene(4, 4, rot=True)
    scene_i = build_scene_instanced(sc, probe=constant_probe((2.0,) * 3))
    scene_f = build_scene(sc.flatten(), probe=constant_probe((2.0,) * 3))
    assert scene_i.bvh.instanced and not scene_f.bvh.instanced

    n = 2048
    o, d = _rays_grid(n)
    hi = traverse8.closest_hit(scene_i.bvh, o, d, 0.01, 1e16)
    hf = traverse8.closest_hit(scene_f.bvh, o, d, 0.01, 1e16)
    hit_i = np.asarray(hi["hit"])
    hit_f = np.asarray(hf["hit"])
    np.testing.assert_array_equal(hit_i, hit_f)
    ti = np.asarray(hi["t"])[hit_i]
    tf = np.asarray(hf["t"])[hit_i]
    np.testing.assert_allclose(ti, tf, rtol=2e-5, atol=1e-4)
    # hit instances are in range and plausible
    inst = np.asarray(hi["inst"])
    assert inst[hit_i].min() >= 0
    assert inst[hit_i].max() < scene_i.bvh.num_instances
    assert inst[~hit_i].max() == -1 if (~hit_i).any() else True

    # occlusion parity (no backface culling: boxes are closed, orientation
    # matches between object and world space for these transforms)
    occ_i = traverse8.occluded(scene_i.bvh, o, d, 0.01, 1e16,
                               cull_backface=False)
    occ_f = traverse8.occluded(scene_f.bvh, o, d, 0.01, 1e16,
                               cull_backface=False)
    np.testing.assert_array_equal(np.asarray(occ_i), np.asarray(occ_f))


def test_staged_two_level_matches_plain():
    sc = _grid_scene(5, 5, rot=True)
    scene_i = build_scene_instanced(sc, probe=constant_probe((2.0,) * 3))
    n = 4096
    o, d = _rays_grid(n, seed=3, extent=7.0)
    plain = traverse8.closest_hit(scene_i.bvh, o, d, 0.01, 1e16)
    staged = traverse8.closest_hit_staged(scene_i.bvh, o, d, 0.01, 1e16,
                                          phase1_cap=6, phase1_stack=12)
    np.testing.assert_array_equal(np.asarray(plain["hit"]),
                                  np.asarray(staged["hit"]))
    np.testing.assert_allclose(np.asarray(plain["t"]),
                               np.asarray(staged["t"]), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(plain["inst"]),
                                  np.asarray(staged["inst"]))


def test_thousand_instances_memory_scales_with_unique():
    mat = Material(color=(0.7, 0.7, 0.7), roughness=0.9)
    ball = make_icosphere((0.0, 0.0, 0.0), 0.45, 2, mat)  # 320 tris
    placements = []
    for i in range(1000):
        placements.append(
            (0, _translate((i % 32) * 1.2, ((i // 32) % 8) * 1.3,
                           (i // 256) * 1.4))
        )
    sc = instanced([ball], placements)
    scene_i = build_scene_instanced(sc, probe=constant_probe((2.0,) * 3))
    assert scene_i.bvh.num_instances == 1000
    # geometry memory ∝ unique: 320 tris, not 320,000
    assert scene_i.num_triangles == 320
    # table: TLAS (~1000/16 nodes) + 1000 instance rows + ONE mesh's BLAS
    blas_rows = scene_i.bvh.num_rows - scene_i.bvh.blas_base
    assert blas_rows < 120  # one sphere's worth
    assert scene_i.bvh.num_rows < 1450  # 273 TLAS + 1000 inst + ~50 BLAS
    flat_rows_estimate = blas_rows * 1000  # what round-2 flatten() would pay
    assert scene_i.bvh.num_rows * 20 < flat_rows_estimate

    # a few rays render correctly through the integrator
    n = 512
    o, d = _rays_grid(n, seed=5, extent=20.0)
    out = trace_paths(scene_i, o, d, jnp.ones(n, bool),
                      jax.random.PRNGKey(0), CFG)
    rad = np.asarray(out["radiance"])
    assert np.isfinite(rad).all()
    assert rad.max() > 0


def test_integrator_radiance_matches_flattened():
    """Full path-traced radiance on instanced vs flattened builds: same RNG
    streams, same geometry -> statistically identical images (tiny fp drift
    from the transform arithmetic only)."""
    sc = _grid_scene(3, 3, rot=True)
    probe = constant_probe((2.0,) * 3)
    scene_i = build_scene_instanced(sc, probe=probe)
    scene_f = build_scene(sc.flatten(), probe=probe)
    n = 2048
    o, d = _rays_grid(n, seed=7, extent=4.0)
    act = jnp.ones(n, bool)
    key = jax.random.PRNGKey(2)
    out_i = trace_paths(scene_i, o, d, act, key, CFG)
    out_f = trace_paths(scene_f, o, d, act, key, CFG)
    ri = np.asarray(out_i["radiance"])
    rf = np.asarray(out_f["radiance"])
    assert np.isfinite(ri).all()
    # mean radiance agreement (paths diverge on fp-tie hits only)
    np.testing.assert_allclose(ri.mean(0), rf.mean(0), rtol=0.05, atol=0.01)
    # majority of paths bitwise-or-near identical
    close = np.isclose(ri, rf, rtol=1e-3, atol=1e-3).all(1)
    assert close.mean() > 0.9


def test_rotated_instance_normals():
    """A 90-degree rotated box instance must shade with rotated normals:
    rays hitting its (object) +x face rotated to world +z see a +z normal."""
    mat = Material(color=(1.0, 1.0, 1.0), roughness=1.0)
    box = make_box((0.0, 0.0, 0.0), (1.0, 1.0, 1.0), mat)  # center+half
    sc = instanced([box], [(0, _rot_y(90.0))])
    scene_i = build_scene_instanced(sc, probe=constant_probe((2.0,) * 3))
    n = 64
    o = jnp.asarray(np.tile([[0.0, 0.0, 5.0]], (n, 1)).astype(np.float32))
    dd = np.tile([[0.0, 0.0, -1.0]], (n, 1)).astype(np.float32)
    d = jnp.asarray(dd)
    out = trace_paths(scene_i, o, d, jnp.ones(n, bool),
                      jax.random.PRNGKey(1), CFG)
    nrm = np.asarray(out["normal"])
    # primary AOV normal should be ~[0, 0, 1] (the rotated face normal)
    assert np.allclose(np.abs(nrm[:, 2]), 1.0, atol=1e-3), nrm[:4]
    assert np.allclose(nrm[:, 0], 0.0, atol=1e-3)
