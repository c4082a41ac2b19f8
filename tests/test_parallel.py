"""Multi-chip sharding tests on the 8-virtual-device CPU mesh: the sharded
renderer must be BIT-IDENTICAL to the single-chip renderer (sample-parallel
psum + ray-id-keyed RNG)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from fovpathtracing_optixcodelatest_tpu.config import FoveationPass, FoveationSchedule, RenderConfig
from fovpathtracing_optixcodelatest_tpu.models import scenes
from fovpathtracing_optixcodelatest_tpu.models.probe import constant_probe, gradient_sky_probe
from fovpathtracing_optixcodelatest_tpu.models.scene import build_scene
from fovpathtracing_optixcodelatest_tpu.parallel import tiles
from fovpathtracing_optixcodelatest_tpu.render import film
from fovpathtracing_optixcodelatest_tpu.render.renderer import render_frame


def _setup(w=48, h=36, schedule=None):
    meshes, cam = scenes.cornell(sphere_subdiv=1)
    scene = build_scene(meshes, probe=gradient_sky_probe(width=64, height=32))
    camp = dataclasses.replace(cam, aspect=w / h).device_params()
    cfg = RenderConfig(width=w, height=h)
    schedule = schedule or FoveationSchedule.uniform(spp=8)
    pad = film.schedule_padding(schedule, w, h)
    canvas = film.new_canvas(w, h, pad)
    return scene, camp, cfg, schedule, canvas


def test_eight_device_mesh_available():
    assert len(jax.devices()) == 8


def test_sharded_uniform_bit_identical():
    scene, camp, cfg, sched, canvas = _setup()
    gx = jnp.asarray(24, jnp.int32)
    gy = jnp.asarray(18, jnp.int32)
    sub = jnp.asarray(0, jnp.int32)
    key = jax.random.PRNGKey(7)
    c1, f1, s1 = render_frame(scene, camp, gx, gy, sub, canvas, key, cfg, sched)
    mesh = tiles.make_mesh()
    assert mesh.shape[tiles.AXIS] == 8
    fn = tiles.make_sharded_renderer(cfg, sched, mesh)
    c2, f2, s2 = fn(scene, camp, gx, gy, sub, canvas, key)
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    assert int(s1["traces"]) == int(s2)


def test_sharded_foveated_bit_identical_with_odd_spp():
    """spp values that don't divide the device count exercise the padded
    sample-slot masking."""
    schedule = FoveationSchedule(
        passes=(
            FoveationPass(factor=4, spp=3, r_inner=8.0, r_outer=1e9, redraw=False),
            FoveationPass(factor=1, spp=5, r_inner=0.0, r_outer=9.0, redraw=True,
                          launch_w=18, launch_h=18, centered=True, center_offset=9),
        )
    )
    scene, camp, cfg, sched, canvas = _setup(schedule=schedule)
    gx = jnp.asarray(20, jnp.int32)
    gy = jnp.asarray(16, jnp.int32)
    sub = jnp.asarray(0, jnp.int32)
    key = jax.random.PRNGKey(3)
    c1, f1, _ = render_frame(scene, camp, gx, gy, sub, canvas, key, cfg, sched)
    fn = tiles.make_sharded_renderer(cfg, sched, tiles.make_mesh())
    c2, f2, _ = fn(scene, camp, gx, gy, sub, canvas, key)
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))


def test_sharded_accumulation_subframes():
    """Progressive accumulation across subframes matches on both paths."""
    scene, camp, cfg, sched, canvas = _setup()
    gx = jnp.asarray(24, jnp.int32)
    gy = jnp.asarray(18, jnp.int32)
    key = jax.random.PRNGKey(11)
    fn = tiles.make_sharded_renderer(cfg, sched, tiles.make_mesh())
    c_single = c_shard = canvas
    for sf in range(3):
        k = jax.random.fold_in(key, sf)
        sub = jnp.asarray(sf, jnp.int32)
        c_single, f1, _ = render_frame(scene, camp, gx, gy, sub, c_single, k, cfg, sched)
        c_shard, f2, _ = fn(scene, camp, gx, gy, sub, c_shard, k)
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
    np.testing.assert_allclose(np.asarray(c_single), np.asarray(c_shard), atol=1e-6)
