"""Scene-sharded multi-chip rendering (parallel/scene_shard.py): tri_pack
row-sharded over the 8-virtual-device CPU mesh must render BIT-IDENTICALLY
to the single-chip renderer while each device holds only 1/8 of the
triangle table (VERDICT r4 item 6)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from fovpathtracing_optixcodelatest_tpu.config import (
    FoveationSchedule,
    RenderConfig,
)
from fovpathtracing_optixcodelatest_tpu.models import scenes
from fovpathtracing_optixcodelatest_tpu.models.probe import gradient_sky_probe
from fovpathtracing_optixcodelatest_tpu.models.scene import build_scene
from fovpathtracing_optixcodelatest_tpu.parallel import scene_shard, tiles
from fovpathtracing_optixcodelatest_tpu.render import film
from fovpathtracing_optixcodelatest_tpu.render.renderer import render_frame


def test_scene_sharded_bit_identical():
    w, h = 48, 36
    meshes, cam = scenes.box_city(n=3, seed=2)
    scene = build_scene(meshes, probe=gradient_sky_probe(width=64, height=32))
    camp = dataclasses.replace(cam, aspect=w / h).device_params()
    cfg = RenderConfig(width=w, height=h, max_depth=3)
    sched = FoveationSchedule.uniform(spp=8)
    pad = film.schedule_padding(sched, w, h)
    canvas = film.new_canvas(w, h, pad)
    gx = jnp.asarray(24, jnp.int32)
    gy = jnp.asarray(18, jnp.int32)
    sub = jnp.asarray(0, jnp.int32)
    key = jax.random.PRNGKey(7)

    c1, f1, s1 = render_frame(
        scene, camp, gx, gy, sub, canvas, key, cfg, sched
    )

    mesh = tiles.make_mesh()
    n_dev = mesh.shape[tiles.AXIS]
    assert n_dev == 8
    padded = scene_shard.pad_scene_rows(scene, n_dev)
    t_pad = padded.geom.tri_pack.shape[0]
    assert t_pad % n_dev == 0

    fn = jax.jit(
        lambda sc, ca, x, y, su, cv, k: scene_shard.render_frame_scene_sharded(
            sc, ca, x, y, su, cv, k, cfg, sched, mesh
        )
    )
    c2, f2, s2 = fn(padded, camp, gx, gy, sub, canvas, key)

    # the table really is distributed: each device holds t_pad/8 rows
    shards = padded.geom.tri_pack.shape[0] // n_dev
    # (the jit arg is committed per the spec inside shard_map; verify via
    # the addressable shards of an explicitly placed copy)
    from jax.sharding import NamedSharding, PartitionSpec as P

    placed = jax.device_put(
        padded.geom.tri_pack, NamedSharding(mesh, P(tiles.AXIS))
    )
    for s in placed.addressable_shards:
        assert s.data.shape[0] == shards

    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    assert int(s1["traces"]) == int(s2)


def test_renderer_multichip_scene_matches_single():
    """Renderer(multichip='scene') — the CLI-facing wrapper — must produce
    the single-chip frame bit-exactly."""
    from fovpathtracing_optixcodelatest_tpu.render.renderer import Renderer

    w, h = 48, 36
    meshes, cam = scenes.box_city(n=3, seed=2)
    cam = dataclasses.replace(cam, aspect=w / h)
    cfg = RenderConfig(width=w, height=h, max_depth=2)
    sched = FoveationSchedule.uniform(spp=8)

    r1 = Renderer(meshes=meshes, config=cfg, schedule=sched,
                  probe=gradient_sky_probe(width=64, height=32))
    r1.set_camera(cam)
    f1 = r1.render()

    r2 = Renderer(meshes=meshes, config=cfg, schedule=sched,
                  probe=gradient_sky_probe(width=64, height=32),
                  multichip="scene")
    r2.set_camera(cam)
    f2 = r2.render()
    np.testing.assert_array_equal(f1, f2)
    assert int(r1._stats["traces"]) == int(r2._stats["traces"])
