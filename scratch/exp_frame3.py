import dataclasses, sys, time
import numpy as np
import jax, jax.numpy as jnp
from fovpathtracing_optixcodelatest_tpu.config import FoveationSchedule, RenderConfig
from fovpathtracing_optixcodelatest_tpu.models import scenes
from fovpathtracing_optixcodelatest_tpu.models.probe import gradient_sky_probe
from fovpathtracing_optixcodelatest_tpu.models.scene import build_scene
from fovpathtracing_optixcodelatest_tpu.models.mesh import host_triangles
from fovpathtracing_optixcodelatest_tpu.ops.bvh_native import build as build_native
from fovpathtracing_optixcodelatest_tpu.render import film
from fovpathtracing_optixcodelatest_tpu.render.renderer import render_frame
from fovpathtracing_optixcodelatest_tpu.ops import traverse8

width, height = 960, 540
meshes, cam = scenes.box_city(n=24, seed=0)
scene = build_scene(meshes, probe=gradient_sky_probe())
schedule = FoveationSchedule.reference_32_16_8()
camp = dataclasses.replace(cam, aspect=width / height).device_params()
pad = film.schedule_padding(schedule, width, height)
gx = jnp.asarray(width // 2, jnp.int32); gy = jnp.asarray(height // 2, jnp.int32)
key = jax.random.PRNGKey(0)
tris = host_triangles(meshes)

import fovpathtracing_optixcodelatest_tpu.ops.traverse8 as t8
for leaf, chunk in ((14, 16384), (14, 8192), (7, 16384), (7, 8192)):
    t8.DEFAULT_CHUNK = chunk
    bvh = build_native(tris, leaf_size=leaf)
    sc = dataclasses.replace(scene, bvh=bvh)
    config = RenderConfig(width=width, height=height)
    canvas = film.new_canvas(width, height, pad)
    c2, frame, stats = render_frame(sc, camp, gx, gy, jnp.asarray(0, jnp.int32), canvas, key, config, schedule)
    _ = np.asarray(frame)
    ts = []
    for i in (1, 2):
        t0 = time.perf_counter()
        c2, frame, stats = render_frame(sc, camp, gx, gy, jnp.asarray(i, jnp.int32), canvas, key, config, schedule)
        _ = np.asarray(frame)
        ts.append(time.perf_counter() - t0)
    dt = min(ts); tr = int(stats["traces"])
    print(f"leaf={leaf} chunk={chunk}: {dt:.2f}s/frame {tr/dt/1e6:.1f} Mrays/s", file=sys.stderr)
