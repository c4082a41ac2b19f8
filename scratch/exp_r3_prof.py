import dataclasses, os, sys, time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/fovtpu_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
from fovpathtracing_optixcodelatest_tpu.config import FoveationSchedule, RenderConfig
from fovpathtracing_optixcodelatest_tpu.models import scenes
from fovpathtracing_optixcodelatest_tpu.models.probe import gradient_sky_probe
from fovpathtracing_optixcodelatest_tpu.models.scene import build_scene
from fovpathtracing_optixcodelatest_tpu.render import film
from fovpathtracing_optixcodelatest_tpu.render.renderer import render_frame

width, height = 960, 540
meshes, cam = scenes.box_city(n=24, seed=0)
scene = build_scene(meshes, probe=gradient_sky_probe())
config = RenderConfig(width=width, height=height, compact_bounces=True)
schedule = FoveationSchedule.reference_32_16_8()
camp = dataclasses.replace(cam, aspect=width / height).device_params()
pad = film.schedule_padding(schedule, width, height)
canvas = film.new_canvas(width, height, pad)
gx = jnp.asarray(width // 2, jnp.int32); gy = jnp.asarray(height // 2, jnp.int32)
key = jax.random.PRNGKey(0)
c2, frame, stats = render_frame(scene, camp, gx, gy, jnp.asarray(0, jnp.int32), canvas, key, config, schedule)
_ = np.asarray(frame)
os.system("rm -rf /tmp/fovprof_r3")
with jax.profiler.trace("/tmp/fovprof_r3"):
    c2, frame, stats = render_frame(scene, camp, gx, gy, jnp.asarray(2, jnp.int32), canvas, key, config, schedule)
    _ = np.asarray(frame)
