"""Profile ONE deep-scene frame (388k tris, bench deep datapoint config).
Run after the executable is in the compile cache (r3d_deepframe at
FOVTPU_CITY=180). Writes the xplane to /tmp/fovprof_deep."""
import dataclasses, sys, time
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
meshes, cam = scenes.box_city_fast(n=180, seed=0)
scene = build_scene(meshes, probe=gradient_sky_probe())
print(f"{scene.num_triangles} tris rows={scene.bvh.num_rows} "
      f"W={scene.bvh.table.shape[1]} stack={scene.bvh.stack_depth}",
      file=sys.stderr)
config = RenderConfig(width=width, height=height)
schedule = FoveationSchedule.reference_32_16_8()
camp = dataclasses.replace(cam, aspect=width / height).device_params()
pad = film.schedule_padding(schedule, width, height)
gx = jnp.asarray(width // 2, jnp.int32)
gy = jnp.asarray(height // 2, jnp.int32)
key = jax.random.PRNGKey(0)
canvas = film.new_canvas(width, height, pad)

t0 = time.perf_counter()
canvas, frame, stats = render_frame(
    scene, camp, gx, gy, jnp.asarray(0, jnp.int32), canvas, key, config,
    schedule)
_ = np.asarray(frame)
print(f"compile+first: {time.perf_counter() - t0:.1f}s", file=sys.stderr)
# settle + discard
canvas, frame, stats = render_frame(
    scene, camp, gx, gy, jnp.asarray(1, jnp.int32), canvas,
    jax.random.fold_in(key, 1), config, schedule)
_ = np.asarray(stats["traces"])

with jax.profiler.trace("/tmp/fovprof_deep"):
    canvas, frame, stats = render_frame(
        scene, camp, gx, gy, jnp.asarray(2, jnp.int32), canvas,
        jax.random.fold_in(key, 2), config, schedule)
    _ = np.asarray(stats["traces"])
print("profiled", file=sys.stderr)
