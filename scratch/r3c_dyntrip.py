"""Frame-scale A/B for FOVTPU_DYNTRIP (set env before running). Bench config."""
import dataclasses, os, time
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
config = RenderConfig(width=width, height=height, compact_bounces=True,
                      traversal_phase1_cap=int(os.environ.get("FOVTPU_CAP", 14)))
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
ref = np.asarray(frame)
print(f"compile+first: {time.perf_counter() - t0:.1f}s "
      f"dyntrip={os.environ.get('FOVTPU_DYNTRIP', '1')}")
# discard window
for i in range(2):
    canvas, frame, stats = render_frame(
        scene, camp, gx, gy, jnp.asarray(i + 1, jnp.int32), canvas,
        jax.random.fold_in(key, i + 1), config, schedule)
_ = np.asarray(stats["traces"])
n = 8
t0 = time.perf_counter()
traces = jnp.zeros((), jnp.int64)
for i in range(n):
    canvas, frame, stats = render_frame(
        scene, camp, gx, gy, jnp.asarray(i + 3, jnp.int32), canvas,
        jax.random.fold_in(key, i + 3), config, schedule)
    traces = traces + stats["traces"].astype(jnp.int64)
tr = int(np.asarray(traces))
dt = time.perf_counter() - t0
print(f"{n} frames in {dt:.2f}s -> {dt / n * 1000:.0f} ms/frame, "
      f"{tr / dt / 1e6:.2f} Mrays/s")
# checksum for bit-identity across variants (frame 0 content)
print("frame0 sum:", float(ref.sum()), "sha:", hash(ref.tobytes()))
