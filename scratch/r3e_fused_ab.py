"""Fused-shading A/B at the bench config. FOVTPU_FUSED=on|off selects the
path. Usage: FOVTPU_FUSED=on python -c "exec(open('scratch/r3e_fused_ab.py').read())"
"""
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

mode = os.environ.get("FOVTPU_FUSED", "auto")
width, height = 960, 540
meshes, cam = scenes.box_city(n=24, seed=0)
scene = build_scene(meshes, probe=gradient_sky_probe())
config = RenderConfig(width=width, height=height, fused_shading=mode)
schedule = FoveationSchedule.reference_32_16_8()
camp = dataclasses.replace(cam, aspect=width / height).device_params()
pad = film.schedule_padding(schedule, width, height)
canvas0 = film.new_canvas(width, height, pad)
gx = jnp.asarray(width // 2, jnp.int32)
gy = jnp.asarray(height // 2, jnp.int32)
key = jax.random.PRNGKey(0)

t0 = time.perf_counter()
canvas, frame, stats = render_frame(
    scene, camp, gx, gy, jnp.asarray(0, jnp.int32), canvas0, key,
    config, schedule)
_ = np.asarray(frame)
print(f"[{mode}] compile+first: {time.perf_counter()-t0:.1f}s", file=sys.stderr)
for i in range(2):
    canvas, frame, stats = render_frame(
        scene, camp, gx, gy, jnp.asarray(i + 1, jnp.int32), canvas,
        jax.random.fold_in(key, i + 1), config, schedule)
_ = np.asarray(stats["traces"])

best = np.inf
tr = 0
for w in range(2):
    t0 = time.perf_counter()
    traces = jnp.zeros((), jnp.int32)
    for i in range(4):
        canvas, frame, stats = render_frame(
            scene, camp, gx, gy, jnp.asarray(3 + 4 * w + i, jnp.int32),
            canvas, jax.random.fold_in(key, 3 + 4 * w + i), config, schedule)
        traces = traces + stats["traces"]
    tr = int(traces)
    dt = (time.perf_counter() - t0) / 4
    best = min(best, dt)
print(f"[{mode}] frame: {best*1e3:.0f} ms, traces/frame {tr//4}, "
      f"{tr/4/best/1e6:.2f} Mrays/s", file=sys.stderr)
