"""Retune the traversal constants for the L6/A16 64-col tree (all were tuned
at L14): phase1_cap sweep in-process; chunk/drains via FOVTPU_* env (separate
processes — see the shell loop in the session log). Bench config."""
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
schedule = FoveationSchedule.reference_32_16_8()
camp = dataclasses.replace(cam, aspect=width / height).device_params()
pad = film.schedule_padding(schedule, width, height)
gx = jnp.asarray(width // 2, jnp.int32)
gy = jnp.asarray(height // 2, jnp.int32)
key = jax.random.PRNGKey(0)
env_tag = (f"chunk={os.environ.get('FOVTPU_CHUNK', '32768')} "
           f"drains={os.environ.get('FOVTPU_DRAINS', '2')}")


def measure(tag, config, n=6):
    canvas = film.new_canvas(width, height, pad)
    t0 = time.perf_counter()
    canvas, frame, stats = render_frame(
        scene, camp, gx, gy, jnp.asarray(0, jnp.int32), canvas, key,
        config, schedule)
    _ = np.asarray(frame)
    c = time.perf_counter() - t0
    for i in range(2):
        canvas, frame, stats = render_frame(
            scene, camp, gx, gy, jnp.asarray(i + 1, jnp.int32), canvas,
            jax.random.fold_in(key, i + 1), config, schedule)
    _ = np.asarray(stats["traces"])
    t0 = time.perf_counter()
    traces = jnp.zeros((), jnp.int32)
    for i in range(n):
        canvas, frame, stats = render_frame(
            scene, camp, gx, gy, jnp.asarray(i + 3, jnp.int32), canvas,
            jax.random.fold_in(key, i + 3), config, schedule)
        traces = traces + stats["traces"]
    traces = int(traces)
    dt = time.perf_counter() - t0
    print(f"{env_tag} {tag}: {dt/n*1e3:.0f} ms/frame, "
          f"{traces/dt/1e6:.2f} Mrays/s (compile+first {c:.0f}s)",
          file=sys.stderr)


caps = [int(c) for c in os.environ.get("FOVTPU_CAPS", "12").split(",")]
for cap in caps:
    measure(f"cap={cap:2d}",
            RenderConfig(width=width, height=height,
                         traversal_phase1_cap=cap))
