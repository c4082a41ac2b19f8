"""Round-3 consolidated frame A/B (run when the tunnel is back):
one process, bench config, measures in order:
  1. baseline frame (current defaults: frame_compaction=True)
  2. frame_compaction=False (isolates the ring-budget win)
  3. phase1_cap_primary sweep {0, 6, 8}
Prints ms/frame + Mrays/s per config. Each config = compile (~85 s warm
cache) + 2 discard + 6 timed frames chained with one fetch.
"""
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
meshes, cam = scenes.box_city(n=24, seed=0)
scene = build_scene(meshes, probe=gradient_sky_probe())
schedule = FoveationSchedule.reference_32_16_8()
camp = dataclasses.replace(cam, aspect=width / height).device_params()
pad = film.schedule_padding(schedule, width, height)
gx = jnp.asarray(width // 2, jnp.int32)
gy = jnp.asarray(height // 2, jnp.int32)
key = jax.random.PRNGKey(0)


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
    print(f"{tag}: {dt/n*1e3:.0f} ms/frame, {traces/dt/1e6:.2f} Mrays/s "
          f"(compile+first {c:.0f}s)", file=sys.stderr)
    return dt / n


base = RenderConfig(width=width, height=height)
measure("fc=True  (default)      ", base)
measure("fc=False                ", dataclasses.replace(base, frame_compaction=False))
measure("fc=True cap_primary=6   ", dataclasses.replace(base, traversal_phase1_cap_primary=6))
measure("fc=True cap_primary=8   ", dataclasses.replace(base, traversal_phase1_cap_primary=8))
