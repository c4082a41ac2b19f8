"""Round-4 A/B: temporal pop-sorting at bench config.
Measures (1) pops hint threaded frame-to-frame, (2) zero hint (= old
permutation behavior, same graph). Baseline anchor: 443-453 ms (r03 HEAD).
Run: python -c "exec(open('scratch/r4_popsort.py').read())"
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
from fovpathtracing_optixcodelatest_tpu.render import film, raygen
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
n_lanes = sum(raygen.pass_ray_count(p, width, height) for p in schedule.passes)
zero_pops = (jnp.zeros((n_lanes,), jnp.int32), jnp.zeros((n_lanes,), jnp.int32))


def measure(tag, config, thread_pops, n=6):
    canvas = film.new_canvas(width, height, pad)
    pops = zero_pops
    t0 = time.perf_counter()
    canvas, frame, stats = render_frame(
        scene, camp, gx, gy, jnp.asarray(0, jnp.int32), canvas, key,
        config, schedule, pops=pops)
    if thread_pops:
        pops = stats["pops"]
    _ = np.asarray(frame)
    c = time.perf_counter() - t0
    for i in range(2):
        canvas, frame, stats = render_frame(
            scene, camp, gx, gy, jnp.asarray(i + 1, jnp.int32), canvas,
            jax.random.fold_in(key, i + 1), config, schedule, pops=pops)
        if thread_pops:
            pops = stats["pops"]
    _ = np.asarray(stats["traces"])
    t0 = time.perf_counter()
    traces = jnp.zeros((), jnp.int32)
    for i in range(n):
        canvas, frame, stats = render_frame(
            scene, camp, gx, gy, jnp.asarray(i + 3, jnp.int32), canvas,
            jax.random.fold_in(key, i + 3), config, schedule, pops=pops)
        if thread_pops:
            pops = stats["pops"]
        traces = traces + stats["traces"]
    traces = int(traces)
    dt = time.perf_counter() - t0
    print(f"{tag}: {dt/n*1e3:.0f} ms/frame, {traces/dt/1e6:.2f} Mrays/s "
          f"(compile+first {c:.0f}s)", file=sys.stderr)
    return dt / n


cfg = RenderConfig(width=width, height=height)
measure("warm-discard (hint on)", cfg, True, n=2)
measure("pops-hint ON ", cfg, True)
measure("pops-hint OFF", cfg, False)
measure("pops-hint ON2", cfg, True)
