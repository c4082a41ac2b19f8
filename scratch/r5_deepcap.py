"""Round-5 388k-tri (bench deep datapoint) phase-1 cap sweep + treelet leg.

The 388k scene is ITERATION-bound (PLAN rule 36: 3.6x bench iterations at
equal per-iter cost); phase1_cap=14 was tuned on the shallow bench tree
(rule 24) — deeper trees push more rays past the cap into the full-depth
phase-2 re-trace. Sweep caps, then try the treelet routing (lower the deep
threshold so the 388k build gets the treelet layout; ungrouped treelet
measured +16% at 224k rows).
Run: python -c "exec(open('scratch/r5_deepcap.py').read())"
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
from fovpathtracing_optixcodelatest_tpu.ops import bvh_native
from fovpathtracing_optixcodelatest_tpu.render import film
from fovpathtracing_optixcodelatest_tpu.render.renderer import render_frame

width, height = 960, 540
schedule = FoveationSchedule.reference_32_16_8()
pad = film.schedule_padding(schedule, width, height)
gx = jnp.asarray(width // 2, jnp.int32)
gy = jnp.asarray(height // 2, jnp.int32)
key = jax.random.PRNGKey(0)
meshes, cam = scenes.box_city_fast(n=180, seed=0)
camp = dataclasses.replace(cam, aspect=width / height).device_params()


def measure(tag, scene, config, n=4):
    canvas = film.new_canvas(width, height, pad)
    t0 = time.perf_counter()
    canvas, frame, stats = render_frame(
        scene, camp, gx, gy, jnp.asarray(0, jnp.int32), canvas, key,
        config, schedule)
    ref0 = np.asarray(frame)
    print(f"[{tag}] compile+first: {time.perf_counter()-t0:.1f}s",
          file=sys.stderr, flush=True)
    for j in (1, 2):
        canvas, frame, stats = render_frame(
            scene, camp, gx, gy, jnp.asarray(j, jnp.int32), canvas,
            jax.random.fold_in(key, j), config, schedule)
    _ = np.asarray(stats["traces"])
    t0 = time.perf_counter()
    traces = jnp.zeros((), jnp.int32)
    for i in range(n):
        canvas, frame, stats = render_frame(
            scene, camp, gx, gy, jnp.asarray(3 + i, jnp.int32), canvas,
            jax.random.fold_in(key, 3 + i), config, schedule)
        traces = traces + stats["traces"]
    tr = int(traces)
    dt = (time.perf_counter() - t0) / n
    print(f"[{tag}] frame {dt*1e3:.0f} ms, {tr/n/dt/1e6:.2f} Mrays/s",
          file=sys.stderr, flush=True)
    return ref0


scene = build_scene(meshes, probe=gradient_sky_probe())
print(f"default build: {scene.bvh.num_rows} rows, top {scene.bvh.top_rows}",
      file=sys.stderr)
base = RenderConfig(width=width, height=height)
ref = measure("cap14 (default)", scene, base)
for cap in (20, 26):
    jax.clear_caches()
    got = measure(
        f"cap{cap}", scene,
        dataclasses.replace(base, traversal_phase1_cap=cap),
    )
    print(f"[cap{cap}] bit-identical: {np.array_equal(ref, got)}",
          file=sys.stderr, flush=True)

# treelet leg: rebuild with the deep layout (L12/A32 + treelet budget)
jax.clear_caches()
bvh_native.DEEP_TRIS_THRESHOLD = 300_000
scene_t = build_scene(meshes, probe=gradient_sky_probe())
print(f"treelet build: {scene_t.bvh.num_rows} rows, "
      f"top {scene_t.bvh.top_rows}, tstack {scene_t.bvh.treelet_stack}",
      file=sys.stderr)
got = measure("treelet L12/A32", scene_t, base)
print(f"[treelet] bit-identical: {np.array_equal(ref, got)}",
      file=sys.stderr, flush=True)
