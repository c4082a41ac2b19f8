"""Round-5 cap sweep part B: 388k caps {32, 40} (26 gave +19% and rising)
and the 10M L24/A32 scene at caps {26, 32} (it ran at the bench-tree cap 14
in every prior measurement). Deeper trees need a phase-1 budget that covers
their larger p90 pop count.
Run: python -c "exec(open('scratch/r5_deepcap_b.py').read())"
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
schedule = FoveationSchedule.reference_32_16_8()
pad = film.schedule_padding(schedule, width, height)
gx = jnp.asarray(width // 2, jnp.int32)
gy = jnp.asarray(height // 2, jnp.int32)
key = jax.random.PRNGKey(0)


def measure(tag, scene, camp, config, n=3):
    canvas = film.new_canvas(width, height, pad)
    t0 = time.perf_counter()
    canvas, frame, stats = render_frame(
        scene, camp, gx, gy, jnp.asarray(0, jnp.int32), canvas, key,
        config, schedule)
    _ = np.asarray(frame)
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


meshes, cam = scenes.box_city_fast(n=180, seed=0)
camp = dataclasses.replace(cam, aspect=width / height).device_params()
scene = build_scene(meshes, probe=gradient_sky_probe())
base = RenderConfig(width=width, height=height)
for cap in (32, 40):
    jax.clear_caches()
    measure(f"388k cap{cap}", scene, camp,
            dataclasses.replace(base, traversal_phase1_cap=cap))
del scene
jax.clear_caches()

meshes, cam = scenes.box_city_fast(n=913, seed=0)
camp = dataclasses.replace(cam, aspect=width / height).device_params()
t0 = time.perf_counter()
scene = build_scene(meshes, probe=gradient_sky_probe())
print(f"10M build {time.perf_counter()-t0:.1f}s ({scene.bvh.num_rows} rows)",
      file=sys.stderr, flush=True)
for cap in (26, 32):
    jax.clear_caches()
    measure(f"10M cap{cap}", scene, camp,
            dataclasses.replace(base, traversal_phase1_cap=cap))
