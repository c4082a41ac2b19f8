"""Round-5 packing sweep #2: L24/A32 won at 10M (0.30 -> 0.35). Probe
further along the fewer-pops curve and the treelet leg on the halved table:
  a) L32/A32 at 10M (320-col rows)
  b) L24/A32 at 10M with treelet routing r2/k4 (612k rows, ~8k treelets)
  c) L24/A32 at 1.9M (does the win hold at the smaller deep scale?)
Run: python -c "exec(open('scratch/r5_deeppack2.py').read())"
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
from fovpathtracing_optixcodelatest_tpu.ops import traverse8
from fovpathtracing_optixcodelatest_tpu.render import film
from fovpathtracing_optixcodelatest_tpu.render.renderer import render_frame

width, height = 960, 540
config = RenderConfig(width=width, height=height)
schedule = FoveationSchedule.reference_32_16_8()
pad = film.schedule_padding(schedule, width, height)
gx = jnp.asarray(width // 2, jnp.int32)
gy = jnp.asarray(height // 2, jnp.int32)
key = jax.random.PRNGKey(0)


def measure(tag, scene, camp, n=3):
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


def build(n, leaf, arity):
    meshes, cam = scenes.box_city_fast(n=n, seed=0)
    camp = dataclasses.replace(cam, aspect=width / height).device_params()
    t0 = time.perf_counter()
    scene = build_scene(meshes, probe=gradient_sky_probe(),
                        leaf_size=leaf, arity=arity)
    print(f"[n={n} L{leaf}/A{arity}] build {time.perf_counter()-t0:.1f}s: "
          f"{scene.bvh.num_rows} rows "
          f"({scene.bvh.table.size*4/1e6:.0f} MB), "
          f"stack {scene.bvh.stack_depth}, top {scene.bvh.top_rows}",
          file=sys.stderr, flush=True)
    return scene, camp


# a) L32/A32 at 10M
scene, camp = build(913, 32, 32)
measure("10M L32/A32", scene, camp)
del scene
jax.clear_caches()

# b) L24/A32 at 10M, treelet routing on (cached build)
scene, camp = build(913, 24, 32)
traverse8.TREELET_MAX_ROWS = 1 << 40
measure("10M L24/A32 treelet r2/k4", scene, camp)
traverse8.TREELET_MAX_ROWS = 600_000
del scene
jax.clear_caches()

# c) L24/A32 at 1.9M
scene, camp = build(390, 24, 32)
measure("1.9M L24/A32", scene, camp)
