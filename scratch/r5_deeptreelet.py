"""Round-5 grouped-treelet deep-scene A/B (VERDICT r4 item 2: make the
windowed treelet mechanism win at 1.34M rows — 10M tris — where fanout
quantization made ~1.3k-row treelets lose to plain gathers, PLAN rule 47).

group_small_siblings_host now fills treelets to the 8k window budget, so
rays cross ~6x fewer treelets. Measures at SCALE=1.9M (n=180*?) or 10M:
  A. plain routing (TREELET_MAX_ROWS=0 => use_treelet False)
  B. treelet r2/k4 (defaults), routing forced on
  C. treelet r3/k8
Usage: FOVTPU_DEEPN=390 python -c "exec(open('scratch/r5_deeptreelet.py').read())"
  (n=390 ~ 1.9M tris; n=913 ~ 10M)
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

N = int(os.environ.get("FOVTPU_DEEPN", "390"))
width, height = 960, 540
meshes, cam = scenes.box_city_fast(n=N, seed=0)
t0 = time.perf_counter()
scene = build_scene(meshes, probe=gradient_sky_probe())
print(f"build {time.perf_counter()-t0:.1f}s: {scene.num_triangles} tris, "
      f"{scene.bvh.num_rows} rows ({scene.bvh.table.size*4/1e6:.0f} MB), "
      f"top_rows {scene.bvh.top_rows}, top_stack {scene.bvh.top_stack}, "
      f"treelet_stack {scene.bvh.treelet_stack}, "
      f"stack_depth {scene.bvh.stack_depth}", file=sys.stderr, flush=True)

config = RenderConfig(width=width, height=height)
schedule = FoveationSchedule.reference_32_16_8()
camp = dataclasses.replace(cam, aspect=width / height).device_params()
pad = film.schedule_padding(schedule, width, height)
gx = jnp.asarray(width // 2, jnp.int32)
gy = jnp.asarray(height // 2, jnp.int32)
key = jax.random.PRNGKey(0)


def measure(tag, n=3):
    canvas = film.new_canvas(width, height, pad)
    t0 = time.perf_counter()
    canvas, frame, stats = render_frame(
        scene, camp, gx, gy, jnp.asarray(0, jnp.int32), canvas, key,
        config, schedule)
    ref0 = np.asarray(frame)
    print(f"[{tag}] compile+first: {time.perf_counter()-t0:.1f}s",
          file=sys.stderr, flush=True)
    canvas, frame, stats = render_frame(
        scene, camp, gx, gy, jnp.asarray(1, jnp.int32), canvas,
        jax.random.fold_in(key, 1), config, schedule)
    _ = np.asarray(stats["traces"])
    t0 = time.perf_counter()
    traces = jnp.zeros((), jnp.int32)
    for i in range(n):
        canvas, frame, stats = render_frame(
            scene, camp, gx, gy, jnp.asarray(2 + i, jnp.int32), canvas,
            jax.random.fold_in(key, 2 + i), config, schedule)
        traces = traces + stats["traces"]
    tr = int(traces)
    dt = (time.perf_counter() - t0) / n
    print(f"[{tag}] frame {dt*1e3:.0f} ms, {tr/n/dt/1e6:.2f} Mrays/s",
          file=sys.stderr, flush=True)
    return ref0


traverse8.TREELET_MAX_ROWS = 0  # force plain
ref = measure("plain")
for rounds, k in ((2, 4), (3, 8)):
    jax.clear_caches()
    traverse8.TREELET_MAX_ROWS = 1 << 40
    traverse8.TREELET_ROUNDS = rounds
    traverse8.TREELET_K = k
    got = measure(f"treelet r{rounds}/k{k}")
    same = np.array_equal(ref, got)
    print(f"[treelet r{rounds}/k{k}] bit-identical: {same}",
          file=sys.stderr, flush=True)
