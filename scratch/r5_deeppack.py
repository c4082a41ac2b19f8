"""Round-5 10M-tri packing sweep: at HBM the row gather is per-INDEX-rate,
so FEWER POPS win (PLAN rule 31: L12/A32 beat L6/A16 at 1.9M). Next step on
that curve: bigger leaves / wider arity cut tree depth (and pops) further.

Configs (plain routing; TREELET_MAX_ROWS=600k keeps 1.34M rows plain):
  L12/A32 (current default, cached), L24/A32, L16/A64.
Run: FOVTPU_DEEPN=913 python -c "exec(open('scratch/r5_deeppack.py').read())"
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

N = int(os.environ.get("FOVTPU_DEEPN", "913"))
width, height = 960, 540
config = RenderConfig(width=width, height=height)
schedule = FoveationSchedule.reference_32_16_8()
pad = film.schedule_padding(schedule, width, height)
gx = jnp.asarray(width // 2, jnp.int32)
gy = jnp.asarray(height // 2, jnp.int32)
key = jax.random.PRNGKey(0)
meshes, cam = scenes.box_city_fast(n=N, seed=0)
camp = dataclasses.replace(cam, aspect=width / height).device_params()


def measure(tag, leaf, arity, n=3):
    t0 = time.perf_counter()
    scene = build_scene(meshes, probe=gradient_sky_probe(),
                        leaf_size=leaf, arity=arity)
    print(f"[{tag}] build {time.perf_counter()-t0:.1f}s: "
          f"{scene.bvh.num_rows} rows "
          f"({scene.bvh.table.size*4/1e6:.0f} MB), "
          f"stack {scene.bvh.stack_depth}", file=sys.stderr, flush=True)
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
    del scene
    jax.clear_caches()


for tag, leaf, arity in (
    ("L12/A32", 12, 32),
    ("L24/A32", 24, 32),
    ("L16/A64", 16, 64),
):
    measure(tag, leaf, arity)
