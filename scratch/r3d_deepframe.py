"""Rendered-frame deep-scene measurement: full render_frame on the 1.9M-tri
box_city_fast(n=400) at the bench config. FOVTPU_LEAF/FOVTPU_ARITY select the
BVH packing (A/B for the scene-size-dependent default)."""
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

LEAF = os.environ.get("FOVTPU_LEAF")
AR = os.environ.get("FOVTPU_ARITY")
kw = {}
if LEAF:
    kw["leaf_size"] = int(LEAF)
if AR:
    kw["arity"] = int(AR)

width, height = 960, 540
n_city = int(os.environ.get("FOVTPU_CITY", "400"))
meshes, cam = scenes.box_city_fast(n=n_city, seed=0)
t0 = time.perf_counter()
scene = build_scene(meshes, probe=gradient_sky_probe(), **kw)
print(f"{scene.num_triangles} tris rows={scene.bvh.num_rows} "
      f"W={scene.bvh.table.shape[1]} stack={scene.bvh.stack_depth} "
      f"({scene.bvh.table.size*4/1e6:.0f} MB) build "
      f"{time.perf_counter()-t0:.1f}s", file=sys.stderr)

config = RenderConfig(width=width, height=height)
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
_ = np.asarray(frame)
print(f"compile+first: {time.perf_counter() - t0:.1f}s", file=sys.stderr)
for i in range(1, 3):
    canvas, frame, stats = render_frame(
        scene, camp, gx, gy, jnp.asarray(i, jnp.int32), canvas,
        jax.random.fold_in(key, i), config, schedule)
_ = np.asarray(stats["traces"])
n = 4
t0 = time.perf_counter()
traces = jnp.zeros((), jnp.int64)
for i in range(n):
    canvas, frame, stats = render_frame(
        scene, camp, gx, gy, jnp.asarray(i + 3, jnp.int32), canvas,
        jax.random.fold_in(key, i + 3), config, schedule)
    traces = traces + stats["traces"].astype(jnp.int64)
tr = int(np.asarray(traces))
dt = time.perf_counter() - t0
print(f"deep frame: {dt / n * 1000:.0f} ms/frame, {tr / dt / 1e6:.2f} Mrays/s "
      f"(L{scene.bvh.leaf_size}/A{scene.bvh.arity})", file=sys.stderr)
