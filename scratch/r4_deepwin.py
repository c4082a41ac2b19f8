"""Deep-scene windowed-traversal A/B on TPU.
Scenes: 1.9M tris (box_city_fast n=400) and 10M (n=913).
Configs: dfs+windowed (new default) vs plain (FOVTPU_WINMIN huge disables).
Measures raw frame rate via render_frame (bench schedule).
Env: FOVTPU_DISABLE_WINDOW=1 to run the plain arm.
"""
import os, time, sys, dataclasses
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/fovtpu_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
from fovpathtracing_optixcodelatest_tpu.ops import traverse8
if os.environ.get("FOVTPU_DISABLE_WINDOW") == "1":
    traverse8.WINDOW_MIN_ROWS = 1 << 40
    print("window DISABLED", file=sys.stderr)
else:
    print(f"window ON rows={traverse8.WINDOW_ROWS} min={traverse8.WINDOW_MIN_ROWS}",
          file=sys.stderr)
from fovpathtracing_optixcodelatest_tpu.config import FoveationSchedule, RenderConfig
from fovpathtracing_optixcodelatest_tpu.models import scenes
from fovpathtracing_optixcodelatest_tpu.models.probe import gradient_sky_probe
from fovpathtracing_optixcodelatest_tpu.models.scene import build_scene
from fovpathtracing_optixcodelatest_tpu.render import film
from fovpathtracing_optixcodelatest_tpu.render.renderer import render_frame

N = int(os.environ.get("FOVTPU_N", "400"))
W, H = 960, 540
t0 = time.perf_counter()
meshes, cam = scenes.box_city_fast(n=N, seed=0)
scene = build_scene(meshes, probe=gradient_sky_probe())
print(f"n={N} build {time.perf_counter()-t0:.1f}s rows={scene.bvh.num_rows} "
      f"dfs={scene.bvh.dfs}", file=sys.stderr)
config = RenderConfig(width=W, height=H)
schedule = FoveationSchedule.reference_32_16_8()
camp = dataclasses.replace(cam, aspect=W / H).device_params()
pad = film.schedule_padding(schedule, W, H)
canvas = film.new_canvas(W, H, pad)
gx = jnp.asarray(W // 2, jnp.int32); gy = jnp.asarray(H // 2, jnp.int32)
key = jax.random.PRNGKey(0)
t0 = time.perf_counter()
canvas, frame, stats = render_frame(scene, camp, gx, gy, jnp.asarray(0, jnp.int32), canvas, key, config, schedule)
_ = np.asarray(frame)
print(f"compile+first frame {time.perf_counter()-t0:.1f}s", file=sys.stderr)
n = int(os.environ.get("FOVTPU_FRAMES", "2"))
t0 = time.perf_counter()
traces = jnp.zeros((), jnp.int32)
for i in range(n):
    canvas, frame, stats = render_frame(scene, camp, gx, gy, jnp.asarray(i+1, jnp.int32), canvas, jax.random.fold_in(key, i+1), config, schedule)
    traces = traces + stats["traces"]
traces = int(traces); dt = time.perf_counter() - t0
print(f"n={N}: {n} frames {dt:.2f}s -> {n/dt:.3f} fps, {traces/dt/1e6:.2f} Mrays/s",
      file=sys.stderr)
