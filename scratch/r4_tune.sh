#!/bin/bash
# Round-4 constant re-tune at the current cost structure (post packed-stack,
# slim sorts, dyn-trip): chunk size x phase1_cap x drains.
# Each combo runs in its own process (env constants read at import).
cd /root/repo
for combo in "32768 14 2" "65536 14 2" "65536 12 2" "32768 12 2" "32768 16 2" "32768 14 1" "32768 14 3" "16384 14 2"; do
  set -- $combo
  echo "=== CHUNK=$1 cap=$2 drains=$3"
  FOVTPU_CHUNK=$1 FOVTPU_DRAINS=$3 FOVTPU_CAP=$2 timeout 700 python - << 'EOF' 2>&1 | grep -E "ms/frame|Error"
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
config = RenderConfig(width=width, height=height,
                      traversal_phase1_cap=int(os.environ["FOVTPU_CAP"]))
canvas = film.new_canvas(width, height, pad)
t0 = time.perf_counter()
canvas, frame, stats = render_frame(scene, camp, gx, gy,
    jnp.asarray(0, jnp.int32), canvas, key, config, schedule)
_ = np.asarray(frame)
c = time.perf_counter() - t0
for i in range(2):
    canvas, frame, stats = render_frame(scene, camp, gx, gy,
        jnp.asarray(i + 1, jnp.int32), canvas,
        jax.random.fold_in(key, i + 1), config, schedule)
_ = np.asarray(stats["traces"])
n = 6
t0 = time.perf_counter()
traces = jnp.zeros((), jnp.int32)
for i in range(n):
    canvas, frame, stats = render_frame(scene, camp, gx, gy,
        jnp.asarray(i + 3, jnp.int32), canvas,
        jax.random.fold_in(key, i + 3), config, schedule)
    traces = traces + stats["traces"]
traces = int(traces)
dt = time.perf_counter() - t0
print(f"{dt/n*1e3:.0f} ms/frame, {traces/dt/1e6:.2f} Mrays/s (compile+first {c:.0f}s)",
      file=sys.stderr)
EOF
done
