"""Round-3 frame-scale A/B: bench-config frame timing across integrator
settings (fused staged sorts landed; sweep phase-1 caps incl. per-bounce).
Run from /root/repo via: python -c "exec(open('scratch/exp_r3_frame.py').read())"
NEVER with background CPU load.
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

VARIANTS = [
    ("cap12 (r2 default)", dict()),
    ("cap12/primary8", dict(traversal_phase1_cap_primary=8)),
    ("cap10", dict(traversal_phase1_cap=10)),
    ("cap14", dict(traversal_phase1_cap=14)),
    ("cap14/primary8", dict(traversal_phase1_cap=14,
                            traversal_phase1_cap_primary=8)),
]

for name, over in VARIANTS:
    config = RenderConfig(width=width, height=height, **over)
    canvas = film.new_canvas(width, height, pad)
    t0 = time.perf_counter()
    canvas, frame, stats = render_frame(
        scene, camp, gx, gy, jnp.asarray(0, jnp.int32), canvas, key,
        config, schedule)
    _ = np.asarray(frame)
    comp = time.perf_counter() - t0
    # discard window
    for i in range(2):
        canvas, frame, stats = render_frame(
            scene, camp, gx, gy, jnp.asarray(i + 1, jnp.int32), canvas,
            jax.random.fold_in(key, i + 1), config, schedule)
    _ = np.asarray(stats["traces"])
    n_frames = 6
    t0 = time.perf_counter()
    traces = jnp.zeros((), jnp.int32)
    for i in range(n_frames):
        canvas, frame, stats = render_frame(
            scene, camp, gx, gy, jnp.asarray(i + 3, jnp.int32), canvas,
            jax.random.fold_in(key, i + 3), config, schedule)
        traces = traces + stats["traces"]
    traces = int(traces)
    dt = time.perf_counter() - t0
    print(f"{name}: {dt/n_frames*1e3:.0f} ms/frame, "
          f"{traces/dt/1e6:.2f} Mrays/s (compile {comp:.0f}s)",
          file=sys.stderr)
