"""Frame-level A/B: compact_bounces True vs False (3 chained frames each)."""
import dataclasses, sys, time
import numpy as np
import jax, jax.numpy as jnp
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

for compact in (False, True):
    config = RenderConfig(width=width, height=height, compact_bounces=compact)
    canvas = film.new_canvas(width, height, pad)
    t0 = time.perf_counter()
    canvas, frame, stats = render_frame(
        scene, camp, gx, gy, jnp.asarray(0, jnp.int32), canvas, key,
        config, schedule)
    _ = np.asarray(frame)
    print(f"compact={compact} compile+first: {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)
    t0 = time.perf_counter()
    traces = jnp.zeros((), jnp.int32)
    for i in range(3):
        canvas, frame, stats = render_frame(
            scene, camp, gx, gy, jnp.asarray(i + 1, jnp.int32), canvas,
            jax.random.fold_in(key, i + 1), config, schedule)
        traces = traces + stats["traces"]
    traces = int(traces)
    dt = time.perf_counter() - t0
    print(f"compact={compact}: {dt/3*1e3:.0f} ms/frame, traces={traces}, "
          f"{traces/dt/1e6:.2f} Mrays/s", file=sys.stderr)
