"""Uniform-mode frame at 960x540, 32 spp (VERDICT r3 item 6): the 6.8 s
uniform frame drives the 10.9x-vs-25x foveated-speedup ratio gap."""
import time, sys, dataclasses
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

W, H = 960, 540
meshes, cam = scenes.box_city(n=24, seed=0)
scene = build_scene(meshes, probe=gradient_sky_probe())
config = RenderConfig(width=W, height=H)
camp = dataclasses.replace(cam, aspect=W / H).device_params()
key = jax.random.PRNGKey(0)
gx = jnp.asarray(W // 2, jnp.int32); gy = jnp.asarray(H // 2, jnp.int32)
for spp in (32,):
    schedule = FoveationSchedule.uniform(spp=spp)
    pad = film.schedule_padding(schedule, W, H)
    canvas = film.new_canvas(W, H, pad)
    t0 = time.perf_counter()
    canvas, frame, stats = render_frame(scene, camp, gx, gy, jnp.asarray(0, jnp.int32), canvas, key, config, schedule)
    _ = np.asarray(frame)
    print(f"uniform {spp}spp compile+first {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    n = 3
    t0 = time.perf_counter()
    traces = jnp.zeros((), jnp.int32)
    for i in range(n):
        canvas, frame, stats = render_frame(scene, camp, gx, gy, jnp.asarray(i+1, jnp.int32), canvas, jax.random.fold_in(key, i+1), config, schedule)
        traces = traces + stats["traces"]
    traces = int(traces); dt = time.perf_counter() - t0
    print(f"uniform {spp}spp: {n} frames {dt:.2f}s -> {dt/n*1e3:.0f} ms/frame, "
          f"{traces/dt/1e6:.2f} Mrays/s", file=sys.stderr)
