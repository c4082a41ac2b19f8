"""Round-5 quad-row texture A/B at the bench textured config (VERDICT item
3: the 26% texel tax — 4 element-rate gathers/bounce vs one packed row
gather). Measures quad ON (new default) vs OFF (4-tap) with bit-identity.
Run: python -c "exec(open('scratch/r5_texquad.py').read())"
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
meshes, cam, images = scenes.box_city_textured(n=24, seed=0)
scene = build_scene(meshes, probe=gradient_sky_probe(), texture_images=images)
assert scene.geom.has_textures and scene.textures.quad is not None
config = RenderConfig(width=width, height=height)
schedule = FoveationSchedule.reference_32_16_8()
camp = dataclasses.replace(cam, aspect=width / height).device_params()
pad = film.schedule_padding(schedule, width, height)
gx = jnp.asarray(width // 2, jnp.int32)
gy = jnp.asarray(height // 2, jnp.int32)
key = jax.random.PRNGKey(0)


def measure(tag, sc, n=6):
    canvas = film.new_canvas(width, height, pad)
    t0 = time.perf_counter()
    canvas, frame, stats = render_frame(
        sc, camp, gx, gy, jnp.asarray(0, jnp.int32), canvas, key,
        config, schedule)
    ref0 = np.asarray(frame)
    print(f"[{tag}] compile+first: {time.perf_counter()-t0:.1f}s",
          file=sys.stderr, flush=True)
    for i in range(2):
        canvas, frame, stats = render_frame(
            sc, camp, gx, gy, jnp.asarray(i + 1, jnp.int32), canvas,
            jax.random.fold_in(key, i + 1), config, schedule)
    _ = np.asarray(stats["traces"])
    t0 = time.perf_counter()
    traces = jnp.zeros((), jnp.int32)
    for i in range(n):
        canvas, frame, stats = render_frame(
            sc, camp, gx, gy, jnp.asarray(3 + i, jnp.int32), canvas,
            jax.random.fold_in(key, 3 + i), config, schedule)
        traces = traces + stats["traces"]
    tr = int(traces)
    dt = (time.perf_counter() - t0) / n
    print(f"[{tag}] frame {dt*1e3:.0f} ms, {tr/n/dt/1e6:.2f} Mrays/s",
          file=sys.stderr, flush=True)
    return ref0


scene4 = dataclasses.replace(
    scene, textures=dataclasses.replace(scene.textures, quad=None)
)
ref = measure("4-tap (old)", scene4)
got = measure("quad-row (new)", scene)
print(f"bit-identical: {np.array_equal(ref, got)}", file=sys.stderr)
