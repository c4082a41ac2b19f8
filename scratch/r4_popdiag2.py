"""Why doesn't the frame see the pop-sort win? Test _closest_compacted
directly: hint=exact pops vs hint=zeros, steps + time. Also occlusion twin.
Run: python -c "exec(open('scratch/r4_popdiag2.py').read())"
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
from fovpathtracing_optixcodelatest_tpu.render import raygen
from fovpathtracing_optixcodelatest_tpu.render import integrator as I
from fovpathtracing_optixcodelatest_tpu.ops import traverse8

width, height = 960, 540
meshes, cam = scenes.box_city(n=24, seed=0)
scene = build_scene(meshes, probe=gradient_sky_probe())
camp = dataclasses.replace(cam, aspect=width / height).device_params()
schedule = FoveationSchedule.reference_32_16_8()
p0 = schedule.passes[0]
rays = raygen.generate_pass_rays(
    camp, p0, width, height,
    jnp.asarray(width // 2, jnp.int32), jnp.asarray(height // 2, jnp.int32),
    jax.random.PRNGKey(0), antialias=True)
o, d, act = rays["origin"], rays["direction"], rays["active"]
cfg = RenderConfig(width=width, height=height)

pops = np.asarray(jax.jit(lambda: traverse8.closest_hit(
    scene.bvh, o, d, cfg.tmin, cfg.tmax, active=act)["pops"])())
pops_j = jnp.asarray(pops)
zeros = jnp.zeros_like(pops_j)


def run(tag, prev, n=8):
    f = jax.jit(lambda o, d, a, pv: I._closest_compacted(
        scene, o, d, a, cfg, prev_pops=pv)["steps"])
    s = int(f(o, d, act, prev))
    _ = np.asarray(f(o, d, act, prev))
    best = np.inf
    for r in range(3):
        t0 = time.perf_counter()
        x = f(o, d, act, prev)
        for i in range(n - 1):
            x = f(o, d, act, prev)
        _ = np.asarray(x)
        best = min(best, (time.perf_counter() - t0) / n)
    print(f"{tag}: steps {s}, {best*1e3:.1f} ms", file=sys.stderr)


run("compacted hint=zeros", zeros)
run("compacted hint=pops ", pops_j)
run("compacted hint=pops2", pops_j)
