"""Bisect trace_paths cost: full vs no-compact vs traversal-only scan."""
import dataclasses, sys, time
import numpy as np
import jax, jax.numpy as jnp
from fovpathtracing_optixcodelatest_tpu.config import FoveationSchedule, RenderConfig
from fovpathtracing_optixcodelatest_tpu.models import scenes
from fovpathtracing_optixcodelatest_tpu.models.probe import gradient_sky_probe
from fovpathtracing_optixcodelatest_tpu.models.scene import build_scene
from fovpathtracing_optixcodelatest_tpu.render import raygen
from fovpathtracing_optixcodelatest_tpu.render.integrator import trace_paths
from fovpathtracing_optixcodelatest_tpu.ops import traverse8

width, height = 960, 540
meshes, cam = scenes.box_city(n=24, seed=0)
scene = build_scene(meshes, probe=gradient_sky_probe())
schedule = FoveationSchedule.reference_32_16_8()
camp = dataclasses.replace(cam, aspect=width / height).device_params()
gx = jnp.asarray(width // 2, jnp.int32); gy = jnp.asarray(height // 2, jnp.int32)
key = jax.random.PRNGKey(0)
p = schedule.passes[1]
rays = raygen.generate_pass_rays(camp, p, width, height, gx, gy, key, antialias=True)
o, d, act, rid = jax.device_put((rays["origin"], rays["direction"], rays["active"], rays["ray_ids"]))

def timeit(name, fn, *args):
    out = fn(*args); _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    ts = []
    for _ in range(2):
        t0 = time.perf_counter(); out = fn(*args)
        _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
        ts.append(time.perf_counter()-t0)
    print(f"{name}: {min(ts)*1e3:7.1f} ms", file=sys.stderr)

cfg_c = RenderConfig(width=width, height=height, compact_bounces=True)
cfg_n = RenderConfig(width=width, height=height, compact_bounces=False)

@jax.jit
def full_c(scene, o, d, act, key, rid):
    return trace_paths(scene, o, d, act, key, cfg_c, ray_ids=rid)["traces"]
@jax.jit
def full_n(scene, o, d, act, key, rid):
    return trace_paths(scene, o, d, act, key, cfg_n, ray_ids=rid)["traces"]

@jax.jit
def trav_scan(scene, o, d, act):
    """Scan over 4 bounces: closest + occl + trivial state update only."""
    def bounce(c, i):
        o, d, act, acc = c
        out = traverse8.closest_hit(scene.bvh, o, d, 1e-3, 1e9, active=act)
        occ = traverse8.occluded(scene.bvh, o + 1e-3, d, 1e-3, 1e9, active=act)
        hit = act & out["hit"]
        o2 = o + out["t"][:, None] * d
        o2 = jnp.where(hit[:, None], o2, o)
        d2 = jnp.where(occ[:, None], -d, d)
        return (o2, d2, hit, acc + out["steps"]), None
    c, _ = jax.lax.scan(bounce, (o, d, act, jnp.zeros((), jnp.int32)), jnp.arange(4))
    return c[3]

timeit("trace_paths compact", full_c, scene, o, d, act, key, rid)
timeit("trace_paths nocompact", full_n, scene, o, d, act, key, rid)
timeit("scan traversal-only", trav_scan, scene, o, d, act)
