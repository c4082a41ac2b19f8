"""Per-component frame cost: raygen / traversal / shading / film on the
annulus pass shape (944784 rays)."""
import dataclasses, sys, time
import numpy as np
import jax, jax.numpy as jnp
from fovpathtracing_optixcodelatest_tpu.config import FoveationSchedule, RenderConfig
from fovpathtracing_optixcodelatest_tpu.models import scenes
from fovpathtracing_optixcodelatest_tpu.models.probe import gradient_sky_probe
from fovpathtracing_optixcodelatest_tpu.models.scene import build_scene
from fovpathtracing_optixcodelatest_tpu.render import raygen, film
from fovpathtracing_optixcodelatest_tpu.render.integrator import trace_paths
from fovpathtracing_optixcodelatest_tpu.ops import traverse8

width, height = 960, 540
meshes, cam = scenes.box_city(n=24, seed=0)
scene = build_scene(meshes, probe=gradient_sky_probe())
config = RenderConfig(width=width, height=height)
schedule = FoveationSchedule.reference_32_16_8()
camp = dataclasses.replace(cam, aspect=width / height).device_params()
gx = jnp.asarray(width // 2, jnp.int32); gy = jnp.asarray(height // 2, jnp.int32)
key = jax.random.PRNGKey(0)
p = schedule.passes[1]  # annulus

def timeit(name, fn, *args):
    out = fn(*args); _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    ts = []
    for _i in range(3):
        t0 = time.perf_counter(); out = fn(*args)
        _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {min(ts)*1e3:7.1f} ms", file=sys.stderr)
    return out

@jax.jit
def gen(camera, gx, gy, key):
    return raygen.generate_pass_rays(camera, p, width, height, gx, gy, key,
                                     antialias=config.antialias)
rays = timeit("raygen (944784)", gen, camp, gx, gy, key)

o, d, act, rid = rays["origin"], rays["direction"], rays["active"], rays["ray_ids"]

@jax.jit
def trav(scene, o, d, act):
    s = jnp.zeros((), jnp.int32)
    for i in range(4):
        out = traverse8.closest_hit(scene.bvh, o, d, config.tmin, config.tmax, active=act)
        occ = traverse8.occluded(scene.bvh, o, d, config.tmin, config.tmax, active=act)
        s = s + out["steps"] + occ[:1].astype(jnp.int32)[0]
    return s
timeit("4x(closest+occl) all-alive", trav, scene, o, d, act)

@jax.jit
def paths(scene, o, d, act, key, rid):
    return trace_paths(scene, o, d, act, key, config, ray_ids=rid)
timeit("trace_paths (4 bounces)", paths, scene, o, d, act, key, rid)
