import dataclasses, os, sys
import numpy as np
import jax, jax.numpy as jnp
from fovpathtracing_optixcodelatest_tpu.config import FoveationSchedule, RenderConfig
from fovpathtracing_optixcodelatest_tpu.models import scenes
from fovpathtracing_optixcodelatest_tpu.models.probe import gradient_sky_probe
from fovpathtracing_optixcodelatest_tpu.models.scene import build_scene
from fovpathtracing_optixcodelatest_tpu.render import raygen
from fovpathtracing_optixcodelatest_tpu.render.integrator import trace_paths

width, height = 960, 540
meshes, cam = scenes.box_city(n=24, seed=0)
scene = build_scene(meshes, probe=gradient_sky_probe())
config = RenderConfig(width=width, height=height)
schedule = FoveationSchedule.reference_32_16_8()
camp = dataclasses.replace(cam, aspect=width / height).device_params()
gx = jnp.asarray(width // 2, jnp.int32); gy = jnp.asarray(height // 2, jnp.int32)
key = jax.random.PRNGKey(0)
p = schedule.passes[1]

rays = raygen.generate_pass_rays(camp, p, width, height, gx, gy, key, antialias=config.antialias)
o, d, act, rid = jax.device_put((rays["origin"], rays["direction"], rays["active"], rays["ray_ids"]))

@jax.jit
def paths(scene, o, d, act, key, rid):
    return trace_paths(scene, o, d, act, key, config, ray_ids=rid)

out = paths(scene, o, d, act, key, rid); _ = np.asarray(out["traces"])
os.system("rm -rf /tmp/fovprof5")
with jax.profiler.trace("/tmp/fovprof5"):
    out = paths(scene, o, d, act, key, rid); _ = np.asarray(out["traces"])
