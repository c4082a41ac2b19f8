"""Where does the compile time go? Time jit-compile of pieces on CPU."""
import os, sys, time

os.environ["JAX_PLATFORMS"] = "cpu"
import jax, jax.numpy as jnp
from jax import lax

jax.config.update("jax_platforms", "cpu")
import numpy as np


def tc(name, fn, *args):
    t0 = time.perf_counter()
    jax.jit(fn).lower(*args).compile()
    print(f"{name}: {time.perf_counter() - t0:.1f}s compile", file=sys.stderr)


N = 1 << 17
cols = [jnp.zeros((N,), jnp.float32) for _ in range(25)]
key = jnp.zeros((N,), bool)

# 1. one 26-operand stable sort
tc("sort26 stable", lambda k, cs: lax.sort([k] + cs, num_keys=1, is_stable=True), key, cols)
tc("sort26 unstable", lambda k, cs: lax.sort([k] + cs, num_keys=1), key, cols)
tc("sort2", lambda k, cs: lax.sort([k, cs[0]], num_keys=1), key, cols)

# 2. trace_paths compact vs not, small scene
from fovpathtracing_optixcodelatest_tpu.config import RenderConfig
from fovpathtracing_optixcodelatest_tpu.models import scenes
from fovpathtracing_optixcodelatest_tpu.models.scene import build_scene
from fovpathtracing_optixcodelatest_tpu.render.integrator import trace_paths

meshes, cam = scenes.cornell(sphere_subdiv=1)
scene = build_scene(meshes)
M = 1 << 14
o = jnp.zeros((M, 3)); d = jnp.ones((M, 3)); act = jnp.ones((M,), bool)
k2 = jax.random.PRNGKey(0)

cfg_c = RenderConfig(width=64, height=48, compact_bounces=True)
cfg_n = RenderConfig(width=64, height=48, compact_bounces=False)
tc("trace_paths compact", lambda s, o, d, a, k: trace_paths(s, o, d, a, k, cfg_c), scene, o, d, act, k2)
tc("trace_paths nocompact", lambda s, o, d, a, k: trace_paths(s, o, d, a, k, cfg_n), scene, o, d, act, k2)
