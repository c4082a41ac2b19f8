"""Profile ONE whole closest_hit_treelet call at 1.9M tris."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/fovtpu_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
from fovpathtracing_optixcodelatest_tpu.models import scenes
from fovpathtracing_optixcodelatest_tpu.models.scene import build_scene
from fovpathtracing_optixcodelatest_tpu.ops import traverse8 as tv

meshes, cam = scenes.box_city_fast(n=400, seed=0)
scene = build_scene(meshes)
bvh = scene.bvh
M = 1 << 20
eye = np.array([-48.0, 18.0, 48.0], np.float32)
gx, gy = np.meshgrid(np.linspace(-0.5, 0.5, 1024),
                     np.linspace(-0.3, 0.3, 1024))
fwd = -eye / np.linalg.norm(eye)
right = np.cross(fwd, [0, 1, 0]); right /= np.linalg.norm(right)
up = np.cross(right, fwd)
dirs = (fwd[None, :] + gx.ravel()[:, None] * right[None, :]
        + gy.ravel()[:, None] * up[None, :]).astype(np.float32)
dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
o_d, d_d = jax.device_put(
    (np.broadcast_to(eye, (M, 3)).astype(np.float32), dirs))

f = jax.jit(lambda o, d: jnp.sum(
    tv.closest_hit_treelet(bvh, o, d, 1e-3, 1e8, rounds=2)["t"] * 0 + 1))
out = f(o_d, d_d); _ = np.asarray(out)
jax.profiler.start_trace("/tmp/topprof2")
out = f(o_d, d_d); _ = np.asarray(out)
jax.profiler.stop_trace()
