"""Profile one closest_hit batch on TPU; dump top ops by device time."""
import time, sys, glob, os
import numpy as np
from fovpathtracing_optixcodelatest_tpu.models import scenes
from fovpathtracing_optixcodelatest_tpu.models.scene import build_scene
from fovpathtracing_optixcodelatest_tpu.models.probe import gradient_sky_probe
from fovpathtracing_optixcodelatest_tpu.ops import traverse8
import jax, jax.numpy as jnp

meshes, cam = scenes.box_city(n=24, seed=0)
scene = build_scene(meshes, probe=gradient_sky_probe())
bvh = scene.bvh

N = 1 << 20
rng = np.random.default_rng(0)
o = np.tile(np.array([0.0, 6.0, 45.0], np.float32), (N, 1))
d = np.stack([rng.uniform(-0.4, 0.4, N), rng.uniform(-0.35, 0.05, N), -np.ones(N)], axis=1).astype(np.float32)
d /= np.linalg.norm(d, axis=1, keepdims=True)
o_d, d_d = jax.device_put((o, d))

@jax.jit
def bench(bvh, o, d):
    out = traverse8.closest_hit(bvh, o, d, 1e-3, 1e8)
    return out["steps"], jnp.sum(out["t"])

out = bench(bvh, o_d, d_d); _ = np.asarray(out[0])
t0 = time.perf_counter(); out = bench(bvh, o_d, d_d); _ = np.asarray(out[0])
print(f"1M closest: {time.perf_counter()-t0:.3f}s steps={int(out[0])}", file=sys.stderr)

os.system("rm -rf /tmp/fovprof")
with jax.profiler.trace("/tmp/fovprof"):
    out = bench(bvh, o_d, d_d)
    _ = np.asarray(out[0])
print("trace done", file=sys.stderr)
