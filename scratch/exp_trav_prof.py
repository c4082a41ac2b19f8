"""Profile closest_hit alone (coherent + incoherent) and dump top ops."""
import os, sys, time
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

REPS = 4
@jax.jit
def bench_ch(bvh, o, d):
    acc = jnp.zeros((), jnp.float32)
    steps = jnp.zeros((), jnp.int32)
    for i in range(REPS):
        out = traverse8.closest_hit(bvh, o + acc, d, 1e-3, 1e8)
        acc = acc + jnp.sum(out["t"][:8]) * 0.0
        steps = steps + out["steps"]
    return acc, steps

a, s = bench_ch(bvh, o_d, d_d); _ = np.asarray(a)
os.system("rm -rf /tmp/travprof")
with jax.profiler.trace("/tmp/travprof"):
    a, s = bench_ch(bvh, o_d, d_d)
    _ = np.asarray(a)
print("steps:", int(np.asarray(s)), file=sys.stderr)
