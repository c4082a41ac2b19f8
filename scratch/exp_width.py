"""Does in-loop gather cost scale with row width? Pad table W 64->128/32."""
import time, sys, dataclasses
import numpy as np
from fovpathtracing_optixcodelatest_tpu.models import scenes
from fovpathtracing_optixcodelatest_tpu.models.scene import build_scene
from fovpathtracing_optixcodelatest_tpu.ops import traverse8
import jax, jax.numpy as jnp

meshes, cam = scenes.box_city(n=24, seed=0)
scene = build_scene(meshes)
bvh = scene.bvh

N = 1 << 20
rng = np.random.default_rng(0)
o = np.tile(np.array([0.0, 6.0, 45.0], np.float32), (N, 1))
d = np.stack([rng.uniform(-0.4, 0.4, N), rng.uniform(-0.35, 0.05, N), -np.ones(N)], axis=1).astype(np.float32)
d /= np.linalg.norm(d, axis=1, keepdims=True)
o_d, d_d = jax.device_put((o, d))

def run(name, b):
    @jax.jit
    def bench(b, o, d):
        out = traverse8.closest_hit(b, o, d, 1e-3, 1e8)
        return out["steps"], jnp.sum(out["t"])
    out = bench(b, o_d, d_d); _ = np.asarray(out[0])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); out = bench(b, o_d, d_d); _ = np.asarray(out[0])
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    print(f"{name}: {dt:.3f}s  {N/dt/1e6:.1f} Mrays/s  steps={int(out[0])}", file=sys.stderr)

run("W=64 ", bvh)
tab = np.asarray(bvh.table)
tab128 = np.concatenate([tab, np.zeros_like(tab)], axis=1)
run("W=128", dataclasses.replace(bvh, table=jnp.asarray(tab128)))
