"""leaf_size sweep: fewer leaf rows = fewer pops at constant gather cost."""
import time, sys
import numpy as np
from fovpathtracing_optixcodelatest_tpu.models import scenes
from fovpathtracing_optixcodelatest_tpu.models.mesh import host_triangles
from fovpathtracing_optixcodelatest_tpu.ops.bvh_native import build as build_bvh
from fovpathtracing_optixcodelatest_tpu.ops import traverse8
import jax, jax.numpy as jnp

meshes, cam = scenes.box_city(n=24, seed=0)
tris = host_triangles(meshes)

N = 1 << 20
rng = np.random.default_rng(0)
o = np.tile(np.array([0.0, 6.0, 45.0], np.float32), (N, 1))
d = np.stack([rng.uniform(-0.4, 0.4, N), rng.uniform(-0.35, 0.05, N), -np.ones(N)], axis=1).astype(np.float32)
d /= np.linalg.norm(d, axis=1, keepdims=True)
o_d, d_d = jax.device_put((o, d))
o2 = rng.uniform(-35, 35, (N, 3)).astype(np.float32); o2[:,1] = rng.uniform(0, 6, N)
d2 = rng.normal(size=(N, 3)).astype(np.float32); d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
o2_d, d2_d = jax.device_put((o2, d2))

@jax.jit
def bench(b, o, d):
    out = traverse8.closest_hit(b, o, d, 1e-3, 1e8)
    return out["steps"], jnp.sum(out["t"])

for ls in (4, 7, 8):
    b = build_bvh(tris, leaf_size=ls)
    for name, oo, dd in (("coh", o_d, d_d), ("inc", o2_d, d2_d)):
        out = bench(b, oo, dd); _ = np.asarray(out[0])
        ts = []
        for _ in range(3):
            t0 = time.perf_counter(); out = bench(b, oo, dd); _ = np.asarray(out[0])
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        print(f"leaf={ls} rows={b.num_rows} W={b.table.shape[1]} {name}: {dt:.3f}s {N/dt/1e6:5.1f} Mrays/s steps={int(out[0])}", file=sys.stderr)
