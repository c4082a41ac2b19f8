import time, sys
import numpy as np
from fovpathtracing_optixcodelatest_tpu.models import scenes
from fovpathtracing_optixcodelatest_tpu.models.mesh import host_triangles
from fovpathtracing_optixcodelatest_tpu.ops.bvh_native import build as build_native
from fovpathtracing_optixcodelatest_tpu.ops import traverse8
import jax, jax.numpy as jnp

meshes, _ = scenes.box_city(n=24, seed=0)
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
REPS = 4

@jax.jit
def bench_ch(bvh, o, d):
    acc = jnp.zeros((), jnp.float32); steps = jnp.zeros((), jnp.int32)
    for i in range(REPS):
        out = traverse8.closest_hit(bvh, o + acc, d, 1e-3, 1e8)
        acc = acc + jnp.sum(out["t"][:8]) * 0.0
        steps = steps + out["steps"]
    return acc, steps

@jax.jit
def bench_occ(bvh, o, d):
    acc = jnp.zeros((), jnp.float32)
    for i in range(REPS):
        occ = traverse8.occluded(bvh, o + acc, d, 1e-3, 1e8)
        acc = acc + jnp.sum(occ[:8].astype(jnp.float32)) * 0.0
    return acc

for arity, leaf in [(16, 14), (16, 10), (16, 7)]:
    b = build_native(tris, leaf_size=leaf, arity=arity)
    for nm, fn, oo, dd in (("ch-coh", bench_ch, o_d, d_d), ("ch-inc", bench_ch, o2_d, d2_d),
                           ("oc-coh", bench_occ, o_d, d_d), ("oc-inc", bench_occ, o2_d, d2_d)):
        out = fn(b, oo, dd)
        _ = [np.asarray(x) for x in (out if isinstance(out, tuple) else (out,))]
        ts = []
        for _i in range(3):
            t0 = time.perf_counter(); out = fn(b, oo, dd)
            _ = [np.asarray(x) for x in (out if isinstance(out, tuple) else (out,))]
            ts.append(time.perf_counter() - t0)
        print(f"A{arity}/L{leaf} {nm}: {REPS*N/min(ts)/1e6:5.1f} Mrays/s", file=sys.stderr)
