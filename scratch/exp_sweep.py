"""Tree config x chunk-size sweep on TPU."""
import time, sys
import numpy as np
from fovpathtracing_optixcodelatest_tpu.models import scenes
from fovpathtracing_optixcodelatest_tpu.models.mesh import host_triangles
from fovpathtracing_optixcodelatest_tpu.ops.bvh_native import build as build_native
from fovpathtracing_optixcodelatest_tpu.ops import traverse8
import jax, jax.numpy as jnp
from functools import partial

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

for arity, leaf in [(16, 7), (16, 14), (8, 7)]:
    b = build_native(tris, leaf_size=leaf, arity=arity)
    for chunk in (4096, 8192, 16384, 32768):
        @partial(jax.jit, static_argnums=(3,))
        def bench(b, o, d, chunk):
            out = traverse8.closest_hit(b, o, d, 1e-3, 1e8, chunk=chunk)
            return out["steps"], jnp.sum(out["t"])
        res = []
        for name, oo, dd in (("coh", o_d, d_d), ("inc", o2_d, d2_d)):
            out = bench(b, oo, dd, chunk); _ = np.asarray(out[0])
            ts = []
            for _ in range(3):
                t0 = time.perf_counter(); out = bench(b, oo, dd, chunk); _ = np.asarray(out[0])
                ts.append(time.perf_counter() - t0)
            res.append(f"{name} {N/min(ts)/1e6:5.1f}Mr/s it={int(out[0]):5d}")
        print(f"A={arity:2d} leaf={leaf:2d} chunk={chunk:5d}: " + "  ".join(res), file=sys.stderr)
