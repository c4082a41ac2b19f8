"""Raw closest/occluded rates vs (leaf_size, arity) row width, coherent +
incoherent, on TPU. The unified row width = max(4*arity, 9*leaf_size), so
L14/A16 makes every NODE gather read 126 cols for 64 used; L7/A16 shrinks
the row to 64 but doubles leaf rows."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp

from fovpathtracing_optixcodelatest_tpu.models import scenes
from fovpathtracing_optixcodelatest_tpu.models.mesh import host_triangles
from fovpathtracing_optixcodelatest_tpu.ops import bvh_native
from fovpathtracing_optixcodelatest_tpu.ops import traverse8 as tv

meshes, cam = scenes.box_city(n=24, seed=0)
tris = host_triangles(meshes)
rng = np.random.default_rng(0)

M = 1 << 20
o = np.tile(np.array([0.0, 6.0, 45.0], np.float32), (M, 1))
d = np.stack([rng.uniform(-0.4, 0.4, M), rng.uniform(-0.35, 0.05, M),
              -np.ones(M)], 1).astype(np.float32)
d /= np.linalg.norm(d, axis=1, keepdims=True)
ob = np.stack([rng.uniform(-40, 40, M), rng.uniform(0, 10, M),
               rng.uniform(-40, 40, M)], 1).astype(np.float32)
db = rng.normal(size=(M, 3)).astype(np.float32)
db /= np.linalg.norm(db, axis=1, keepdims=True)
o_d, d_d, ob_d, db_d = jax.device_put((o, d, ob, db))


def run(tag, fn, *args):
    f = jax.jit(fn)
    out = f(*args); _ = np.asarray(out[0])
    t0 = time.perf_counter(); out = f(*args); _ = np.asarray(out[0])
    dt = (time.perf_counter() - t0) / 2
    print(f"{tag}: {dt*1e3:.1f} ms, {M/dt/1e6:.1f} Mrays/s", file=sys.stderr)


def ch2(bvh):
    def fn(bvh, o, d):
        acc = jnp.zeros((), jnp.float32)
        for i in range(2):
            out = tv.closest_hit(bvh, o + acc, d, 1e-3, 1e8)
            acc = acc + out["t"][0] * 0.0
        return acc,
    return fn


def oc2(bvh):
    def fn(bvh, o, d):
        acc = jnp.zeros((), jnp.float32)
        for i in range(2):
            occ = tv.occluded(bvh, o + acc * 0 + acc, d, 1e-3, 1e8)
            acc = acc + occ[0].astype(jnp.float32) * 0.0
        return acc,
    return fn


for leaf, arity in ((14, 16), (7, 16), (4, 16), (7, 8)):
    bvh = bvh_native.build(tris, leaf_size=leaf, arity=arity)
    print(f"--- L{leaf}/A{arity}: rows={bvh.num_rows} width={bvh.table.shape[1]} "
          f"depth={bvh.stack_depth}", file=sys.stderr)
    run(f"L{leaf}A{arity} closest coher", ch2(bvh), bvh, o_d, d_d)
    run(f"L{leaf}A{arity} closest incoh", ch2(bvh), bvh, ob_d, db_d)
    run(f"L{leaf}A{arity} occl  incoh", oc2(bvh), bvh, ob_d, db_d)
