"""Deep-scene (HBM-regime) row-width A/B: finding 17 says the HBM gather is
per-index-rate with a bytes component — the fix must cut ITERATIONS or
BYTES/ROW. L14/A16 rows are 140 f32 cols (560 B); L6/A16 fits in 64 cols
(256 B, node block 4*16=64 dominates). More leaf pops/ray at L6, fewer bytes
per gather. Measure closest_hit_staged + occluded at ~1.9M tris.
"""
import sys, time
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/fovtpu_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from fovpathtracing_optixcodelatest_tpu.models import scenes
from fovpathtracing_optixcodelatest_tpu.models.mesh import host_triangles
from fovpathtracing_optixcodelatest_tpu.ops import bvh_native, traverse8 as tv

t0 = time.perf_counter()
meshes, cam = scenes.box_city_fast(n=400, seed=0)
tris = host_triangles(meshes)
print(f"scene gen {time.perf_counter()-t0:.1f}s, {len(tris)} tris",
      file=sys.stderr)

rng = np.random.default_rng(0)
M = 1 << 20
lo = min(float(m.vertex.min()) for m in meshes)
hi = max(float(m.vertex.max()) for m in meshes)
ob = np.stack([rng.uniform(lo, hi, M), rng.uniform(0, 20, M),
               rng.uniform(lo, hi, M)], 1).astype(np.float32)
db = rng.normal(size=(M, 3)).astype(np.float32)
db /= np.linalg.norm(db, axis=1, keepdims=True)
o_d, d_d = jax.device_put((ob, db))


def run(tag, bvh, fn, reps=2):
    def g(o, d):
        acc = jnp.zeros((), jnp.float32); st = jnp.zeros((), jnp.int32)
        for i in range(2):
            out = fn(bvh, o + acc, d)
            acc = acc + out["t"][0] * 0.0
            st = st + out["steps"]
        return acc, st
    f = jax.jit(g)
    out = f(o_d, d_d); _ = np.asarray(out[0])
    t0 = time.perf_counter(); out = f(o_d, d_d); _ = np.asarray(out[0])
    dt = (time.perf_counter() - t0) / 2
    print(f"  {tag}: {dt*1e3:.1f} ms, steps={int(out[1])//2}, "
          f"{M/dt/1e6:.2f} Mrays/s", file=sys.stderr)


for leaf, arity in ((6, 16), (12, 32), (6, 32), (12, 16), (3, 8)):
    t0 = time.perf_counter()
    bvh = bvh_native.build(tris, leaf_size=leaf, arity=arity)
    print(f"L{leaf}/A{arity}: rows={bvh.num_rows} width={bvh.table.shape[1]} "
          f"stack={bvh.stack_depth} ({bvh.table.size*4/1e6:.0f} MB) "
          f"build {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    run("staged", bvh, lambda b, o, d: tv.closest_hit_staged(
        b, o, d, 1e-3, 1e8))
