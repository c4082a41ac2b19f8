"""Deep-scene (HBM) staged closest-hit sweep over (leaf_size, arity) via
FOVTPU_LEAF / FOVTPU_ARITY env vars. Rationale: r3d_hbm_wide measured the
HBM row gather FLAT per-index from W64 to W512 at constant table bytes, so
wider rows (fewer pops) should be near-free in this regime."""
import os, sys, time
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/fovtpu_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from fovpathtracing_optixcodelatest_tpu.models import scenes
from fovpathtracing_optixcodelatest_tpu.models.mesh import host_triangles
from fovpathtracing_optixcodelatest_tpu.ops import bvh_native, traverse8 as tv

LEAF = int(os.environ.get("FOVTPU_LEAF", "6"))
AR = int(os.environ.get("FOVTPU_ARITY", "16"))

meshes, cam = scenes.box_city_fast(n=400, seed=0)
tris = host_triangles(meshes)
t0 = time.perf_counter()
bvh = bvh_native.build(tris, leaf_size=LEAF, arity=AR)
print(f"L{LEAF}/A{AR}: {len(tris)} tris rows={bvh.num_rows} "
      f"W={bvh.table.shape[1]} stack={bvh.stack_depth} "
      f"({bvh.table.size*4/1e6:.0f} MB) build {time.perf_counter()-t0:.1f}s",
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


def g(o, d):
    acc = jnp.zeros((), jnp.float32)
    st = jnp.zeros((), jnp.int32)
    for i in range(2):
        out = tv.closest_hit_staged(bvh, o + acc, d, 1e-3, 1e8)
        acc = acc + out["t"][0] * 0.0
        st = st + out["steps"]
    return acc, st


f = jax.jit(g)
out = f(o_d, d_d); _ = np.asarray(out[0])
t0 = time.perf_counter(); out = f(o_d, d_d); _ = np.asarray(out[0])
dt = (time.perf_counter() - t0) / 2
print(f"L{LEAF}/A{AR} staged: {dt*1e3:.1f} ms, iters={int(out[1])//2}, "
      f"{M/dt/1e6:.2f} Mrays/s", file=sys.stderr)
