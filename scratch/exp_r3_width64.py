"""Round-3 table-width experiment: the gather microbench (exp_r3_gatherrow)
showed take64+T = 99 us vs take140+T = 160 us per iteration at 32k lanes —
row width DOES matter at fixed index count (cost ~ a*idx + b*floats).
A width-64 unified table (arity 16 nodes fit exactly; leaf_size 6 -> 9*6+6=60
cols) cuts gather bytes 2.2x at the price of more leaf pops/ray.

A/B raw staged closest_hit + occluded on the bench scene (box_city 24) with
frame-like primary rays, across (leaf_size, arity) variants.
"""
import dataclasses, sys, time
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/fovtpu_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from fovpathtracing_optixcodelatest_tpu.models import scenes
from fovpathtracing_optixcodelatest_tpu.models.camera import Camera
from fovpathtracing_optixcodelatest_tpu.models.mesh import host_triangles
from fovpathtracing_optixcodelatest_tpu.ops import bvh_native, traverse8

meshes, cam = scenes.box_city(n=24, seed=0)
tris = host_triangles(meshes)
N = 1 << 20

# frame-like primary rays: the bench camera at 960x540, jittered
w, h = 1280, 832  # 1.06M rays, camera-coherent
camp = dataclasses.replace(cam, aspect=w / h).device_params()
rng = np.random.default_rng(0)
px = (np.tile(np.arange(w), h)[:N] + rng.random(N)).astype(np.float32) / w
py = (np.repeat(np.arange(h), w)[:N] + rng.random(N)).astype(np.float32) / h
d = (
    np.asarray(camp.w)[None]
    + (2 * px - 1)[:, None] * np.asarray(camp.u)[None]
    + (2 * py - 1)[:, None] * np.asarray(camp.v)[None]
)
d /= np.linalg.norm(d, axis=1, keepdims=True)
o = np.broadcast_to(np.asarray(camp.eye)[None], (N, 3)).copy()
o_j, d_j = jnp.asarray(o), jnp.asarray(d.astype(np.float32))

# bounce-like incoherent rays: origins on surfaces (reuse t from a quick
# closest pass later) — approximate with random-in-scene origins
ob = np.stack([
    rng.uniform(0, 60, N), rng.uniform(0, 8, N), rng.uniform(0, 60, N)
], 1).astype(np.float32)
db = rng.normal(size=(N, 3)).astype(np.float32)
db /= np.linalg.norm(db, axis=1, keepdims=True)
ob_j, db_j = jnp.asarray(ob), jnp.asarray(db)


def bench(bvh, name, reps=4):
    print(f"-- {name}: rows={bvh.num_rows} width={bvh.table.shape[1]} "
          f"stack={bvh.stack_depth} "
          f"({bvh.table.size * 4 / 1e6:.1f} MB)", file=sys.stderr)
    for label, oo, dd in (("prim", o_j, d_j), ("bounce", ob_j, db_j)):
        fn = jax.jit(lambda o, d: traverse8.closest_hit_staged(
            bvh, o, d, 1e-3, 1e16)["t"])
        _ = np.asarray(fn(oo, dd))
        t0 = time.perf_counter()
        acc = None
        for r in range(reps):
            acc = fn(oo + (r * 1e-6), dd)
        _ = np.asarray(acc)
        dt = (time.perf_counter() - t0) / reps
        print(f"  closest/{label}: {dt*1e3:.1f} ms = {N/dt/1e6:.2f} Mrays/s",
              file=sys.stderr)
        fo = jax.jit(lambda o, d: traverse8.occluded(
            bvh, o, d, 1e-3, 1e16).astype(jnp.int32).sum())
        _ = np.asarray(fo(oo, dd))
        t0 = time.perf_counter()
        acc = None
        for r in range(reps):
            acc = fo(oo + (r * 1e-6), dd)
        _ = np.asarray(acc)
        dt = (time.perf_counter() - t0) / reps
        print(f"  occl/{label}:    {dt*1e3:.1f} ms = {N/dt/1e6:.2f} Mrays/s",
              file=sys.stderr)


for leaf, arity in ((14, 16), (6, 16), (4, 16), (6, 8)):
    t0 = time.perf_counter()
    bvh = bvh_native.build(tris, leaf_size=leaf, arity=arity)
    bench(bvh, f"L{leaf}/A{arity} (build {time.perf_counter()-t0:.1f}s)")
