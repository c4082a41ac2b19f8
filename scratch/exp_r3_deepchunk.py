"""Round-3 deep-scene hypothesis: in the HBM regime the row gather costs
~table-stream per ITERATION (not per index), so 32k-ray chunks are pessimal
— every chunk iteration re-streams the table. A/B raw closest_hit throughput
at 1.9M tris (box_city_fast(400), ~243k rows, 122 MB) across chunk widths,
plus the 203k-tri mid scene (box_city_fast(130), ~14 MB).

Timing: one jit per config, chain via dependency, ONE host fetch.
"""
import time, sys
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/fovtpu_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from fovpathtracing_optixcodelatest_tpu.models import scenes
from fovpathtracing_optixcodelatest_tpu.models.scene import build_scene
from fovpathtracing_optixcodelatest_tpu.ops import traverse8

N = 1 << 20  # ~1M rays


def rays_for(meshes, n, seed=0):
    rng = np.random.default_rng(seed)
    # camera-ish coherent rays from above looking down into the city
    o = np.stack([
        rng.uniform(0.0, 60.0, n), np.full(n, 40.0),
        rng.uniform(0.0, 60.0, n),
    ], 1).astype(np.float32)
    d = rng.normal(size=(n, 3))
    d[:, 1] = -np.abs(d[:, 1]) - 0.5
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d.astype(np.float32))


def bench(scene, name, o, d, chunk, staged, reps=3):
    if staged:
        fn = jax.jit(lambda o, d: traverse8.closest_hit_staged(
            scene.bvh, o, d, 1e-3, 1e16, chunk=chunk)["t"])
    else:
        fn = jax.jit(lambda o, d: traverse8.closest_hit(
            scene.bvh, o, d, 1e-3, 1e16, chunk=chunk)["t"])
    _ = np.asarray(fn(o, d))
    t0 = time.perf_counter()
    acc = None
    for r in range(reps):
        acc = fn(o + (r * 1e-5), d)
    _ = np.asarray(acc)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name} chunk={chunk} staged={staged}: {dt*1e3:.1f} ms "
          f"= {N/dt/1e6:.2f} Mrays/s", file=sys.stderr)


for label, n_city in (("mid-203k", 130), ("deep-1.9M", 400)):
    t0 = time.perf_counter()
    meshes, cam = scenes.box_city_fast(n=n_city, seed=0)
    scene = build_scene(meshes)
    print(f"{label}: {scene.num_triangles} tris, {scene.bvh.num_rows} rows, "
          f"{scene.bvh.table.size*4/1e6:.0f} MB, build "
          f"{time.perf_counter()-t0:.1f}s", file=sys.stderr)
    o, d = rays_for(meshes, N)
    for chunk in (1 << 15, 1 << 17, 1 << 19, None):
        bench(scene, label, o, d, chunk, staged=False)
    bench(scene, label, o, d, 1 << 15, staged=True)
    bench(scene, label, o, d, None, staged=True)
