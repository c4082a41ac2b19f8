"""Experiment: where does build_scene cold-start time go, and how do
different upload strategies cost on the axon tunnel?"""
import time, sys
import numpy as np

t0 = time.perf_counter()
from fovpathtracing_optixcodelatest_tpu.models import scenes
from fovpathtracing_optixcodelatest_tpu.models.mesh import flatten_meshes, host_triangles
from fovpathtracing_optixcodelatest_tpu.ops.bvh_native import build as build_wide_bvh
print(f"imports: {time.perf_counter()-t0:.2f}s")

t0 = time.perf_counter()
meshes, cam = scenes.box_city(n=24, seed=0)
print(f"scene gen: {time.perf_counter()-t0:.2f}s")

t0 = time.perf_counter()
tris = host_triangles(meshes)
print(f"host_triangles: {time.perf_counter()-t0:.2f}s  ({tris.shape[0]} tris)")

# host-only BVH build (numpy outputs, no device transfer)
import fovpathtracing_optixcodelatest_tpu.ops.bvh8 as bvh8
t0 = time.perf_counter()
bvh = build_wide_bvh(tris)
print(f"bvh build+upload: {time.perf_counter()-t0:.2f}s  rows={bvh.num_rows}")

t0 = time.perf_counter()
geom, mats = flatten_meshes(meshes)
print(f"flatten_meshes (13 jnp.asarray): {time.perf_counter()-t0:.2f}s")

import jax, jax.numpy as jnp
# fence
t0 = time.perf_counter()
_ = np.asarray(geom.tri_v0[:1])
print(f"fence fetch: {time.perf_counter()-t0:.2f}s")

# strategy A: 13 separate device_puts of small arrays, fenced
arrs = [np.random.rand(7000, 3).astype(np.float32) for _ in range(13)]
t0 = time.perf_counter()
devs = [jnp.asarray(a) for a in arrs]
_ = np.asarray(devs[-1][:1])
print(f"13 separate jnp.asarray + fence: {time.perf_counter()-t0:.2f}s")

# strategy B: one device_put of the same pytree
t0 = time.perf_counter()
devs2 = jax.device_put(arrs)
_ = np.asarray(devs2[-1][:1])
print(f"one device_put(pytree of 13) + fence: {time.perf_counter()-t0:.2f}s")

# strategy C: one concatenated array
big = np.concatenate([a.reshape(-1) for a in arrs])
t0 = time.perf_counter()
d3 = jnp.asarray(big)
_ = np.asarray(d3[:1])
print(f"one concat array + fence: {time.perf_counter()-t0:.2f}s")
