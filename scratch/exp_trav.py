"""Traversal microbench: closest_hit and occluded Mrays/s on box_city(24).
Honest timing: chained data-dependent calls in one jit, one scalar fetch."""
import time, sys
import numpy as np

from fovpathtracing_optixcodelatest_tpu.models import scenes
from fovpathtracing_optixcodelatest_tpu.models.scene import build_scene
from fovpathtracing_optixcodelatest_tpu.models.probe import gradient_sky_probe
from fovpathtracing_optixcodelatest_tpu.ops import traverse8

import jax, jax.numpy as jnp

meshes, cam = scenes.box_city(n=24, seed=0)
scene = build_scene(meshes, probe=gradient_sky_probe())
bvh = scene.bvh
print(f"rows={bvh.num_rows} stack={bvh.stack_depth} leaf={bvh.leaf_size}", file=sys.stderr)

N = 1 << 20  # 1M rays
rng = np.random.default_rng(0)
# coherent primaries: from camera-ish point into the scene
o = np.tile(np.array([0.0, 6.0, 45.0], np.float32), (N, 1))
d = np.stack([
    rng.uniform(-0.4, 0.4, N), rng.uniform(-0.35, 0.05, N), -np.ones(N)
], axis=1).astype(np.float32)
d /= np.linalg.norm(d, axis=1, keepdims=True)
o_d, d_d = jax.device_put((o, d))

# incoherent: random origins in the city, random dirs
o2 = rng.uniform(-35, 35, (N, 3)).astype(np.float32); o2[:,1] = rng.uniform(0, 6, N)
d2 = rng.normal(size=(N, 3)).astype(np.float32)
d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
o2_d, d2_d = jax.device_put((o2, d2))

REPS = 4

@jax.jit
def bench_ch(bvh, o, d):
    acc = jnp.zeros((), jnp.float32)
    steps = jnp.zeros((), jnp.int32)
    for i in range(REPS):
        # data-dependence: perturb origin by acc (0.0 in practice)
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

def run(name, fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    outs = [np.asarray(x) for x in (out if isinstance(out, tuple) else (out,))]
    print(f"{name} compile+first: {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    t0 = time.perf_counter()
    out = fn(*args)
    outs = [np.asarray(x) for x in (out if isinstance(out, tuple) else (out,))]
    dt = time.perf_counter() - t0
    mrays = REPS * N / dt / 1e6
    print(f"{name}: {dt:.3f}s for {REPS}x{N} rays -> {mrays:.1f} Mrays/s  extra={outs[1:]}", file=sys.stderr)
    return mrays

run("closest coherent", bench_ch, bvh, o_d, d_d)
run("closest incoherent", bench_ch, bvh, o2_d, d2_d)
run("occluded coherent", bench_occ, bvh, o_d, d_d)
run("occluded incoherent", bench_occ, bvh, o2_d, d2_d)
