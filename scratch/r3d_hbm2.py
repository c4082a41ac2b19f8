"""CORRECTED HBM gather characterization (lean). Every gathered element is
consumed via jnp.sum (XLA cannot narrow the gather — PLAN finding 30).
Index streams are PRECOMPUTED (32, SUB, L) tensors — no in-loop sort cost.

Variants: W64 HBM random / sorted / contiguous-block, W64 VMEM-size random
(calibration), bf16 random, W32/W128 random.
"""
import time, sys
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/fovtpu_tpu_cache")

SUB, L, U = 8, 4096, 461_698
N = SUB * L
ITERS = 32
rng = np.random.default_rng(0)


def timeit(name, fn, *args):
    f = jax.jit(fn)
    _ = np.asarray(f(*args))
    best = np.inf
    for r in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(f(*args))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    print(f"{name}: {best*1e6:.1f} us/iter", file=sys.stderr)


def make_run(table):
    def run(idxs):
        def b(i, acc):
            g = jnp.take(table, idxs[i], axis=0)  # (SUB, L, W)
            return acc + jnp.sum(g.astype(jnp.float32))
        return lax.fori_loop(0, ITERS, b, jnp.zeros((), jnp.float32))
    return run


def idx_tensor(u, kind):
    out = np.empty((ITERS, SUB, L), np.int32)
    for i in range(ITERS):
        if kind == "random":
            a = rng.integers(0, u, N, dtype=np.int32)
        elif kind == "sorted":
            a = np.sort(rng.integers(0, u, N, dtype=np.int32))
        elif kind == "block":  # contiguous 32k-row window, random start
            s = int(rng.integers(0, max(1, u - N)))
            a = (s + np.arange(N, dtype=np.int32)) % u
        out[i] = a.reshape(SUB, L)
    return jnp.asarray(out)


for w, variants in ((64, ("random", "sorted", "block")), (32, ("random",)),
                    (128, ("random",))):
    table = jnp.asarray(rng.random((U, w), dtype=np.float32))
    print(f"-- HBM ({U},{w}) f32 = {U*w*4/1e6:.0f} MB", file=sys.stderr)
    for kind in variants:
        timeit(f"W{w} f32 {kind}", make_run(table), idx_tensor(U, kind))
    if w == 64:
        tb = table.astype(jnp.bfloat16)
        timeit("W64 bf16 random", make_run(tb), idx_tensor(U, "random"))
    del table

UV = 1469  # VMEM-size calibration table
tv_ = jnp.asarray(rng.random((UV, 64), dtype=np.float32))
timeit("W64 f32 VMEM random", make_run(tv_), idx_tensor(UV, "random"))
