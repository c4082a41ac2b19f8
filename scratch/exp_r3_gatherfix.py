"""Quantify the FIXED per-gather overhead of the in-loop row gather:
cost((8, L*k) indices) vs k * cost((8, L)) from the (1469, 64) table.
If strongly sub-linear, wider chunks / multi-pop iterations amortize it.
Also times the transpose copy at each width, and a 2-rows-per-lane variant
(indices (8, 2L) built from two stacked index planes = the pair-pop shape).
"""
import time, sys
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/fovtpu_tpu_cache")

U, W, SUB = 1469, 64, 8
ITERS = 64
rng = np.random.default_rng(0)
table = jnp.asarray(rng.random((U, W), dtype=np.float32))


def timeit(name, fn, *args):
    f = jax.jit(fn)
    _ = np.asarray(f(*args))
    best = np.inf
    for _r in range(4):
        t0 = time.perf_counter()
        _ = np.asarray(f(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {(best)/ITERS*1e6:7.1f} us/iter  (total {best*1e3:.1f} ms)",
          file=sys.stderr)
    return best


def loop(L):
    def run(idx0):
        def body(i, s):
            acc, ii = s
            e = (ii + i) % U
            g = jnp.take(table, e, axis=0)  # (8, L, 64)
            gt = jnp.transpose(g, (2, 0, 1))
            return (acc + gt[0] + gt[63], ii)
        acc, _ = lax.fori_loop(
            0, ITERS, body, (jnp.zeros((SUB, L), jnp.float32), idx0))
        return acc.sum()
    return run


print(f"== (8, L) x {ITERS} gathers from ({U},{W})", file=sys.stderr)
for L in (4096, 8192, 16384, 32768):
    idx = jnp.asarray(rng.integers(0, U, (SUB, L), dtype=np.int32))
    timeit(f"L={L:6d} ({SUB*L//1024:4d}k idx)", loop(L), idx)
