"""HBM-regime gather cost vs ROW WIDTH (64/128/256 f32 cols) at fixed
row count. If cost is ~width-independent (per-index latency-bound), then
bigger-leaf packing (L24+) cuts leaf pops for free in the deep regime.
All columns consumed. Run after the tunnel is idle.
"""
import time, sys
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/fovtpu_tpu_cache")

SUB, L = 8, 4096
ITERS = 64
rng = np.random.default_rng(0)


def timeit(name, fn, *args):
    f = jax.jit(fn)
    _ = np.asarray(f(*args))
    best = np.inf
    for r in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(f(*args))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    print(f"{name}: {best*1e6:7.1f} us/iter", file=sys.stderr)


def loop(table):
    rows, w = table.shape
    def run(idx):
        def b(i, s):
            acc, ii = s
            g = jnp.take(table, ii, axis=0)
            gt = jnp.transpose(g, (2, 0, 1))
            acc = acc + sum(gt[k] for k in range(w))
            nxt = (lax.convert_element_type(gt[0] * 1e4, jnp.int32) + ii) % rows
            return (acc, jnp.maximum(nxt, 0))
        acc, _ = lax.fori_loop(0, ITERS, b, (jnp.zeros((SUB, L), jnp.float32), idx))
        return acc[0, 0]
    return run


for rows_k, widths in ((243, (64, 128, 256)), (61, (256,))):
    rows = rows_k * 1000
    for w in widths:
        table = jnp.asarray(rng.normal(size=(rows, w)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, rows, (SUB, L), dtype=np.int32))
        timeit(f"rows={rows_k}k w={w:3d} ({rows*w*4/1e6:5.0f} MB)",
               loop(table), idx)
        del table
