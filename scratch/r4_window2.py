"""Re-verify r3f_window with FULL column consumption (PLAN rule 30: XLA
narrows gathers whose columns are unused — r3f_window may be an artifact).
A/B at 243k and 872k rows x 64 cols:
  direct  : gather straight from the big HBM table
  windowed: dynamic_slice an 8k-row window, gather relative indices
  vmem8k  : gather from a genuinely small 8k table (floor)
All variants consume every gathered column and chain indices dependently.
Run: python -c "exec(open('scratch/r4_window2.py').read())"
"""
import time, sys
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/fovtpu_tpu_cache")

SUB, L = 8, 4096
ITERS = 64
W = 64
WIN = 8192
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


def direct(table):
    rows = table.shape[0]
    def run(idx):
        def b(i, s):
            acc, ii = s
            g = jnp.take(table, ii, axis=0)
            gt = jnp.transpose(g, (2, 0, 1))
            acc = acc + sum(gt[k] for k in range(W))
            nxt = (lax.convert_element_type(gt[0] * 1e4, jnp.int32) + ii) % rows
            return (acc, jnp.maximum(nxt, 0))
        acc, _ = lax.fori_loop(0, ITERS, b, (jnp.zeros((SUB, L), jnp.float32), idx))
        return acc[0, 0]
    return run


def windowed(table):
    rows = table.shape[0]
    nb = rows - WIN - 1
    def run(idx, base0):
        def b(i, s):
            acc, ii, base = s
            win = lax.dynamic_slice(table, (base, 0), (WIN, W))
            g = jnp.take(win, ii, axis=0)
            gt = jnp.transpose(g, (2, 0, 1))
            acc = acc + sum(gt[k] for k in range(W))
            nxt = (lax.convert_element_type(gt[0] * 1e4, jnp.int32) + ii) % WIN
            nbase = (base * 7919 + 13) % nb
            return (acc, jnp.maximum(nxt, 0), nbase)
        acc, _, _ = lax.fori_loop(
            0, ITERS, b, (jnp.zeros((SUB, L), jnp.float32), idx, base0))
        return acc[0, 0]
    return run


small = jnp.asarray(rng.normal(size=(WIN, W)).astype(np.float32))
idx_w = jnp.asarray(rng.integers(0, WIN, (SUB, L), dtype=np.int32))
timeit("vmem 8k floor      ", direct(small), idx_w)

for rows_k in (243, 872):
    rows = rows_k * 1000
    table = jnp.asarray(rng.normal(size=(rows, W)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, rows, (SUB, L), dtype=np.int32))
    timeit(f"rows={rows_k}k direct  ", direct(table), idx)
    timeit(f"rows={rows_k}k windowed", windowed(table), idx_w,
           jnp.zeros((), jnp.int32))
    del table
