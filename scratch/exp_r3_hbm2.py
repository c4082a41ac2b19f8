"""HBM-regime row gather in the VALIDATED fori_loop harness (same as
exp_r3_gatherrow): (8,4096) indices into a (243k, 140) f32 table (136 MB).
Variants: uniform / hot95 (95% of idx < 8k) / all-zero / hot-split (two
gathers: small VMEM-class table for hot lanes, big table clamped for cold).
"""
import time, sys
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

SUB, L, U = 8, 4096, 243_532
HOT = 8192
ITERS = 256
rng = np.random.default_rng(0)
big = jnp.asarray(rng.random((U, 140), dtype=np.float32))
small = jnp.asarray(rng.random((HOT, 140), dtype=np.float32))

idx_u = jnp.asarray(rng.integers(0, U, (SUB, L), dtype=np.int32))
h = rng.integers(0, HOT, (SUB, L), dtype=np.int32)
c = rng.integers(0, U, (SUB, L), dtype=np.int32)
idx_h = jnp.asarray(np.where(rng.random((SUB, L)) < 0.95, h, c).astype(np.int32))
idx_0 = jnp.zeros((SUB, L), jnp.int32)


def timeit(name, fn, *args):
    f = jax.jit(fn)
    _ = np.asarray(f(*args))
    best = np.inf
    for r in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(f(*args))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    print(f"{name}: {best*1e6:.1f} us/iter", file=sys.stderr)


def plain(idx, table):
    def b(i, s):
        acc, ii = s
        g = jnp.take(table, ii, axis=0)
        gt = jnp.transpose(g, (2, 0, 1))
        nxt = (ii + lax.convert_element_type(gt[1], jnp.int32)) % table.shape[0]
        return (acc + gt[0] + gt[-1], nxt)
    acc, _ = lax.fori_loop(0, ITERS, b,
                           (jnp.zeros((SUB, L), jnp.float32), idx))
    return acc[0, 0]


def split(idx):
    def b(i, s):
        acc, ii = s
        is_hot = ii < HOT
        g1 = jnp.take(small, jnp.where(is_hot, ii, 0), axis=0)
        g2 = jnp.take(big, jnp.where(is_hot, 0, ii), axis=0)
        g1t = jnp.transpose(g1, (2, 0, 1))
        g2t = jnp.transpose(g2, (2, 0, 1))
        gt0 = jnp.where(is_hot, g1t[0], g2t[0])
        gt1 = jnp.where(is_hot, g1t[1], g2t[1])
        gtl = jnp.where(is_hot, g1t[-1], g2t[-1])
        nxt = (ii + lax.convert_element_type(gt1, jnp.int32)) % U
        return (acc + gt0 + gtl, nxt)
    acc, _ = lax.fori_loop(0, ITERS, b,
                           (jnp.zeros((SUB, L), jnp.float32), idx))
    return acc[0, 0]


timeit("big/uniform", plain, idx_u, big)
timeit("big/hot95", plain, idx_h, big)
timeit("big/all-zero", plain, idx_0, big)
timeit("small/uniform", plain, idx_h % HOT, small)
timeit("hot-split 95%", split, idx_h)
