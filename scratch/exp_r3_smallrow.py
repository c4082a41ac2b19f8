"""Gathers of 1.9M indices from small tables: 1-D element gather (current
probe_sample shape) vs packed row gathers of width 4/8/12/24. Decides the
probe alias-table packing and material/tri_pack packing."""
import time, sys
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

N = 1_923_984
K = 32768
ITERS = 64
rng = np.random.default_rng(0)
idx = jnp.asarray(rng.integers(0, K, N, dtype=np.int32))
t1 = jnp.asarray(rng.random(K, dtype=np.float32))
t4 = jnp.asarray(rng.random((K, 4), dtype=np.float32))
t8 = jnp.asarray(rng.random((K, 8), dtype=np.float32))
t12s = jnp.asarray(rng.random((6924, 12), dtype=np.float32))
t24s = jnp.asarray(rng.random((577, 24), dtype=np.float32))
idx_s = jnp.asarray(rng.integers(0, 6924, N, dtype=np.int32))
idx_m = jnp.asarray(rng.integers(0, 577, N, dtype=np.int32))


def timeit(name, fn, *args):
    f = jax.jit(fn)
    _ = np.asarray(f(*args))
    best = np.inf
    for r in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(f(*args))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    print(f"{name}: {best*1e3:.2f} ms", file=sys.stderr)


def loop1d(table):
    def fn(idx):
        def b(i, s):
            acc, ii = s
            g = jnp.take(table, ii, axis=0)
            return (acc + g, (ii + 1) % table.shape[0])
        return lax.fori_loop(
            0, ITERS, b, (jnp.zeros(N, jnp.float32), idx))[0][0]
    return fn


def loopnd(table):
    def fn(idx):
        def b(i, s):
            acc, ii = s
            g = jnp.take(table, ii, axis=0)
            return (acc + g[:, 0] + g[:, -1],
                    (ii + lax.convert_element_type(g[:, 1], jnp.int32))
                    % table.shape[0])
        return lax.fori_loop(
            0, ITERS, b, (jnp.zeros(N, jnp.float32), idx))[0][0]
    return fn


timeit("1-D (32768,)", loop1d(t1), idx)
timeit("rows (32768,4)", loopnd(t4), idx)
timeit("rows (32768,8)", loopnd(t8), idx)
timeit("rows (6924,12) tri_pack", loopnd(t12s), idx_s)
timeit("rows (577,24) materials", loopnd(t24s), idx_m)
