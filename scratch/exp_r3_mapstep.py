"""Measure lax.map per-step FIXED overhead for traversal-shaped bodies:
map over C chunks whose while_loop exits immediately (sp=0 everywhere)
vs runs k iterations. Also: map xs data volume effect (11 planes vs 2).
"""
import time, sys
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

SUB, L, C, U, W, D = 8, 4096, 59, 733, 140, 16
rng = np.random.default_rng(0)
table = jnp.asarray(rng.random((U, W), dtype=np.float32))


def timeit(name, fn, *args):
    f = jax.jit(fn)
    _ = np.asarray(f(*args))
    best = np.inf
    for r in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(f(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best*1e3:.2f} ms total, {best/C*1e6:.1f} us/chunk",
          file=sys.stderr)


def make(iters, planes):
    xs = tuple(
        jnp.asarray(rng.random((C, SUB, L), dtype=np.float32))
        for _ in range(planes - 1)
    ) + (jnp.zeros((C, SUB, L), jnp.int32),)  # sp plane (all zero = idle)

    def step(args):
        sp = args[-1] + iters  # iters>0 makes the while run `iters` times
        o = args[0]

        def cond(s):
            return jnp.any(s[1] > 0)

        def body(s):
            acc, sp2 = s
            entry = (lax.convert_element_type(acc, jnp.int32) + sp2) % U
            g = jnp.take(table, jnp.maximum(entry, 0), axis=0)
            gt = jnp.transpose(g, (2, 0, 1))
            return (acc + gt[0], sp2 - 1)

        out = lax.while_loop(cond, body, (o, sp))
        return out[0]

    def fn():
        return jax.lax.map(step, xs).reshape(-1)[0]

    return fn


timeit("idle 11-plane xs", make(0, 11))
timeit("idle 2-plane xs", make(0, 2))
timeit("4-iter 11-plane", make(4, 11))
timeit("12-iter 11-plane", make(12, 11))
