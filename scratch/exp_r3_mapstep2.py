"""Dissect the lax.map per-chunk-step fixed cost (~467 us at 32k lanes,
finding 15): is it per-OPERAND staging (then packing all xs into one tensor
wins) or monolithic width-scaled data movement (then nothing but smaller
state helps)?

Variants at C=40 chunks x (8, 4096) lanes, body = while that exits
immediately (idle):
  a) 11 separate f32 (8,L) operands (the closest_hit xs shape today)
  b) ONE packed (8, L, 11) f32 operand
  c) 4 operands
  d) 11 operands but half-width chunks (C=80 x (8,2048))
  e) 11 operands, body while runs 12 iterations of a dummy VPU op
     (does the fixed cost overlap real work, or add?)
"""
import time, sys
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/fovtpu_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

SUB = 8


def timeit(name, fn, *args, reps=6):
    f = jax.jit(fn)
    _ = np.asarray(f(*args))
    best = np.inf
    for r in range(3):
        t0 = time.perf_counter()
        acc = None
        for _ in range(reps):
            acc = f(*args)
        _ = np.asarray(acc)
        best = min(best, (time.perf_counter() - t0) / reps)
    print(f"{name}: {best*1e3:.2f} ms", file=sys.stderr)


rng = np.random.default_rng(0)


def sep_ops(C, L, n_ops, iters=0):
    xs = tuple(
        jnp.asarray(rng.random((C, SUB, L), dtype=np.float32))
        for _ in range(n_ops)
    )

    def step(x):
        def cond(s):
            return s[1] < iters

        def body(s):
            acc, i = s
            return (acc * 1.0000001 + x[0], i + 1)

        out = lax.while_loop(
            cond, body, (jnp.zeros((SUB, L), jnp.float32),
                         jnp.zeros((), jnp.int32))
        )
        return sum(o[0, 0] for o in x) + out[0][0, 0]

    def run(*xs):
        return lax.map(step, xs).sum()

    return run, xs


def packed_ops(C, L, n_ops):
    x = jnp.asarray(rng.random((C, SUB, L, n_ops), dtype=np.float32))

    def step(x):
        def cond(s):
            return s[1] < 0

        def body(s):
            return (s[0] * 1.0000001, s[1] + 1)

        out = lax.while_loop(
            cond, body, (jnp.zeros((SUB, L), jnp.float32),
                         jnp.zeros((), jnp.int32))
        )
        return x.sum(axis=(0, 1))[0] + out[0][0, 0]

    def run(x):
        return lax.map(step, (x,)).sum()

    return run, (x,)


for name, (run, xs) in (
    ("a) 11 sep ops idle  C40xL4096", sep_ops(40, 4096, 11)),
    ("b) packed idle      C40xL4096", packed_ops(40, 4096, 11)),
    ("c) 4 sep ops idle   C40xL4096", sep_ops(40, 4096, 4)),
    ("d) 11 sep idle      C80xL2048", sep_ops(80, 2048, 11)),
    ("e) 11 sep 12 iters  C40xL4096", sep_ops(40, 4096, 11, iters=12)),
):
    timeit(name, run, *xs)
