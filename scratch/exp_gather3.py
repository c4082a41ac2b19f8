"""Gather cost vs index distribution: duplicates matter?"""
import time, sys
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

N = 1 << 14
G = 160
U = 3167
W = 64

def bench(idx_np, note):
    table = jnp.asarray(np.random.rand(U, W).astype(np.float32))
    idx = jnp.asarray(idx_np.astype(np.int32).reshape(1, N))
    @jax.jit
    def run(table, idx):
        def body(i, acc):
            row = jnp.where(idx + i < U, idx, 0)  # keep distribution, add dependence
            g = jnp.take(table, row, axis=0)
            return acc + jnp.sum(g[..., :1]) * 1e-9
        return lax.fori_loop(0, G, body, jnp.zeros(()))
    out = run(table, idx); _ = np.asarray(out)
    ts = []
    for _i in range(3):
        t0 = time.perf_counter(); out = run(table, idx); _ = np.asarray(out)
        ts.append(time.perf_counter() - t0)
    dt = min(ts) / G * 1e6
    print(f"{note}: {dt:7.1f} us/gather", file=sys.stderr)

rng = np.random.default_rng(0)
bench(np.full(N, 42), "all-same row")
bench(np.repeat(rng.integers(0, U, N // 256), 256), "256-dup blocks")
bench(np.repeat(rng.integers(0, U, N // 8), 8), "8-dup blocks")
bench(np.sort(rng.integers(0, U, N)), "sorted random")
bench(rng.integers(0, U, N), "random")
bench(rng.integers(0, 64, N), "random small range 64")
