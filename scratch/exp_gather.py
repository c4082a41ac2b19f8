"""Gather rate law: µs per 16k-row gather vs row width W (f32)."""
import time, sys
import numpy as np
import jax, jax.numpy as jnp

N = 1 << 14
U = 3167
G = 160  # chained gathers per jit

def bench(W, idx_shape, note=""):
    table = jnp.asarray(np.random.rand(U, W).astype(np.float32))
    idx = jnp.asarray(np.random.randint(0, U, idx_shape).astype(np.int32))
    @jax.jit
    def run(table, idx):
        acc = jnp.zeros(())
        for i in range(G):
            row = (idx * (i + 1)) % U
            g = jnp.take(table, row, axis=0)
            acc += jnp.sum(g) * 1e-9
        return acc
    out = run(table, idx); _ = np.asarray(out)
    ts = []
    for _i in range(3):
        t0 = time.perf_counter(); out = run(table, idx); _ = np.asarray(out)
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    per_gather = dt / G * 1e6
    bw = N * W * 4 / (dt / G) / 1e9
    print(f"W={W:4d} idx{idx_shape} {note}: {per_gather:7.1f} us/gather, {bw:6.0f} GB/s", file=sys.stderr)

for W in (8, 16, 32, 40, 64, 128, 256):
    bench(W, (N,))
bench(64, (1, N))
bench(64, (8, N // 8))
bench(64, (2 * N,), note="2x rows")
