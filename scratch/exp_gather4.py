"""Gather cost with full materialization (accumulate whole gathered block)."""
import time, sys
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

N = 1 << 14
G = 160
U = 3167

def bench(W, note="", dtype=np.float32, N_=N):
    table = jnp.asarray(np.random.rand(U, W).astype(dtype))
    idx0 = jnp.asarray(np.random.default_rng(0).integers(0, U, (1, N_)).astype(np.int32))
    @jax.jit
    def run(table, idx0):
        def body(i, carry):
            acc, idx = carry
            g = jnp.take(table, idx, axis=0)  # (1, N, W)
            acc = acc + g.astype(jnp.float32)
            # next idx depends on gathered data -> no hoisting
            idx = (idx + lax.convert_element_type(g[..., 0], jnp.int32) + i) % U
            return (acc, idx)
        acc0 = jnp.zeros((1, N_, W), jnp.float32)
        acc, idx = lax.fori_loop(0, G, body, (acc0, idx0))
        return jnp.sum(acc[0, :4, :4])
    out = run(table, idx0); _ = np.asarray(out)
    ts = []
    for _i in range(3):
        t0 = time.perf_counter(); out = run(table, idx0); _ = np.asarray(out)
        ts.append(time.perf_counter() - t0)
    dt = min(ts) / G * 1e6
    bw = N_ * W * np.dtype(dtype).itemsize / (dt / 1e6) / 1e9
    print(f"W={W:4d} N={N_} {np.dtype(dtype).name} {note}: {dt:7.1f} us/gather {bw:6.0f} GB/s", file=sys.stderr)

for W in (16, 32, 40, 64, 128):
    bench(W)
bench(64, N_=N*2, note="32k idx")
bench(64, N_=N//2, note="8k idx")
