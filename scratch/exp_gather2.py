"""Gather rate law with table hoisted into VMEM (fori_loop body)."""
import time, sys
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

N = 1 << 14
G = 160

def bench(W, U, idx_shape, note="", transpose=False, dtype=np.float32):
    table = jnp.asarray(np.random.rand(U, W).astype(dtype))
    idx = jnp.asarray(np.random.randint(0, U, idx_shape).astype(np.int32))
    @jax.jit
    def run(table, idx):
        def body(i, acc):
            row = (idx * (i + 1)) % U
            g = jnp.take(table, row, axis=0)
            if transpose:
                g = g.reshape(-1, W).T
            return acc + jnp.sum(g[..., :1].astype(jnp.float32) if not transpose else g[:1]) * 1e-9
        return lax.fori_loop(0, G, body, jnp.zeros(()))
    out = run(table, idx); _ = np.asarray(out)
    ts = []
    for _i in range(3):
        t0 = time.perf_counter(); out = run(table, idx); _ = np.asarray(out)
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    per_gather = dt / G * 1e6
    bw = idx.size * W * np.dtype(dtype).itemsize / (dt / G) / 1e9
    print(f"W={W:4d} U={U:6d} idx{idx_shape} {np.dtype(dtype).name} {note}: {per_gather:7.1f} us/gather, {bw:6.0f} GB/s", file=sys.stderr)

U = 3167
for W in (16, 32, 40, 64, 128):
    bench(W, U, (1, N))
bench(64, U, (1, N), note="+T", transpose=True)
bench(64, U, (8, N // 8))
bench(64, U, (1, 2 * N), note="2x idx")
bench(64, U, (1, N), dtype=np.int8)
# big table (Sponza-class, will NOT fit VMEM)
bench(64, 1 << 20, (1, N), note="1M rows")
