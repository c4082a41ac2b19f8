"""Is the HBM gather penalty driven by TABLE size or by the INDEX SPREAD?
r3f_window showed a gather confined to an 8k-row dynamic_slice window runs
at small-table rate — but it changed two things (slice + confinement).
If confinement ALONE suffices, the deep-scene fix is just a DFS
subtree-contiguous row ordering (host-side), no windowing machinery.
Consume every gathered column (PLAN rule 30 caution).
Run: python -c "exec(open('scratch/r4_span.py').read())"
"""
import time, sys
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/fovtpu_tpu_cache")

SUB, L = 8, 4096
ITERS = 64
W = 64
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


def make_loop(table, band):
    rows = table.shape[0]
    nb = max(rows - band - 1, 1)

    def run(idx, base0):
        def b(i, s):
            acc, ii, base = s
            g = jnp.take(table, base + ii, axis=0)  # (SUB, L, W)
            gt = jnp.transpose(g, (2, 0, 1))
            acc = acc + sum(gt[k] for k in range(W))
            # next indices derived from gathered data (dependent chain),
            # confined to [0, band)
            nxt = (lax.convert_element_type(gt[0] * 1e4, jnp.int32) + ii) % band
            nxt = jnp.maximum(nxt, 0)
            nbase = (base * 7919 + 13) % nb  # jump the band around the table
            return (acc, nxt, nbase)
        acc, _, _ = lax.fori_loop(
            0, ITERS, b, (jnp.zeros((SUB, L), jnp.float32), idx, base0))
        return acc[0, 0]
    return run


for rows_k in (243, 872):
    rows = rows_k * 1000
    table = jnp.asarray(rng.normal(size=(rows, W)).astype(np.float32))
    mb = rows * W * 4 / 1e6
    for band in (rows, 65536, 8192):
        idx = jnp.asarray(
            rng.integers(0, band, (SUB, L), dtype=np.int32))
        timeit(f"rows={rows_k}k ({mb:.0f} MB) band={band:7d}",
               make_loop(table, band), idx, jnp.zeros((), jnp.int32))
    del table
