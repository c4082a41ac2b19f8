"""Does the HBM row gather stay per-index-rate at W=256/512? (r3d_hbm2
showed W64 1176 / W128 1087 us per 32k-idx gather — flat.) If yes, A32/L12
and A64/L24 rows halve/quarter pops at ~constant per-iteration cost."""
import time, sys
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/fovtpu_tpu_cache")

SUB, L = 8, 4096
N = SUB * L
ITERS = 32
rng = np.random.default_rng(0)


def timeit(name, fn, *args):
    f = jax.jit(fn)
    _ = np.asarray(f(*args))
    best = np.inf
    for r in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(f(*args))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    print(f"{name}: {best*1e6:.1f} us/iter", file=sys.stderr)


def make_run(table):
    def run(idxs):
        def b(i, acc):
            g = jnp.take(table, idxs[i], axis=0)
            return acc + jnp.sum(g.astype(jnp.float32))
        return lax.fori_loop(0, ITERS, b, jnp.zeros((), jnp.float32))
    return run


def idx_tensor(u):
    out = rng.integers(0, u, (ITERS, SUB, L), dtype=np.int32)
    return jnp.asarray(out)


# hold table BYTES ~constant (118 MB) so only the row width varies
for w in (128, 256, 512):
    u = 461_698 * 64 // w
    table = jnp.asarray(rng.random((u, w), dtype=np.float32))
    print(f"-- HBM ({u},{w}) f32 = {u*w*4/1e6:.0f} MB", file=sys.stderr)
    timeit(f"W{w} f32 random", make_run(table), idx_tensor(u))
    del table
