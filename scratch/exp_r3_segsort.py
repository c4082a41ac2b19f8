"""Segmented (batched) sort vs flat sort at frame sizes: per-bounce
compaction only needs alive-first WITHIN segments (idle chunks are cheap
wherever they sit), and a batched (C, S) lax.sort runs a shallower network.
Measures 7-operand sorts: flat 1.48M vs segments of 256k / 128k / 32k.
Scalar output (sum) to avoid tunnel-fetch pollution; subtract the fetch
floor (~23.5 ms) from everything.
"""
import time, sys
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/fovtpu_tpu_cache")

N = 1_572_864  # 1.5M, divisible by 32k/128k/256k
rng = np.random.default_rng(0)
key_i = jnp.asarray(rng.integers(0, 2**30, N, dtype=np.int32))
cols = [jnp.asarray(rng.random(N, dtype=np.float32)) for _ in range(6)]


def timeit(name, fn, *args, reps=4):
    f = jax.jit(fn)
    _ = np.asarray(f(*args))
    best = np.inf
    for _r in range(reps):
        t0 = time.perf_counter()
        _ = np.asarray(f(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best*1e3:7.2f} ms", file=sys.stderr)
    return best


def flat(k, *cs):
    out = lax.sort([k] + list(cs), num_keys=1)
    return sum(o.sum() for o in out[1:])


def seg(S):
    def f(k, *cs):
        ops = [x.reshape(-1, S) for x in (k,) + cs]
        out = lax.sort(ops, dimension=1, num_keys=1)
        return sum(o.sum() for o in out[1:])
    return f


timeit("fetch floor (sum only)", lambda k: k.sum(), key_i)
timeit("flat 1.5M   7 ops", flat, key_i, *cols)
for S in (262144, 131072, 32768):
    timeit(f"seg {S//1024:4d}k 7 ops", seg(S), key_i, *cols)
# 2-op variants (the occl unsort shape)
timeit("flat 1.5M   2 ops", flat, key_i, cols[0])
timeit("seg  256k   2 ops", seg(262144), key_i, cols[0])
