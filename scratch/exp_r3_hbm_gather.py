"""Round-3 deep-scene microbenchmark: WHERE does the HBM row-gather cost
come from? Gather (32k,) rows of a (243k, 126) f32 table (122 MB, HBM) vs a
(733, 126) table (VMEM-class), with index distributions:
  uniform   — the deep-scene regime (measured ~570 us/iter in round 2)
  hot       — 95% of indices < 8k (would a hot-subtable split help?)
  clamped0  — all indices 0 (is cost per-lane or per-unique-row?)
  sorted    — uniform but ascending (does locality matter?)
Plus: dynamic_slice of an (8k, 126) contiguous block (the treelet stream).
Timing: chain REPS gathers in one jit, fetch one scalar (axon rules).
"""
import time, sys
import numpy as np
import jax, jax.numpy as jnp

U, W = 243_000, 126
N = 1 << 15
REPS = 16
rng = np.random.default_rng(0)
big = jnp.asarray(rng.random((U, W), dtype=np.float32))
small = jnp.asarray(rng.random((733, W), dtype=np.float32))

idx_uniform = jnp.asarray(rng.integers(0, U, N, dtype=np.int32))
hot = rng.integers(0, 8192, N, dtype=np.int32)
cold = rng.integers(0, U, N, dtype=np.int32)
idx_hot = jnp.asarray(np.where(rng.random(N) < 0.95, hot, cold).astype(np.int32))
idx_zero = jnp.zeros(N, jnp.int32)
idx_sorted = jnp.asarray(np.sort(np.asarray(idx_uniform)))
idx_small = jnp.asarray(rng.integers(0, 733, N, dtype=np.int32))

def timeit(name, fn, *args):
    f = jax.jit(fn)
    _ = np.asarray(f(*args))
    t0 = time.perf_counter(); out = f(*args); _ = np.asarray(out)
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name}: {dt*1e6:.1f} us/iter", file=sys.stderr)

def chain_gather(table):
    def fn(idx):
        acc = jnp.zeros((), jnp.float32)
        for i in range(REPS):
            g = jnp.take(table, (idx + i) % table.shape[0], axis=0)
            acc = acc + g[0, 0]
        return acc
    return fn

timeit("gather big/uniform", chain_gather(big), idx_uniform)
timeit("gather big/hot95", chain_gather(big), idx_hot)
timeit("gather big/all-zero", chain_gather(big), idx_zero)
timeit("gather big/sorted", chain_gather(big), idx_sorted)
timeit("gather small/uniform", chain_gather(small), idx_small)

# hot-split: small-table gather + big-table gather with cold lanes only
def split(idx):
    acc = jnp.zeros((), jnp.float32)
    for i in range(REPS):
        ii = (idx + i) % U
        is_hot = ii < 733
        g1 = jnp.take(small, jnp.where(is_hot, ii, 0), axis=0)
        g2 = jnp.take(big, jnp.where(is_hot, 0, ii), axis=0)
        acc = acc + jnp.where(is_hot[0], g1[0, 0], g2[0, 0])
    return acc
timeit("hot-split (95% hot idx)", split, idx_hot)

# treelet stream: dynamic_slice an 8k-row contiguous block then gather in it
def treelet(idx):
    acc = jnp.zeros((), jnp.float32)
    for i in range(REPS):
        base = (i * 8192) % (U - 8192)
        blk = jax.lax.dynamic_slice(big, (base, 0), (8192, W))
        g = jnp.take(blk, (idx + i) % 8192, axis=0)
        acc = acc + g[0, 0]
    return acc
timeit("treelet: dyn_slice 8k + local gather", treelet, idx_uniform)

# local gather only (block already in VMEM-able size)
blk0 = big[:8192]
timeit("local gather in 8k block", chain_gather(blk0),
       jnp.asarray(rng.integers(0, 8192, N, dtype=np.int32)))
