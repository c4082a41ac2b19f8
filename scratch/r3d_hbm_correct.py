"""CORRECTED HBM gather characterization: every gathered column is consumed
(sum over all W planes), so XLA cannot narrow the gather (PLAN.md finding 30
— the earlier hbmloc/multigather harnesses consumed 2 of 64 columns and
measured a 32x-narrowed gather).

Measures at 32k indices: random vs sorted index streams, widths 32/64/128,
f32 vs bf16 rows, and 8k/16k/32k/64k index counts at W=64.
"""
import time, sys
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

SUB, L, U = 8, 4096, 461_698  # rows of the 1.9M-tri L6/A16 table
ITERS = 64
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


def make_run(table, perm, sort=False, sub=SUB, l=L):
    w = table.shape[1]

    def run(idx):
        def b(i, s):
            acc, ii = s
            iu = jnp.sort(ii.reshape(-1)).reshape(sub, l) if sort else ii
            g = jnp.take(table, iu, axis=0)
            gt = jnp.transpose(g, (2, 0, 1)).astype(jnp.float32)
            tot = gt[0]
            for c in range(1, w):  # consume EVERY column
                tot = tot + gt[c]
            nxt = jnp.take(perm, ii, axis=0)
            return (acc + tot, nxt)
        acc, _ = lax.fori_loop(0, ITERS, b,
                               (jnp.zeros((sub, l), jnp.float32), idx))
        return acc[0, 0]
    return run


perm = jnp.asarray(rng.permutation(U).astype(np.int32))
idx0 = jnp.asarray(rng.integers(0, U, (SUB, L), dtype=np.int32))

for w in (64, 32, 128):
    table = jnp.asarray(rng.random((U, w), dtype=np.float32))
    print(f"-- ({U},{w}) f32 = {U*w*4/1e6:.0f} MB", file=sys.stderr)
    timeit(f"W{w} f32 random", make_run(table, perm), idx0)
    if w == 64:
        timeit(f"W{w} f32 sorted", make_run(table, perm, sort=True), idx0)
        tb = table.astype(jnp.bfloat16)
        timeit(f"W{w} bf16 random", make_run(tb, perm), idx0)
        for lanes in (8192, 16384, 65536):
            li = lanes // SUB
            idx_s = jnp.asarray(
                rng.integers(0, U, (SUB, li), dtype=np.int32))
            perm_s = perm
            timeit(f"W{w} f32 {lanes//1024}k-idx",
                   make_run(table, perm_s, sub=SUB, l=li), idx_s)
    del table
