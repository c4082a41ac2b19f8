"""Deep-scene gather structure test.

(1) gather cost vs TABLE SIZE at fixed 32k indices, W=64, consuming all
columns (rule-30 caution). Known points: 733 rows ~50us, 8k ~239us,
243k ~992us — is cost driven by table span (cache/locality) rather than
index count?

(2) WINDOWED gather: dynamic_slice an 8k-row window from the big table,
then gather 32k indices WITHIN the window. If (1) shows span-driven cost,
this should run at the small-table rate + the slice's stream cost —
the micro-validation for treelet/windowed traversal of HBM-scale BVHs.
"""
import time, sys
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/fovtpu_tpu_cache")

SUB, L = 8, 4096
N = SUB * L
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
    print(f"{name}: {best*1e6:.1f} us/iter", file=sys.stderr)


def make_loop(table, u):
    # consume EVERY gathered column; index stream re-randomized per iter
    def run(idx):
        def b(i, s):
            acc, ii = s
            g = jnp.take(table, ii, axis=0)  # (SUB, L, W)
            gt = jnp.transpose(g, (2, 0, 1))
            acc = acc + sum(gt[k] for k in range(W))
            nxt = jnp.take(u, ii, axis=0)
            return (acc, nxt)
        acc, _ = lax.fori_loop(0, ITERS, b,
                               (jnp.zeros((SUB, L), jnp.float32), idx))
        return acc[0, 0]
    return run


for rows in (1024, 4096, 16384, 65536, 243_532):
    table = jnp.asarray(rng.normal(size=(rows, W)).astype(np.float32))
    perm = jnp.asarray((rng.permutation(rows) % rows).astype(np.int32))
    idx = jnp.asarray(rng.integers(0, rows, (SUB, L), dtype=np.int32))
    timeit(f"rows={rows:7d} full", make_loop(table, perm), idx)

# windowed: big table, indices confined to an 8k window whose base moves
# each iteration; gather = dynamic_slice window + take within
BIG = 243_532
WIN = 8192
table = jnp.asarray(rng.normal(size=(BIG, W)).astype(np.float32))
perm_w = jnp.asarray((rng.permutation(WIN)).astype(np.int32))
idx_w = jnp.asarray(rng.integers(0, WIN, (SUB, L), dtype=np.int32))


def run_windowed(idx):
    def b(i, s):
        acc, ii, base = s
        win = lax.dynamic_slice(table, (base, 0), (WIN, W))
        g = jnp.take(win, ii, axis=0)
        gt = jnp.transpose(g, (2, 0, 1))
        acc = acc + sum(gt[k] for k in range(W))
        nxt = jnp.take(perm_w, ii, axis=0)
        nb = (base + 4096) % (BIG - WIN - 1)
        return (acc, nxt, nb)
    acc, _, _ = lax.fori_loop(
        0, ITERS, b,
        (jnp.zeros((SUB, L), jnp.float32), idx, jnp.zeros((), jnp.int32)))
    return acc[0, 0]


timeit("windowed 8k-of-243k", run_windowed, idx_w)

# same but window STATIC at base 0 (does the moving base defeat hoisting?)
def run_win_static(idx):
    def b(i, s):
        acc, ii = s
        win = lax.dynamic_slice(table, (0, 0), (WIN, W))
        g = jnp.take(win, ii, axis=0)
        gt = jnp.transpose(g, (2, 0, 1))
        acc = acc + sum(gt[k] for k in range(W))
        nxt = jnp.take(perm_w, ii, axis=0)
        return (acc, nxt)
    acc, _ = lax.fori_loop(0, ITERS, b,
                           (jnp.zeros((SUB, L), jnp.float32), idx))
    return acc[0, 0]


timeit("window static base ", run_win_static, idx_w)
