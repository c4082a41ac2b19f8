"""HBM-regime gather: does INDEX LOCALITY matter (unlike VMEM, finding 16)?

If the HBM row gather is latency/descriptor-bound on scattered rows, sorted
or clustered indices may ride DRAM bursts/pages and approach bandwidth rate
(32k x 560 B = 18 MB/iter = ~22 us at 819 GB/s vs measured 458 us — 20x
headroom). If sorted >> random, a level-synchronous ray-sorted traversal
(stream the frontier in node order) is the deep-scene direction; if not,
bytes/row (W=64 tables) is the only remaining lever.

Validated fori harness (same as exp_r3_hbm2): (8,4096) indices into
(243k, W) f32 tables.
"""
import time, sys
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

SUB, L, U = 8, 4096, 243_532
ITERS = 128
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


def make_loop(table, perm):
    # perm re-randomizes the index stream each iteration so the pattern
    # CLASS is preserved while values change (no constant-folding)
    def run(idx):
        def b(i, s):
            acc, ii = s
            g = jnp.take(table, ii, axis=0)
            gt = jnp.transpose(g, (2, 0, 1))
            nxt = jnp.take(perm, ii, axis=0)  # next index, same distribution
            return (acc + gt[0] + gt[-1], nxt)
        acc, _ = lax.fori_loop(0, ITERS, b,
                               (jnp.zeros((SUB, L), jnp.float32), idx))
        return acc[0, 0]
    return run


for W in (140, 64):
    table = jnp.asarray(rng.random((U, W), dtype=np.float32))
    print(f"-- table ({U},{W}) = {U*W*4/1e6:.0f} MB", file=sys.stderr)

    # random scattered
    idx_r = jnp.asarray(rng.integers(0, U, (SUB, L), dtype=np.int32))
    perm_r = jnp.asarray(rng.permutation(U).astype(np.int32))
    timeit(f"W{W} random  ", make_loop(table, perm_r), idx_r)

    # sorted each iteration: still 32k distinct random rows, but the gather
    # sees a monotone index stream (burst/page friendly if that matters)
    def run_sorted(idx, table=table, perm=perm_r):
        def b(i, s):
            acc, ii = s
            ii_s = jnp.sort(ii.reshape(-1)).reshape(SUB, L)
            g = jnp.take(table, ii_s, axis=0)
            gt = jnp.transpose(g, (2, 0, 1))
            nxt = jnp.take(perm, ii, axis=0)
            return (acc + gt[0] + gt[-1], nxt)
        acc, _ = lax.fori_loop(0, ITERS, b,
                               (jnp.zeros((SUB, L), jnp.float32), idx))
        return acc[0, 0]
    timeit(f"W{W} sorted  ", run_sorted, idx_r)

    # sorted + declared: indices_are_sorted=True lets XLA pick a sorted-path
    # gather emitter if one exists
    def run_sorted_decl(idx, table=table, perm=perm_r):
        def b(i, s):
            acc, ii = s
            ii_s = jnp.sort(ii.reshape(-1)).reshape(SUB, L)
            g = table.at[ii_s].get(indices_are_sorted=True)
            gt = jnp.transpose(g, (2, 0, 1))
            nxt = jnp.take(perm, ii, axis=0)
            return (acc + gt[0] + gt[-1], nxt)
        acc, _ = lax.fori_loop(0, ITERS, b,
                               (jnp.zeros((SUB, L), jnp.float32), idx))
        return acc[0, 0]
    timeit(f"W{W} sortdecl", run_sorted_decl, idx_r)

    # bf16 table: same row count, half the bytes (is the HBM gather at all
    # bytes-bound?)
    tb16 = table.astype(jnp.bfloat16)
    def run_b16(idx, table=tb16, perm=perm_r):
        def b(i, s):
            acc, ii = s
            g = jnp.take(table, ii, axis=0)
            gt = jnp.transpose(g, (2, 0, 1)).astype(jnp.float32)
            nxt = jnp.take(perm, ii, axis=0)
            return (acc + gt[0] + gt[-1], nxt)
        acc, _ = lax.fori_loop(0, ITERS, b,
                               (jnp.zeros((SUB, L), jnp.float32), idx))
        return acc[0, 0]
    timeit(f"W{W} bf16    ", run_b16, idx_r)

    # clustered: indices drawn from an 8k-row window that drifts per iter
    base = rng.integers(0, U - 8192)
    idx_c = jnp.asarray(
        (base + rng.integers(0, 8192, (SUB, L))).astype(np.int32))
    perm_c = jnp.asarray(
        ((np.arange(U) * 7919 + 13) % 8192
         + (np.arange(U) % (U - 8192))).astype(np.int32))
    timeit(f"W{W} cluster8k", make_loop(table, perm_c), idx_c)

    # contiguous dynamic_slice of 32k rows (pure streaming bound)
    def run_stream(start, table=table):
        def b(i, s):
            acc, st = s
            g = lax.dynamic_slice(
                table, (st, 0), (SUB * L, table.shape[1]))
            gt = g.reshape(SUB, L, -1)
            nxt = (st + 1) % (U - SUB * L - 2)
            return (acc + gt[:, :, 0] + gt[:, :, -1], nxt)
        acc, _ = lax.fori_loop(
            0, ITERS, b, (jnp.zeros((SUB, L), jnp.float32), start))
        return acc[0, 0]
    timeit(f"W{W} stream  ", run_stream, jnp.zeros((), jnp.int32))
