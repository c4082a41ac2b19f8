"""Queue-refill traversal driver: validate the refill primitives' cost at
width 131072 lanes (8, 16384), queue 1.9M rows.

  rank    cumsum rank of finished lanes (flattened (8,L) order)
  qgather row gather of 131k fresh rays from the (1.9M, 8) f32 queue
          (indices = qhead + rank: an ascending contiguous window)
  rscatter row scatter of 131k finished results into (1.9M, 5) f32
  iter    one traversal-shaped iteration (gather+transpose) at (8, 16384)
All chained in a fori_loop, one fetch.
"""
import time, sys
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

SUB, L = 8, 16384
WIDTH = SUB * L
NQ = 1_923_984
U, W = 733, 140
ITERS = 256
rng = np.random.default_rng(0)
queue = jnp.asarray(rng.random((NQ, 8), dtype=np.float32))
out_tab = jnp.zeros((NQ, 5), jnp.float32)
table = jnp.asarray(rng.random((U, W), dtype=np.float32))
done0 = jnp.asarray(rng.random((SUB, L)) < 0.5)
idx_sc = jnp.asarray(rng.permutation(NQ)[:WIDTH].reshape(SUB, L).astype(np.int32))
entry0 = jnp.asarray(rng.integers(0, U, (SUB, L), dtype=np.int32))


def timeit(name, fn, *args):
    f = jax.jit(fn)
    _ = np.asarray(f(*args))
    best = np.inf
    for r in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(f(*args))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    print(f"{name}: {best*1e6:.1f} us/iter", file=sys.stderr)


def loop(body, *args):
    def fn(*a):
        def b(i, s):
            return body(i, s, *a[1:])
        return lax.fori_loop(0, ITERS, b, a[0])[0].reshape(-1)[0]
    return fn


def rank_body(i, s, done):
    acc, = (s,)
    d = done != (i % 2 == 0)
    r = jnp.cumsum(d.reshape(-1).astype(jnp.int32)).reshape(SUB, L)
    return acc + r.astype(jnp.float32)


timeit("rank cumsum 131k", loop(rank_body),
       jnp.zeros((SUB, L), jnp.float32), done0)


def qgather_body(i, s, queue):
    acc, qh = s
    r = jnp.cumsum((acc.reshape(-1) > -1).astype(jnp.int32)).reshape(SUB, L)
    g = jnp.take(queue, (qh + r) % NQ, axis=0)  # (8, L, 8)
    acc = acc + g[..., 0] + g[..., 7]
    return (acc, (qh + WIDTH // 2) % (NQ - WIDTH))


def qg(queue):
    return lax.fori_loop(
        0, ITERS, lambda i, s: qgather_body(i, s, queue),
        (jnp.zeros((SUB, L), jnp.float32), jnp.zeros((), jnp.int32)),
    )[0][0, 0]


timeit("qgather 131k rows of (1.9M,8)", qg, queue)


def rscatter(out_tab, idx_sc):
    def b(i, s):
        ot, = (s,)
        vals = jnp.stack([ot[(idx_sc[0, 0] + i) % NQ]] * WIDTH).reshape(
            SUB, L, 5)
        ot = ot.at[(idx_sc + i) % NQ].set(vals.reshape(SUB, L, 5).reshape(
            SUB * L, 5).reshape(SUB, L, 5))
        return (ot,)
    # simpler: flat scatter
    def b2(i, s):
        ot = s
        vals = jnp.ones((WIDTH, 5), jnp.float32) * i
        ot = ot.at[((idx_sc + i) % NQ).reshape(-1)].set(vals)
        return ot
    return lax.fori_loop(0, ITERS, b2, out_tab)[0, 0]


timeit("rscatter 131k rows into (1.9M,5)", rscatter, out_tab, idx_sc)


def iter_body(i, s, table):
    acc, ii = s
    g = jnp.take(table, ii % U, axis=0)
    gt = jnp.transpose(g, (2, 0, 1))
    nxt = (ii + lax.convert_element_type(gt[1], jnp.int32)) % U
    return (acc + gt[0] + gt[-1], nxt)


def it(table):
    return lax.fori_loop(
        0, ITERS, lambda i, s: iter_body(i, s, table),
        (jnp.zeros((SUB, L), jnp.float32), entry0),
    )[0][0, 0]


timeit("iter take140+T at (8,16384)", it, table)
