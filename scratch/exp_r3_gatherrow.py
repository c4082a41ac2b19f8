"""Round-3: characterize the in-loop row gather (the 58%-of-iteration cost).
Variants at 32k indices (the 8x4096 chunk):
  a. take(733,140)+transpose (current shape)
  b. take alone (no transpose; consume 2 cols)
  c. transpose alone
  d/e. width 64 / 280
  f. bf16 table
  g. sorted indices / clustered indices (locality?)
  h. 64k indices in one take (2-wide traversal amortization?)
  i. take into (8,L,W) then per-plane strided reads (no transpose)
All inside a fori_loop like the real traversal (table hoisted by XLA).
"""
import time, sys
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

SUB, L, U = 8, 4096, 733
ITERS = 1024
rng = np.random.default_rng(0)
idx = jnp.asarray(rng.integers(0, U, (SUB, L), dtype=np.int32))
idx_sorted = jnp.asarray(np.sort(rng.integers(0, U, SUB * L).astype(np.int32)
                                 ).reshape(SUB, L))
# clustered: lanes in the same sublane-row hit nearby rows
base = rng.integers(0, U - 8, (SUB, 1))
idx_clust = jnp.asarray(((base + rng.integers(0, 8, (SUB, L))) % U
                         ).astype(np.int32))
idx2 = jnp.asarray(rng.integers(0, U, (2 * SUB, L), dtype=np.int32))


def timeit(name, fn, *args):
    f = jax.jit(fn)
    _ = np.asarray(f(*args))
    best = np.inf
    for r in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(f(*args))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    print(f"{name}: {best*1e6:.1f} us/iter", file=sys.stderr)
    return best


def loop(body):
    def fn(idx, table):
        def b(i, s):
            acc, ii = s
            a2, i2 = body(i, ii, table)
            return (acc + a2, i2)
        acc, _ = lax.fori_loop(
            0, ITERS, b,
            (jnp.zeros(idx.shape[-2:], jnp.float32)[:SUB], idx))
        return acc[0, 0]
    return fn


def make_table(w, dtype=np.float32):
    return jnp.asarray(rng.random((U, w)).astype(dtype))


t140 = make_table(140)
t64 = make_table(64)
t280 = make_table(280)
t140b = jnp.asarray(np.asarray(t140), dtype=jnp.bfloat16)


def cur(i, ii, table):  # a: take + transpose, consume all planes cheaply
    g = jnp.take(table, ii, axis=0)
    gt = jnp.transpose(g, (2, 0, 1)).astype(jnp.float32)
    acc = gt[0] + gt[-1]
    nxt = (ii + lax.convert_element_type(gt[1], jnp.int32)) % U
    return acc[:SUB], nxt


def no_t(i, ii, table):  # b: take alone
    g = jnp.take(table, ii, axis=0).astype(jnp.float32)
    acc = g[..., 0] + g[..., -1]
    nxt = (ii + lax.convert_element_type(g[..., 1], jnp.int32)) % U
    return acc[:SUB], nxt


timeit("a take140+T", loop(cur), idx, t140)
timeit("b take140 noT", loop(no_t), idx, t140)
timeit("d take64+T", loop(cur), idx, t64)
timeit("e take280+T", loop(cur), idx, t280)
timeit("f take140 bf16+T", loop(cur), idx, t140b)
timeit("g sorted idx", loop(cur), idx_sorted, t140)
timeit("g2 clustered idx", loop(cur), idx_clust, t140)
timeit("h 64k idx (2x)", loop(cur), idx2, t140)
