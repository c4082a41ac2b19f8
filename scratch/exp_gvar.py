"""In-loop gather variants: which layout/idiom minimizes gather+transpose?"""
import time, sys
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

N = 1 << 14
L = N // 8
G = 300
U = 3167

tab = np.random.rand(U, 64).astype(np.float32)
table = jnp.asarray(tab)
tableT = jnp.asarray(tab.T.copy())
idx0 = jnp.asarray(np.random.default_rng(0).integers(0, U, (8, L)).astype(np.int32))

def timeit(name, fn, *args):
    out = fn(*args); _ = np.asarray(out).ravel()[:1]
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); out = fn(*args); _ = np.asarray(out).ravel()[:1]
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {min(ts)/G*1e6:7.1f} us/iter", file=sys.stderr)

def consume(planes):
    # max-tree over 16 planes (not matmul-able), returns (8, L)
    m = planes[0]
    for p in planes[1:16]:
        m = jnp.maximum(m, p)
    return m

@jax.jit
def var_a(table, idx):  # current: take axis0 (8,L) idx + transpose
    def body(i, carry):
        acc, idx = carry
        g = jnp.take(table, idx, axis=0)            # (8,L,64)
        gt = jnp.transpose(g, (2, 0, 1))            # (64,8,L)
        m = consume([gt[c] for c in range(64)])
        acc = acc + m
        idx = (lax.convert_element_type(m, jnp.int32) + idx + i) % U
        return acc, idx
    return lax.fori_loop(0, G, body, (jnp.zeros((8, L)), idx))[0]

@jax.jit
def var_b(tableT, idx):  # transposed table, gather along axis 1
    def body(i, carry):
        acc, idx = carry
        g = jnp.take(tableT, idx.reshape(-1), axis=1)   # (64, N)
        gt = g.reshape(64, 8, L)
        m = consume([gt[c] for c in range(64)])
        acc = acc + m
        idx = (lax.convert_element_type(m, jnp.int32) + idx + i) % U
        return acc, idx
    return lax.fori_loop(0, G, body, (jnp.zeros((8, L)), idx))[0]

@jax.jit
def var_c(table, idx):  # flat idx, (N,64) -> .T -> reshape
    def body(i, carry):
        acc, idx = carry
        g = jnp.take(table, idx.reshape(-1), axis=0)    # (N,64)
        gt = g.T.reshape(64, 8, L)
        m = consume([gt[c] for c in range(64)])
        acc = acc + m
        idx = (lax.convert_element_type(m, jnp.int32) + idx + i) % U
        return acc, idx
    return lax.fori_loop(0, G, body, (jnp.zeros((8, L)), idx))[0]

@jax.jit
def var_d(table, idx):  # no transpose: consume minor-dim slices
    def body(i, carry):
        acc, idx = carry
        g = jnp.take(table, idx, axis=0)                # (8,L,64)
        m = consume([g[:, :, c] for c in range(64)])
        acc = acc + m
        idx = (lax.convert_element_type(m, jnp.int32) + idx + i) % U
        return acc, idx
    return lax.fori_loop(0, G, body, (jnp.zeros((8, L)), idx))[0]

@jax.jit
def var_e(table, idx):  # gather only half the planes transposed (boxes only)
    def body(i, carry):
        acc, idx = carry
        g = jnp.take(table, idx, axis=0)                # (8,L,64)
        gt = jnp.transpose(g[:, :, :32], (2, 0, 1))     # (32,8,L)
        m = consume([gt[c] for c in range(32)])
        acc = acc + m
        idx = (lax.convert_element_type(m, jnp.int32) + idx + i) % U
        return acc, idx
    return lax.fori_loop(0, G, body, (jnp.zeros((8, L)), idx))[0]

timeit("a take0(8,L)+T ", var_a, table, idx0)
timeit("b takeT axis1  ", var_b, tableT, idx0)
timeit("c flat take0+T ", var_c, table, idx0)
timeit("d no-T minor   ", var_d, table, idx0)
timeit("e half-T       ", var_e, table, idx0)
