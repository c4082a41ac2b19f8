"""Layout experiment: (1,N) rows vs (8,N/8) tiles for chained elementwise ops,
one-hot stack pops, and gather+transpose."""
import time, sys
import numpy as np
import jax, jax.numpy as jnp
from functools import partial

N = 1 << 14  # 16384 lanes per chunk

def timeit(name, fn, *args, reps=1):
    out = fn(*args); jax.tree.map(lambda x: np.asarray(x) if hasattr(x,'shape') and x.size<100 else None, out)
    t0 = time.perf_counter()
    out = fn(*args)
    # fetch a scalar
    flat = jax.tree.leaves(out)
    _ = np.asarray(flat[0].reshape(-1)[:1])
    dt = time.perf_counter() - t0
    print(f"{name}: {dt*1e3:.2f} ms", file=sys.stderr)
    return dt

K = 400  # chained elementwise ops

@jax.jit
def chain_1N(x):
    for i in range(K):
        x = x * 1.0000001 + 0.0000001
    return jnp.sum(x)

@jax.jit
def chain_8L(x):
    for i in range(K):
        x = x * 1.0000001 + 0.0000001
    return jnp.sum(x)

x1 = jnp.ones((1, N))
x8 = jnp.ones((8, N // 8))
xbig = jnp.ones((8, N))  # 8 chunks batched in sublanes

timeit("chain (1,16384) x400", chain_1N, x1)
timeit("chain (1,16384) x400", chain_1N, x1)
timeit("chain (8,2048)  x400", chain_8L, x8)
timeit("chain (8,2048)  x400", chain_8L, x8)
timeit("chain (8,16384) x400 (8x work)", chain_1N, xbig)
timeit("chain (8,16384) x400 (8x work)", chain_1N, xbig)

# one-hot stack pop: (D, N) vs (D, 8, L)
D = 44
ITER = 50
@jax.jit
def pop_2d(stack, sp):
    acc = jnp.zeros_like(sp)
    for i in range(ITER):
        d_iota = jnp.arange(D, dtype=jnp.int32)[:, None]
        e = jnp.sum(jnp.where(d_iota == sp, stack, 0), axis=0, keepdims=True)
        acc = acc + e
        sp = (sp + 1) % D
    return jnp.sum(acc)

@jax.jit
def pop_3d(stack, sp):
    acc = jnp.zeros_like(sp)
    for i in range(ITER):
        d_iota = jnp.arange(D, dtype=jnp.int32)[:, None, None]
        e = jnp.sum(jnp.where(d_iota == sp[None], stack, 0), axis=0)
        acc = acc + e
        sp = (sp + 1) % D
    return jnp.sum(acc)

st2 = jnp.zeros((D, N), jnp.int32); sp2 = jnp.zeros((1, N), jnp.int32)
st3 = jnp.zeros((D, 8, N // 8), jnp.int32); sp3 = jnp.zeros((8, N // 8), jnp.int32)
timeit("pop (44,16384) x50", pop_2d, st2, sp2)
timeit("pop (44,16384) x50", pop_2d, st2, sp2)
timeit("pop (44,8,2048) x50", pop_3d, st3, sp3)
timeit("pop (44,8,2048) x50", pop_3d, st3, sp3)

# gather: (U,64) table by (1,N) idx -> (64,N) current scheme
U = 3167
table = jnp.asarray(np.random.rand(U, 64).astype(np.float32))
idx1 = jnp.asarray(np.random.randint(0, U, (1, N)).astype(np.int32))
idx8 = jnp.asarray(np.random.randint(0, U, (8, N // 8)).astype(np.int32))
G = 20

@jax.jit
def gather_cur(table, idx):
    acc = jnp.zeros(())
    for i in range(G):
        row = (idx + i) % U
        g = jnp.take(table, row, axis=0)  # (1,N,64)
        gt = g.reshape(N, 64).T  # (64, N)
        acc += jnp.sum(gt[0])
    return acc

@jax.jit
def gather_8l(table, idx):
    acc = jnp.zeros(())
    for i in range(G):
        row = (idx + i) % U
        g = jnp.take(table, row, axis=0)  # (8,L,64)
        gt = jnp.moveaxis(g, -1, 0)  # (64, 8, L)
        acc += jnp.sum(gt[0])
    return acc

timeit("gather+T (1,16384) x20", gather_cur, table, idx1)
timeit("gather+T (1,16384) x20", gather_cur, table, idx1)
timeit("gather+T (8,2048) x20", gather_8l, table, idx8)
timeit("gather+T (8,2048) x20", gather_8l, table, idx8)
