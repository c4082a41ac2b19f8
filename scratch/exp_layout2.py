import time, sys
import numpy as np
import jax, jax.numpy as jnp

N = 1 << 14

def timeit(name, fn, *args):
    out = fn(*args); _ = np.asarray(jax.tree.leaves(out)[0].reshape(-1)[:1])
    ts = []
    for _i in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = np.asarray(jax.tree.leaves(out)[0].reshape(-1)[:1])
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {min(ts)*1e3:.2f} ms", file=sys.stderr)

def make_chain(K):
    @jax.jit
    def chain(x):
        for i in range(K):
            x = x * 1.0000001 + 0.0000001
        return jnp.sum(x)
    return chain

c400, c6400 = make_chain(400), make_chain(6400)
x1 = jnp.ones((1, N)); x8 = jnp.ones((8, N // 8)); xb = jnp.ones((8, N))
for name, x in [("(1,16384)", x1), ("(8,2048)", x8), ("(8,16384)", xb)]:
    timeit(f"chain400 {name}", c400, x)
    timeit(f"chain6400 {name}", c6400, x)
# slope = (t6400 - t400) / 6000 ops

D = 44
def make_pop(ITER, three_d):
    @jax.jit
    def pop(stack, sp):
        acc = jnp.zeros_like(sp)
        for i in range(ITER):
            if three_d:
                d_iota = jnp.arange(D, dtype=jnp.int32)[:, None, None]
                e = jnp.sum(jnp.where(d_iota == sp[None], stack, 0), axis=0)
            else:
                d_iota = jnp.arange(D, dtype=jnp.int32)[:, None]
                e = jnp.sum(jnp.where(d_iota == sp, stack, 0), axis=0, keepdims=True)
            acc = acc + e
            sp = (sp + 1) % D
        return jnp.sum(acc)
    return pop

st2 = jnp.zeros((D, N), jnp.int32); sp2 = jnp.zeros((1, N), jnp.int32)
st3 = jnp.zeros((D, 8, N // 8), jnp.int32); sp3 = jnp.zeros((8, N // 8), jnp.int32)
timeit("pop2d x50", make_pop(50, False), st2, sp2)
timeit("pop2d x800", make_pop(800, False), st2, sp2)
timeit("pop3d x50", make_pop(50, True), st3, sp3)
timeit("pop3d x800", make_pop(800, True), st3, sp3)

U = 3167
table = jnp.asarray(np.random.rand(U, 64).astype(np.float32))
idx1 = jnp.asarray(np.random.randint(0, U, (1, N)).astype(np.int32))
idx8 = jnp.asarray(np.random.randint(0, U, (8, N // 8)).astype(np.int32))

def make_gather(G, mode):
    @jax.jit
    def gather(table, idx):
        acc = jnp.zeros(())
        for i in range(G):
            row = (idx * (i + 1)) % U
            if mode == "cur":
                g = jnp.take(table, row, axis=0)
                gt = g.reshape(N, 64).T
            elif mode == "8l":
                g = jnp.take(table, row, axis=0)  # (8,L,64)
                gt = jnp.moveaxis(g, -1, 0)
            elif mode == "8l_noT":
                g = jnp.take(table, row, axis=0)  # (8,L,64)
                gt = g  # consume without transpose
            acc += jnp.sum(gt) * 1e-9
        return acc
    return gather

for mode, idx in [("cur", idx1), ("8l", idx8), ("8l_noT", idx8)]:
    timeit(f"gather {mode} x20", make_gather(20, mode), table, idx)
    timeit(f"gather {mode} x320", make_gather(320, mode), table, idx)
