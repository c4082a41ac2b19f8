"""Cost of compaction primitives at frame scale (N=1.92M) on TPU:
argsort(bool), argsort(i32), packed-row gather (N,32), 1D unique scatter,
cumsum. Honest timing: chained in one jit, one scalar fetch."""
import time, sys
import numpy as np
import jax, jax.numpy as jnp

N = 1 << 21
rng = np.random.default_rng(0)
alive = jnp.asarray(rng.random(N) < 0.4)
vals = jnp.asarray(rng.integers(0, N, N, dtype=np.int32))
carry = jnp.asarray(rng.random((N, 32), dtype=np.float32))
REPS = 8

def timeit(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args); _ = np.asarray(out)
    t0 = time.perf_counter(); out = f(*args); _ = np.asarray(out)
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name}: {dt*1e3:.2f} ms/op", file=sys.stderr)

def chain(op):
    def fn(a, v, c):
        acc = jnp.zeros((), jnp.int32)
        for i in range(REPS):
            r = op(a, v, c, acc)
            acc = acc + r.reshape(-1)[0].astype(jnp.int32) * 0
        return acc
    return fn

timeit("argsort bool", chain(lambda a, v, c, acc: jnp.argsort(~a ^ (acc > 0))), alive, vals, carry)
timeit("argsort i32", chain(lambda a, v, c, acc: jnp.argsort(v + acc)), alive, vals, carry)
timeit("cumsum i32", chain(lambda a, v, c, acc: jnp.cumsum((a ^ (acc > 0)).astype(jnp.int32))), alive, vals, carry)
timeit("row gather (N,32)", chain(lambda a, v, c, acc: jnp.take(c, v + acc, axis=0)), alive, vals, carry)
timeit("scatter 1d set", chain(lambda a, v, c, acc: jnp.zeros(N, jnp.int32).at[v + acc].set(jnp.arange(N, dtype=jnp.int32), unique_indices=True, mode="drop")), alive, vals, carry)

# the actual compaction pattern: cumsum-positions + scatter-build order + gather
def compact(a, v, c, acc):
    a = a ^ (acc > 0)
    cs = jnp.cumsum(a.astype(jnp.int32))
    A = cs[-1]
    i = jnp.arange(N, dtype=jnp.int32)
    pos = jnp.where(a, cs - 1, A + i - cs)
    order = jnp.zeros(N, jnp.int32).at[pos].set(i, unique_indices=True, mode="drop")
    return jnp.take(c, order, axis=0)
timeit("cumsum+scatter+gather compact (N,32)", chain(compact), alive, vals, carry)

def compact_sort(a, v, c, acc):
    a = a ^ (acc > 0)
    order = jnp.argsort(~a)
    return jnp.take(c, order, axis=0)
timeit("argsort+gather compact (N,32)", chain(compact_sort), alive, vals, carry)
