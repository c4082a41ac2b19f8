"""Round-3 primitive costs at frame scale (N=1.92M) on the v5e:
- 1-D vs 2-D-tiled gather from a small table (the tri_id epilogue pathology)
- (C,8,L) <-> (N,) relayout reshape cost
- lax.sort with 2 / 7 / 11 operands
- partition via cumsum+scatter vs sort
Chain REPS in one jit; one scalar fetch (axon timing rules).
"""
import time, sys
import numpy as np
import jax, jax.numpy as jnp

N = 1_923_984
C, SUB, L = 59, 8, 4096
NP = C * SUB * L
rng = np.random.default_rng(0)
small = jnp.asarray(rng.integers(-1, 10000, 10262, dtype=np.int32))
idx1 = jnp.asarray(rng.integers(0, 10262, NP, dtype=np.int32))
idx2 = idx1.reshape(C, SUB, L)
key_i = jnp.asarray(rng.integers(0, 1 << 30, N, dtype=np.int32))
fcols = [jnp.asarray(rng.random(N, dtype=np.float32)) for _ in range(10)]
big2d = jnp.asarray(rng.random((C, SUB, L), dtype=np.float32))
REPS = 8

def timeit(name, fn, *args):
    f = jax.jit(fn)
    _ = np.asarray(f(*args))
    t0 = time.perf_counter(); out = f(*args); _ = np.asarray(out)
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name}: {dt*1e3:.2f} ms", file=sys.stderr)

def chain(op):
    def fn(*args):
        acc = jnp.zeros((), jnp.float32)
        for i in range(REPS):
            r = op(*args, acc)
            acc = acc + r.reshape(-1)[0].astype(jnp.float32) * 1e-9
        return acc
    return fn

timeit("gather1d small->1.9M", chain(
    lambda idx, acc: jnp.take(small, (idx + acc.astype(jnp.int32)) % 10262)), idx1)
timeit("gather2d small->(59,8,4096)", chain(
    lambda idx, acc: jnp.take(small, (idx + acc.astype(jnp.int32)) % 10262)), idx2)
timeit("relayout (C,8,L)->flat", chain(
    lambda x, acc: (x + acc).reshape(-1)), big2d)
timeit("relayout flat->(C,8,L)", chain(
    lambda x, acc: (x + acc).reshape(C, SUB, L)),
    jnp.pad(fcols[0], (0, NP - N)))

def sort_n(k):
    def op(acc):
        ops = [key_i + acc.astype(jnp.int32)] + [f for f in fcols[: k - 1]]
        return jax.lax.sort(ops, num_keys=1)[1]
    return op
timeit("sort 2 ops", chain(sort_n(2)))
timeit("sort 7 ops", chain(sort_n(7)))
timeit("sort 11 ops", chain(sort_n(11)))

# partition: key -> positions via cumsum, scatter iota, then 7x 1-D gathers
def part(acc):
    k = key_i + acc.astype(jnp.int32)
    a = k < (1 << 29)
    cs = jnp.cumsum(a.astype(jnp.int32))
    tot = cs[-1]
    i = jnp.arange(N, dtype=jnp.int32)
    pos = jnp.where(a, cs - 1, tot + i - cs)
    order = jnp.zeros(N, jnp.int32).at[pos].set(i, unique_indices=True,
                                               mode="drop")
    out = [jnp.take(f, order) for f in fcols[:6]]
    return out[0]
timeit("partition cumsum+scatter+6 gathers", chain(part))

# 1-D big-to-big gather (payload permute) alone
perm = jnp.asarray(rng.permutation(N).astype(np.int32))
timeit("1 big 1-D gather (permute 1.9M f32)", chain(
    lambda p, acc: jnp.take(fcols[0], (p + acc.astype(jnp.int32)) % N)), perm)
