"""How to permute a (N,25) matrix built from column pieces, fast, in-graph.
The naive concat->take gets a column-major layout (~88ms at N=1.92M).
Variants measured end-to-end: build-from-columns -> permute -> consume columns.
"""
import time, sys
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

N = 1923984
C = 25
rng = np.random.default_rng(0)
cols_np = [rng.random(N, dtype=np.float32) for _ in range(C)]
cols_dev = jax.device_put(cols_np)
order_np = rng.permutation(N).astype(np.int32)
order_dev = jax.device_put(order_np)
REPS = 4

def consume(mat):
    # column-slice consumption like the integrator
    return mat[:, 0] + mat[:, 3] * mat[:, 9] + mat[:, 24]

def run(name, body):
    @jax.jit
    def fn(cols, order):
        acc = jnp.zeros((), jnp.float32)
        for i in range(REPS):
            cols2 = [c + acc for c in cols]
            r = body(cols2, order)
            acc = acc + r[0] * 0.0
        return acc
    out = fn(cols_dev, order_dev); _ = np.asarray(out)
    t0 = time.perf_counter(); out = fn(cols_dev, order_dev); _ = np.asarray(out)
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name}: {dt*1e3:.2f} ms", file=sys.stderr)

def v_concat(cols, order):
    mat = jnp.concatenate([c[:, None] for c in cols], axis=1)
    return consume(jnp.take(mat, order, axis=0))

def v_reshape_barrier(cols, order):
    mat = jnp.concatenate([c[:, None] for c in cols], axis=1)
    flat = lax.optimization_barrier(mat.reshape(-1))
    mat2 = flat.reshape(N, C)
    return consume(jnp.take(mat2, order, axis=0))

def v_stack_T(cols, order):
    matT = jnp.stack(cols, axis=0)  # (C, N)
    return consume(jnp.take(matT.T, order, axis=0))

def v_takeT(cols, order):
    matT = jnp.stack(cols, axis=0)  # (C, N)
    out = jnp.take(matT, order, axis=1)  # permute lanes
    return consume(out.T)

def v_percol(cols, order):
    outs = [jnp.take(c, order) for c in cols]
    return consume(jnp.stack(outs, axis=1))

def v_sort26(cols, order):
    # order is a permutation; emulate compaction sort: key = order (i32)
    ops = lax.sort([order] + list(cols), num_keys=1)
    return consume(jnp.stack(ops[1:], axis=1))

def v_pad32(cols, order):
    mat = jnp.concatenate([c[:, None] for c in cols] + [jnp.zeros((N, 32 - C), jnp.float32)], axis=1)
    return consume(jnp.take(mat, order, axis=0))

#run("concat->take(axis0)", v_concat)
#run("reshape+barrier->take", v_reshape_barrier)
#run("stack->T->take", v_stack_T)
#run("stack->take(axis1)->T", v_takeT)
#run("per-column 1d takes", v_percol)
#run("lax.sort 26 operands", v_sort26)
#run("pad to 32 cols ->take", v_pad32)

def v_sort26_stable(cols, order):
    ops = lax.sort([order] + list(cols), num_keys=1, is_stable=True)
    return consume(jnp.stack(ops[1:], axis=1))

def v_sort_bool_stable(cols, order):
    key = (order & 1) == 0  # bool key
    ops = lax.sort([key] + list(cols), num_keys=1, is_stable=True)
    return consume(jnp.stack(ops[1:], axis=1))

def v_sort7_occl(cols, order):
    key = (order & 1) == 0
    iota = jnp.arange(N, dtype=jnp.int32)
    ops = lax.sort([key, iota] + list(cols[:6]), num_keys=1, is_stable=False)
    occ_s = ops[2] > 0.5  # pretend occlusion result
    occ = jnp.zeros((N,), bool).at[ops[1]].set(occ_s, unique_indices=True)
    return consume(jnp.stack([occ.astype(jnp.float32)] * C, axis=1))

def v_sort7_occl_resort(cols, order):
    key = (order & 1) == 0
    iota = jnp.arange(N, dtype=jnp.int32)
    ops = lax.sort([key, iota] + list(cols[:6]), num_keys=1, is_stable=False)
    occ_s = ops[2] > 0.5
    back = lax.sort([ops[1], occ_s], num_keys=1)
    return consume(jnp.stack([back[1].astype(jnp.float32)] * C, axis=1))

run("lax.sort 26 stable (i32 key)", v_sort26_stable)
run("lax.sort 26 stable (bool key)", v_sort_bool_stable)
run("occl pattern: sort8 + scatter-back", v_sort7_occl)
run("occl pattern: sort8 + sort-back", v_sort7_occl_resort)
