"""Dissect the lax.map per-chunk-step FIXED cost (~467 us at 32k lanes,
exp_r3_mapstep): is it xs operand slicing, ys DUS staging, while_loop entry,
or chunk-width data movement? Variants (idle body, sp=0):
  A. baseline: 5 xs operands (3x (C,3,8,L) + 2x (C,8,L)), 7 outputs
  B. xs packed into ONE (C,11,8,L) tensor, 7 outputs
  C. packed xs, ONE packed (11,8,L) output
  D. packed xs, 1 scalar output (isolates ys staging)
  E. no while_loop at all (body = one elementwise op) packed/1-out
  F. baseline shape at 2x/4x chunk width, same TOTAL lanes (C/2, C/4)
Run from /root/repo: python -c "exec(open('scratch/exp_r3_mapstep2.py').read())"
"""
import time, sys
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/fovtpu_tpu_cache")

SUB, U, W = 8, 733, 64
rng = np.random.default_rng(0)
table = jnp.asarray(rng.random((U, W), dtype=np.float32))


def timeit(name, fn):
    f = jax.jit(fn)
    _ = np.asarray(f())
    best = np.inf
    for r in range(4):
        t0 = time.perf_counter()
        _ = np.asarray(f())
        best = min(best, time.perf_counter() - t0)
    print(name, f"{best*1e3:7.2f} ms", file=sys.stderr)
    return best


def body_while(carry_planes, sp, iters):
    sp = sp + iters

    def cond(s):
        return jnp.any(s[1] > 0)

    def body(s):
        acc, sp2 = s
        entry = (lax.convert_element_type(acc, jnp.int32) + sp2) % U
        g = jnp.take(table, jnp.maximum(entry, 0), axis=0)
        gt = jnp.transpose(g, (2, 0, 1))
        return (acc + gt[0], sp2 - 1)

    out = lax.while_loop(cond, body, (carry_planes, sp))
    return out[0]


def make_A(C, L, iters=0, nouts=7):
    o = jnp.asarray(rng.random((C, 3, SUB, L), dtype=np.float32))
    d = jnp.asarray(rng.random((C, 3, SUB, L), dtype=np.float32))
    inv = jnp.asarray(rng.random((C, 3, SUB, L), dtype=np.float32))
    sp = jnp.zeros((C, SUB, L), jnp.int32)
    t = jnp.full((C, SUB, L), np.inf, jnp.float32)

    def step(args):
        o_i, d_i, inv_i, sp_i, t_i = args
        r = body_while(o_i[0], sp_i, iters)
        outs = (r, d_i[0], inv_i[0], t_i, r + 1, r + 2, r + 3)
        return outs[:nouts]

    def fn():
        ys = lax.map(step, (o, d, inv, sp, t))
        return ys[0].reshape(-1)[0] if isinstance(ys, tuple) else ys.reshape(-1)[0]

    return fn


def make_packed(C, L, iters=0, nouts=7, packed_out=False):
    xs = jnp.asarray(rng.random((C, 11, SUB, L), dtype=np.float32))

    def step(x):
        sp = jnp.zeros((SUB, L), jnp.int32)
        r = body_while(x[0], sp, iters)
        if packed_out:
            return jnp.stack([r] * 11, axis=0)
        if nouts == 1:
            return jnp.sum(r)
        return tuple(r + i for i in range(nouts))

    def fn():
        ys = lax.map(step, xs)
        y0 = ys[0] if isinstance(ys, tuple) else ys
        return y0.reshape(-1)[0]

    return fn


def make_nowhile(C, L):
    xs = jnp.asarray(rng.random((C, 11, SUB, L), dtype=np.float32))

    def step(x):
        return jnp.sum(x[0] * 2.0)

    def fn():
        return lax.map(step, xs).reshape(-1)[0]

    return fn


C, L = 59, 4096
print("== idle (sp=0) chunk-step cost, 59 chunks x 32k lanes", file=sys.stderr)
tA = timeit("A  5-operand xs, 7 outs      ", make_A(C, L))
tB = timeit("B  packed xs,    7 outs      ", make_packed(C, L))
tC = timeit("C  packed xs, packed out     ", make_packed(C, L, packed_out=True))
tD = timeit("D  packed xs, 1 scalar out   ", make_packed(C, L, nouts=1))
tE = timeit("E  no while, packed, 1 out   ", make_nowhile(C, L))
print("== width scaling, same total lanes (idle)", file=sys.stderr)
tF2 = timeit("F2 5-op xs 7outs, 2x width   ", make_A(C // 2, L * 2))
tF4 = timeit("F4 5-op xs 7outs, 4x width   ", make_A(C // 4 + 1, L * 4))
print("== busy (12 iters): does packing change the busy rate?", file=sys.stderr)
tA12 = timeit("A12 5-op xs 7outs, 12 iters  ", make_A(C, L, iters=12))
tB12 = timeit("B12 packed, 1 out, 12 iters  ", make_packed(C, L, iters=12, nouts=1))
tW12 = timeit("W12 5-op 4x width, 12 iters  ", make_A(C // 4 + 1, L * 4, iters=12))
for n, t in (("A", tA), ("B", tB), ("C", tC), ("D", tD), ("E", tE)):
    print(f"  {n}: {t/C*1e6:.0f} us/chunk-step", file=sys.stderr)
