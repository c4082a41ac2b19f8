"""Round-3: decompose the traversal ITERATION cost (76 us/iter at 32k rays,
rule 11) into its pieces, by ablation at fixed iteration count.

Body pieces (shapes: state (D=16,8,L), rays (8,L), L=4096, arity 16,
leaf 14, W=140 table cols):
  pop   _pop_fresh drains=2: 3 one-hot masked sums over (D,8,L) x2 stacks
  gather unified row gather (8,L) -> (W,8,L) transpose
  expand 16 slab tests (bf16 decode, 6 mul/minmax per axis)
  sort  Batcher-16 over (key, entry, tn): 63 comparators x 7 wheres
  push  _push2: eac 16-way select accumulated over (D,8,L) x2
  leaf  14 unrolled Moller-Trumbore

Method: fori_loop(ITERS) over a synthetic but live state; each variant drops
one piece (replacing its output with a cheap stand-in of the same shape) so
XLA can't DCE the rest. Marginal cost = full - ablated. One scalar fetch.
"""
import time, sys
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

from fovpathtracing_optixcodelatest_tpu.ops import traverse8 as tv
from fovpathtracing_optixcodelatest_tpu.ops.bvh8 import EMPTY

D, SUB, L = 16, 8, 4096
ARITY, LEAF, U = 16, 14, 733
W = max(4 * ARITY, 10 * LEAF)
ITERS = 1024
rng = np.random.default_rng(0)

table = jnp.asarray(rng.random((U, W), dtype=np.float32))
o_r = [jnp.asarray(rng.random((SUB, L), dtype=np.float32)) for _ in range(3)]
d_r = [jnp.asarray(rng.random((SUB, L), dtype=np.float32) + 0.1)
       for _ in range(3)]
inv_r = [1.0 / c for c in d_r]


def body_fn(pieces):
    has_pop = "pop" in pieces
    has_gather = "gather" in pieces
    has_expand = "expand" in pieces
    has_sort = "sort" in pieces
    has_push = "push" in pieces
    has_leaf = "leaf" in pieces

    def body(i, s):
        stack, tn_stack, sp, t, best = s
        tlimit = t
        if has_pop:
            entry, tn_pop, sp, fresh = tv._pop_fresh(
                stack, tn_stack, sp, tlimit, drains=2
            )
        else:
            entry = (stack[0] + i) % U
            tn_pop = tn_stack[0]
            fresh = sp > 0
            sp = jnp.maximum(sp - 1, 0)
        is_node = fresh & (entry >= 0) & (entry < U // 2)
        is_leaf = fresh & (entry >= U // 2)
        if has_gather:
            gt = tv._gather_row(table, entry % U, jnp.zeros_like(is_leaf))
        else:
            base = table[0]  # one static row
            gt = [base[k] + entry.astype(jnp.float32) * 1e-8
                  for k in range(W)]
        if has_expand:
            hits, tns, entries = tv._expand(
                gt, is_node, o_r, inv_r, 1e-3, tlimit, ARITY
            )
        else:
            hits = [is_node & (lax.bitcast_convert_type(
                gt[3 * ARITY + c], jnp.int32) != EMPTY) for c in range(ARITY)]
            tns = [gt[c] for c in range(ARITY)]
            entries = [lax.bitcast_convert_type(gt[3 * ARITY + c], jnp.int32)
                       for c in range(ARITY)]
        if has_sort:
            keys = [jnp.where(h, tn, -jnp.inf) for h, tn in zip(hits, tns)]
            _, entries_c, tns_c = tv._sort_desc(keys, entries, tns)
        else:
            entries_c, tns_c = entries, tns
        cnt = hits[0].astype(jnp.int32)
        for h in hits[1:]:
            cnt = cnt + h.astype(jnp.int32)
        cnt = jnp.minimum(cnt, 3)  # keep sp bounded in the synthetic loop
        if has_push:
            stack, tn_stack, sp = tv._push2(
                stack, tn_stack, sp, entries_c, tns_c, cnt
            )
        else:
            stack = stack + entries_c[0][None] % 3
            tn_stack = tn_stack + tns_c[0][None] * 1e-9
            sp = jnp.minimum(sp + cnt, D)
        if has_leaf:
            leaf_out = tv._leaf_hits(
                gt, is_leaf, o_r, d_r, 1e-3, 1e16, False, LEAF
            )
            for k, (hit_k, t_k, u_k, v_k) in enumerate(leaf_out):
                better = hit_k & (t_k < t)
                t = jnp.where(better, t_k, t)
                best = jnp.where(better, k, best)
        else:
            t = t - gt[0] * 1e-9
        sp = jnp.maximum(sp, (i % 7 == 0).astype(jnp.int32))  # keep alive
        return (stack, tn_stack, sp, t, best)

    def run(seed):
        stack = (seed + jnp.asarray(
            rng.integers(0, U, (D, SUB, L), dtype=np.int32))) % U
        tn_stack = jnp.asarray(rng.random((D, SUB, L), dtype=np.float32))
        sp = jnp.asarray(rng.integers(1, 6, (SUB, L), dtype=np.int32))
        t = jnp.full((SUB, L), 1e16, jnp.float32)
        best = jnp.full((SUB, L), -1, jnp.int32)
        out = lax.fori_loop(0, ITERS, body, (stack, tn_stack, sp, t, best))
        return out[3].reshape(-1)[0] + out[4].reshape(-1)[1]

    return run


ALL = ("pop", "gather", "expand", "sort", "push", "leaf")


def timeit(name, pieces):
    f = jax.jit(body_fn(pieces))
    _ = np.asarray(f(jnp.zeros((), jnp.int32)))
    best = np.inf
    for r in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(f(jnp.asarray(r + 1, jnp.int32)))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    print(f"{name}: {best*1e6:.1f} us/iter", file=sys.stderr)
    return best


full = timeit("full", ALL)
for drop in ALL:
    dt = timeit(f"-{drop}", tuple(p for p in ALL if p != drop))
    print(f"  marginal {drop}: {(full-dt)*1e6:.1f} us", file=sys.stderr)
