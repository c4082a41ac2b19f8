"""Round-3 glue levers, measured in isolation at frame-like sizes.

1. lax.sort cost vs operand count at N=1.48M (the per-bounce compaction
   sorts carry 5-11 operands today; if cost scales per-operand, a 2-op
   (key, iota) sort + gather-apply wins).
2. permutation APPLY cost at N=1.48M: separate 1-D takes vs one packed
   (N, 8) row take vs scatter-set (inverse perm build).
3. traversal row gather: (U,64) take+transpose (today: ~50+18 us/iter)
   vs transposed-table take((64,U), idx, axis=1) direct to (64,8,L).
"""
import time, sys
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/fovtpu_tpu_cache")

N = 1_476_608
rng = np.random.default_rng(0)


def timeit(name, fn, *args, reps=4):
    f = jax.jit(fn)
    _ = np.asarray(f(*args))
    best = np.inf
    for _r in range(reps):
        t0 = time.perf_counter()
        _ = np.asarray(f(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best*1e3:7.2f} ms", file=sys.stderr)
    return best


key_i = jnp.asarray(rng.integers(0, 2**30, N, dtype=np.int32))
cols = [jnp.asarray(rng.random(N, dtype=np.float32)) for _ in range(10)]
perm = jnp.asarray(rng.permutation(N).astype(np.int32))
packed8 = jnp.stack(cols[:8], axis=1)  # (N, 8)

print(f"== lax.sort at N={N}", file=sys.stderr)
for k in (2, 3, 5, 8, 11):
    ops = [key_i] + cols[: k - 1]
    timeit(f"sort {k:2d} ops", lambda *a: sum(o.sum() for o in lax.sort(list(a), num_keys=1)[1:]), *ops)

print("== permutation apply at N", file=sys.stderr)
timeit("6x 1-D take     ", lambda p, *cs: sum(jnp.take(c, p).sum() for c in cs),
       perm, *cols[:6])
timeit("1x 1-D take     ", lambda p, c: jnp.take(c, p).sum(), perm, cols[0])
timeit("(N,8) row take  ", lambda p, m: jnp.take(m, p, axis=0).sum(),
       perm, packed8)
timeit("scatter set invp", lambda p: jnp.zeros(N, jnp.int32).at[p].set(
    jnp.arange(N, dtype=jnp.int32), unique_indices=True).sum(), perm)

print("== traversal row gather, 32k idx, (1469,64) table", file=sys.stderr)
U, W, SUB, L = 1469, 64, 8, 4096
table = jnp.asarray(rng.random((U, W), dtype=np.float32))
table_t = jnp.asarray(np.ascontiguousarray(np.asarray(table).T))  # (64, U)
idx = jnp.asarray(rng.integers(0, U, (SUB, L), dtype=np.int32))


def loop_gather_mk(transposed):
  def loop_gather(tab, idx0, iters=64):
     def body(i, acc):
         e = (idx0 + i) % U
         if transposed:
             gt = jnp.take(tab, e, axis=1)  # (64, 8, L)
         else:
             g = jnp.take(tab, e, axis=0)  # (8, L, 64)
             gt = jnp.transpose(g, (2, 0, 1))
         return acc + gt[0] + gt[63]

     return lax.fori_loop(0, iters, body,
                          jnp.zeros((SUB, L), jnp.float32))[0, 0]
  return loop_gather


t_std = timeit("take+transpose x64 ", loop_gather_mk(False), table, idx)
t_tr = timeit("transposed take x64", loop_gather_mk(True), table_t, idx)
print(f"  per-iter: std {t_std/64*1e6:.1f} us, transposed {t_tr/64*1e6:.1f} us",
      file=sys.stderr)
