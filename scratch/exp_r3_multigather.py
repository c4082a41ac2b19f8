"""Do K INDEPENDENT row gathers in one loop iteration overlap?

hbmloc says the HBM row gather is per-index latency-bound (~25 ns/idx,
77 GB/s even for contiguous slices) — if the engine pipelines independent
gathers, K parallel 32k-gathers per iteration could approach Kx throughput,
and the traversal could run K independent sub-chunks per while-iteration
(same lockstep semantics per sub-chunk, K gathers visible to the scheduler).
"""
import time, sys
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

SUB, L = 8, 4096
ITERS = 64
rng = np.random.default_rng(0)


def timeit(name, fn, *args):
    f = jax.jit(fn)
    _ = np.asarray(f(*args))
    best = np.inf
    for r in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(f(*args))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    print(name + f": {best*1e6:.1f} us/iter", file=sys.stderr)
    return best


for U, tag in ((243_532, "HBM"), (1469, "VMEM")):
    table = jnp.asarray(rng.random((U, 64), dtype=np.float32))
    perm = jnp.asarray(rng.permutation(U).astype(np.int32))
    print(f"-- {tag} table ({U},64) = {U*64*4/1e6:.1f} MB", file=sys.stderr)
    for K in (1, 2, 4, 8):
        idxs = jnp.asarray(
            rng.integers(0, U, (K, SUB, L), dtype=np.int32))

        def run(idx, table=table, perm=perm, K=K):
            def b(i, s):
                accs, iis = s
                outs, nxts = [], []
                for k in range(K):
                    g = jnp.take(table, iis[k], axis=0)
                    gt = jnp.transpose(g, (2, 0, 1))
                    outs.append(accs[k] + gt[0] + gt[-1])
                    nxts.append(jnp.take(perm, iis[k], axis=0))
                return (tuple(outs), tuple(nxts))
            accs0 = tuple(jnp.zeros((SUB, L), jnp.float32) for _ in range(K))
            accs, _ = lax.fori_loop(
                0, ITERS, b, (accs0, tuple(idx[k] for k in range(K))))
            return accs[0][0, 0]
        t = timeit(f"{tag} K={K} ({K*SUB*L//1024}k idx total)", run, idxs)
        print(f"   -> {t*1e6/K:.1f} us per 32k-gather", file=sys.stderr)
