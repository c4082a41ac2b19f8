"""Cost of a lax.scan carrying many large 1-D/2-D arrays with trivial math."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp

N = 944784

def timeit(name, fn, *args):
    out = fn(*args); _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); out = fn(*args)
        _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
        ts.append(time.perf_counter()-t0)
    print(f"{name}: {min(ts)*1e3:7.1f} ms", file=sys.stderr)

def make(shape_fn, k=12):
    arrs = {f"a{i}": jnp.ones(shape_fn(), jnp.float32) for i in range(k)}
    @jax.jit
    def run(arrs):
        def body(c, i):
            c = {k2: v * 1.0001 + jnp.float32(i) * 1e-9 for k2, v in c.items()}
            return c, None
        c, _ = jax.lax.scan(body, arrs, jnp.arange(4))
        return c["a0"][:1]
    return run, arrs

run, arrs = make(lambda: (N,))
timeit("scan 12x f32(944784) 1-D", run, arrs)
run, arrs = make(lambda: (N, 3))
timeit("scan 12x f32(944784,3)", run, arrs)
run, arrs = make(lambda: (8, N // 8))
timeit("scan 12x f32(8,118098) 2-D", run, arrs)
