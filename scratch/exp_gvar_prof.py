import time, sys, os
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

N = 1 << 14; L = N // 8; G = 300; U = 3167
table = jnp.asarray(np.random.rand(U, 64).astype(np.float32))
idx0 = jnp.asarray(np.random.default_rng(0).integers(0, U, (8, L)).astype(np.int32))

@jax.jit
def var_a(table, idx):
    def body(i, carry):
        acc, idx = carry
        g = jnp.take(table, idx, axis=0)
        gt = jnp.transpose(g, (2, 0, 1))
        m = gt[0]
        for c in range(1, 16):
            m = jnp.maximum(m, gt[c])
        acc = acc + m
        idx = (lax.convert_element_type(m, jnp.int32) + idx + i) % U
        return acc, idx
    return lax.fori_loop(0, G, body, (jnp.zeros((8, L)), idx))[0]

out = var_a(table, idx0); _ = np.asarray(out).ravel()[:1]
os.system("rm -rf /tmp/fovprof2")
with jax.profiler.trace("/tmp/fovprof2"):
    out = var_a(table, idx0); _ = np.asarray(out).ravel()[:1]
