"""Counter-based per-ray random streams.

The reference seeds a per-pixel xorshift with tea<4>(pixel, subframe)
(deviceProgram.cu:411, maths.h:170-227). The TPU equivalent is threefry keyed
by (frame key, global ray id, depth) via ``fold_in`` — stateless and
layout-independent, so a ray's random stream does not depend on which device
or batch slice processes it. That property is what makes the sample-sharded
multi-chip renderer bit-identical to the single-chip one.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ray_uniforms(key: jnp.ndarray, ray_ids: jnp.ndarray, num: int) -> jnp.ndarray:
    """(N,) int32 global ray ids → (N, num) uniforms in [0, 1)."""
    keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(ray_ids)
    return jax.vmap(lambda k: jax.random.uniform(k, (num,)))(keys)
