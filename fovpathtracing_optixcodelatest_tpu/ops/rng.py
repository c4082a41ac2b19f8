"""Counter-based per-ray random streams.

The reference seeds a per-pixel xorshift with tea<4>(pixel, subframe)
(deviceProgram.cu:411, maths.h:170-227). The TPU equivalent must be
- stateless and layout-independent (a ray's stream depends only on its global
  ray id), which is what makes the sample-sharded multi-chip renderer
  bit-identical to single-chip; and
- CHEAP: jax.random's threefry costs hundreds of ms per bounce at frame-sized
  batches on this hardware (measured), which dwarfed shading. The reference's
  own RNG is a 2-seed xorshift, so a counter hash of comparable quality is the
  parity-true choice: two rounds of the lowbias32 avalanche mix (Degski/
  Wellons-style integer finalizer) keyed by (jax key data, ray id, stream).

All math is elementwise uint32 on the ray vector — a handful of VPU ops per
uniform instead of a threefry tree.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_M1 = np.uint32(0x7FEB352D)
_M2 = np.uint32(0x846CA68B)
_INV24 = np.float32(1.0 / (1 << 24))


def _mix(x: jnp.ndarray) -> jnp.ndarray:
    """lowbias32 avalanche finalizer (uint32 → uint32)."""
    x = x ^ (x >> 16)
    x = x * _M1
    x = x ^ (x >> 15)
    x = x * _M2
    x = x ^ (x >> 16)
    return x


def _key_seeds(key: jnp.ndarray):
    try:
        data = jax.random.key_data(key)
    except Exception:  # already raw uint32 data
        data = key
    flat = data.reshape(-1).astype(jnp.uint32)
    return flat[-2], flat[-1]


def ray_uniform_cols(key: jnp.ndarray, ray_ids: jnp.ndarray, num: int):
    """(N,) int32 global ray ids → list of num (N,) uniform planes in [0, 1)
    (the column form ``ray_uniforms`` stacks — plane-wise consumers skip the
    stack/re-slice relayout)."""
    s0, s1 = _key_seeds(key)
    base = _mix(ray_ids.astype(jnp.uint32) ^ s0)
    base = _mix(base ^ s1)
    cols = []
    for j in range(num):
        stream = np.uint32((0x9E3779B9 * (j + 1)) & 0xFFFFFFFF)
        h = _mix(base + stream)
        # top 24 bits → [0, 1) float (keeps all mantissa bits exact)
        cols.append((h >> np.uint32(8)).astype(jnp.float32) * _INV24)
    return cols


def ray_uniforms(key: jnp.ndarray, ray_ids: jnp.ndarray, num: int) -> jnp.ndarray:
    """(N,) int32 global ray ids → (N, num) uniforms in [0, 1)."""
    return jnp.stack(ray_uniform_cols(key, ray_ids, num), axis=-1)
