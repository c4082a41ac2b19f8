"""Texture storage + bilinear-wrap sampling.

The reference binds one ``cudaTextureObject_t`` per diffuse texture with wrap
addressing + linear filtering (OptixUtils/CUDATexture.h:5-49,
SimplePathtracer.cpp:748-799) and fetches with ``tex2D`` in the closest-hit
program (deviceProgram.cu:655-670). The TPU equivalent is a padded texture
*array* — all textures in one (K, H, W, 3) tensor with per-texture true sizes —
sampled by manual 4-tap gather + lerp, so one vectorized sampler serves the
whole ray batch regardless of which texture each ray hit.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


import os

# Pre-duplicated 2x2 quad rows cost 4x the texel memory; past this many
# padded texels (~192 MB of quad rows at 4M) fall back to the 4-tap path.
QUAD_MAX_TEXELS = int(os.environ.get("FOVTPU_TEXQUAD_MAX", 1 << 22))


@dataclasses.dataclass(frozen=True)
class TextureArray:
    """K textures padded to a common (H, W); sizes carries true dims.

    ``quad`` (built by default, size-capped): row (k*H + y)*W + x packs the
    2x2 wrap-addressed bilinear footprint [c00, c10, c01, c11] as 12 f32
    columns, so a batch bilinear fetch is ONE row gather instead of four
    element-rate 1-D gathers (row gathers are width-flat on TPU — the same
    pack-lookups-into-rows rule as tri_pack/probe.sample_rows; the 4-tap
    path measured ~36 ms/bounce at 1.5M lanes, ~26% of the textured
    frame)."""

    data: jnp.ndarray  # (K, H, W, 3) float32, linear [0,1]
    sizes: jnp.ndarray  # (K, 2) int32 — (width, height) per texture
    quad: jnp.ndarray | None = None  # (K*H*W, 12) f32, see above

    @property
    def num_textures(self) -> int:
        return self.data.shape[0]


jax.tree_util.register_dataclass(
    TextureArray, data_fields=["data", "sizes", "quad"], meta_fields=[]
)


def build_texture_array(images: Sequence[np.ndarray]) -> TextureArray:
    """Pack a list of (h, w, 3) float32 images into a padded TextureArray.
    With no textures, a 1×1 magenta dummy keeps shapes static (the reference's
    commented sanity color, deviceProgram.cu:666-669)."""
    if not images:
        images = [np.full((1, 1, 3), [1.0, 0.0, 1.0], dtype=np.float32)]
    max_h = max(im.shape[0] for im in images)
    max_w = max(im.shape[1] for im in images)
    k = len(images)
    data = np.zeros((k, max_h, max_w, 3), dtype=np.float32)
    sizes = np.zeros((k, 2), dtype=np.int32)
    for i, im in enumerate(images):
        h, w = im.shape[:2]
        data[i, :h, :w, :] = im[..., :3]
        sizes[i] = (w, h)
    quad = None
    if k * max_h * max_w <= QUAD_MAX_TEXELS:
        quad = np.zeros((k, max_h, max_w, 12), dtype=np.float32)
        for i, im in enumerate(images):
            h, w = im.shape[:2]
            t = im[..., :3].astype(np.float32)
            xr = np.roll(t, -1, axis=1)  # (y, (x+1) % w)
            yr = np.roll(t, -1, axis=0)
            xyr = np.roll(xr, -1, axis=0)
            quad[i, :h, :w, 0:3] = t
            quad[i, :h, :w, 3:6] = xr
            quad[i, :h, :w, 6:9] = yr
            quad[i, :h, :w, 9:12] = xyr
        quad = jnp.asarray(quad.reshape(-1, 12))
    return TextureArray(
        data=jnp.asarray(data), sizes=jnp.asarray(sizes), quad=quad
    )


def sample_bilinear_wrap(tex: TextureArray, tex_ids: jnp.ndarray, uv: jnp.ndarray):
    """Bilinear sample with wrap addressing, batch-vectorized.

    Follows CUDA's normalized-coordinate linear filtering: sample point at
    (u*w - 0.5, v*h - 0.5), wrap via floor-mod. tex_ids < 0 return magenta-free
    zeros (callers mask with has-texture anyway).
    """
    ids = jnp.clip(tex_ids, 0, tex.num_textures - 1)
    wh = jnp.take(tex.sizes, ids, axis=0)  # (N, 2)
    w = wh[:, 0].astype(jnp.float32)
    h = wh[:, 1].astype(jnp.float32)
    x = uv[..., 0] * w - 0.5
    y = uv[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]

    def wrap(i, n):
        return jnp.mod(i, n).astype(jnp.int32)

    wi = wh[:, 0]
    hi = wh[:, 1]
    x0i = wrap(x0.astype(jnp.int32), wi)
    x1i = wrap(x0.astype(jnp.int32) + 1, wi)
    y0i = wrap(y0.astype(jnp.int32), hi)
    y1i = wrap(y0.astype(jnp.int32) + 1, hi)

    kh = tex.data.shape[1]
    kw = tex.data.shape[2]

    if tex.quad is not None:
        # ONE width-flat row gather: the quad row at (y0, x0) already holds
        # all four wrap-addressed taps (same texel values as the 4-tap path
        # below — identical lerp inputs, identical result bits)
        lin = (ids * kh + y0i) * kw + x0i
        q = jnp.take(tex.quad, lin, axis=0)  # (N, 12)
        c00, c10 = q[:, 0:3], q[:, 3:6]
        c01, c11 = q[:, 6:9], q[:, 9:12]
    else:
        flat = tex.data.reshape(-1, 3)

        def fetch(yy, xx):
            lin = (ids * kh + yy) * kw + xx
            return jnp.take(flat, lin, axis=0)

        c00 = fetch(y0i, x0i)
        c10 = fetch(y0i, x1i)
        c01 = fetch(y1i, x0i)
        c11 = fetch(y1i, x1i)
    top = c00 * (1 - fx) + c10 * fx
    bot = c01 * (1 - fx) + c11 * fx
    return top * (1 - fy) + bot * fy


def checkerboard(size: int = 64, squares: int = 8,
                 c0=(0.8, 0.8, 0.8), c1=(0.1, 0.1, 0.4)) -> np.ndarray:
    """Procedural test texture (stand-in for the OBJ scenes' diffuse maps)."""
    yy, xx = np.mgrid[0:size, 0:size]
    mask = ((xx * squares // size) + (yy * squares // size)) % 2
    img = np.where(mask[..., None] == 0, np.asarray(c0), np.asarray(c1))
    return img.astype(np.float32)
