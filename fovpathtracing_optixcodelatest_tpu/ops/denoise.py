"""Edge-aware denoiser over the renderer's normal/albedo AOVs.

Capability twin of the reference's OptiX AI denoiser wrapper
(06HelloPathtracing/OptixDenoiser.cpp:15-230 — HDR model with optional albedo
and normal guide layers; stubbed out of the active PT_sv5_ build but its AOV
buffers are still allocated, SimplePathtracer.cpp:246-260). OptiX's denoiser
is a black-box NN; the TPU-native replacement is an à-trous wavelet
cross-bilateral filter (SVGF-style edge-stopping on color/normal/albedo) —
pure jnp stencil ops that XLA fuses, no model weights needed, works on any
backend. The separable 5-tap B3-spline kernel runs as shifted adds (cheap VPU
work; a Pallas stencil is a later optimization if this ever shows in
profiles).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# B3-spline 5-tap weights
_W = (1.0 / 16.0, 4.0 / 16.0, 6.0 / 16.0, 4.0 / 16.0, 1.0 / 16.0)


def _shift2(x, dy, dx):
    """Edge-clamped 2-D shift of (H, W, C)."""
    h, w = x.shape[:2]
    ys = jnp.clip(jnp.arange(h) + dy, 0, h - 1)
    xs = jnp.clip(jnp.arange(w) + dx, 0, w - 1)
    return x[ys][:, xs]


@functools.partial(jax.jit, static_argnames=("iterations",))
def atrous_denoise(
    color: jnp.ndarray,  # (H, W, 3) linear radiance
    normal: jnp.ndarray,  # (H, W, 3)
    albedo: jnp.ndarray,  # (H, W, 3)
    iterations: int = 3,
    sigma_color: float = 0.35,
    sigma_normal: float = 0.25,
    sigma_albedo: float = 0.15,
):
    """À-trous cross-bilateral filtering: per iteration i the 5×5 kernel taps
    dilate by 2^i; tap weights multiply edge-stopping terms from color,
    normal, and albedo differences. Returns the filtered (H, W, 3) image."""
    out = color
    for it in range(iterations):
        step = 1 << it
        acc = jnp.zeros_like(out)
        wsum = jnp.zeros(out.shape[:2] + (1,), dtype=out.dtype)
        for iy, wy in enumerate(_W):
            for ix, wx in enumerate(_W):
                dy = (iy - 2) * step
                dx = (ix - 2) * step
                c = _shift2(out, dy, dx)
                nrm = _shift2(normal, dy, dx)
                alb = _shift2(albedo, dy, dx)
                dc = jnp.sum((c - out) ** 2, axis=-1, keepdims=True)
                dn = jnp.sum((nrm - normal) ** 2, axis=-1, keepdims=True)
                da = jnp.sum((alb - albedo) ** 2, axis=-1, keepdims=True)
                w = (
                    (wy * wx)
                    * jnp.exp(-dc / (sigma_color**2))
                    * jnp.exp(-dn / (sigma_normal**2))
                    * jnp.exp(-da / (sigma_albedo**2))
                )
                acc = acc + w * c
                wsum = wsum + w
        out = acc / jnp.maximum(wsum, 1e-8)
    return out
