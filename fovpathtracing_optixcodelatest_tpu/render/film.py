"""Film: accumulation canvas, foveated block reconstruction, compositing.

Twin of the framebuffer back half of the raygen program — the fillSize²
replication loop (deviceProgram.cu:546-616), progressive accumulation gated on
``subframe_index``/``redraw`` (:565-581, PT_original semantics), backplate
compositing (:558), and the frame buffers owned by SampleRenderer::resize
(SimplePathtracer.cpp:228-274).

TPU-first design: no scatters. The accumulation buffer is a *padded canvas*
(pad = the largest pass extent) so gaze-centered pass regions always land
inside it; a pass writes via dynamic_slice → masked merge →
dynamic_update_slice, and block reconstruction is ``jnp.repeat`` — the exact
nearest-neighbor fill of the reference, race-free by construction.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from jax import lax

from fovpathtracing_optixcodelatest_tpu.config import (
    FoveationPass,
    FoveationSchedule,
    RenderConfig,
)
from fovpathtracing_optixcodelatest_tpu.ops import tonemap
from fovpathtracing_optixcodelatest_tpu.render.raygen import pass_launch_dims


def schedule_padding(schedule: FoveationSchedule, width: int, height: int) -> int:
    """Static canvas padding: the largest pass extent in frame pixels, so any
    gaze inside the frame keeps every pass region on-canvas."""
    pad = 0
    for p in schedule.passes:
        lw, lh = pass_launch_dims(p, width, height)
        pad = max(pad, lw * p.factor, lh * p.factor, p.center_offset)
    return pad


def new_canvas(width: int, height: int, pad: int) -> jnp.ndarray:
    """Zeroed accumulation canvas (the accum_buffer, alloc'd in resize(),
    SimplePathtracer.cpp:243)."""
    return jnp.zeros((height + 2 * pad, width + 2 * pad, 3), dtype=jnp.float32)


def shade_to_accum_color(
    rad_sum: jnp.ndarray,  # (P, 3) Σ_samples radiance
    alpha_sum: jnp.ndarray,  # (P, 3) Σ_samples alpha
    backplate: jnp.ndarray,  # (P, 3) pixel-center probe radiance
    spp: int,
    launch: Tuple[int, int],
):
    """Per-pixel accumulation color from per-pixel sample sums.

    color = backplate·spp·(1-alpha_mean) + Σ radiance; accum = color/spp
    (deviceProgram.cu:558-563). Taking *sums* (not per-ray arrays) makes this
    the natural reduction point for sample-parallel sharding: devices psum
    their partial sums and every chip computes the identical image.
    """
    lw, lh = launch
    alpha_mean = alpha_sum / spp
    color = backplate * spp * (1.0 - alpha_mean) + rad_sum
    return (color / spp).reshape(lh, lw, 3)


def composite_pass(
    canvas: jnp.ndarray,
    accum_color: jnp.ndarray,  # (LH, LW, 3)
    ring: jnp.ndarray,  # (LH, LW) bool
    p: FoveationPass,
    offset: Tuple[jnp.ndarray, jnp.ndarray],
    subframe: jnp.ndarray,
    pad: int,
    accumulate: bool,
) -> jnp.ndarray:
    """Write one pass region into the canvas: fillSize-block replication +
    ring-masked merge + optional progressive lerp against the previous frame.

    The per-pixel lerp against each block pixel's own history matches the
    reference's fill loop, which reads accum_buffer[image_index] per filled
    pixel (deviceProgram.cu:565-581).
    """
    f = p.factor
    lh, lw = accum_color.shape[:2]
    ox, oy = offset
    start_y = pad + oy
    start_x = pad + ox

    new_rep = jnp.repeat(jnp.repeat(accum_color, f, axis=0), f, axis=1)
    ring_rep = jnp.repeat(jnp.repeat(ring, f, axis=0), f, axis=1)[..., None]

    prev = lax.dynamic_slice(
        canvas, (start_y, start_x, 0), (lh * f, lw * f, 3)
    )
    if accumulate and not p.redraw:
        a = 1.0 / (subframe.astype(jnp.float32) + 1.0)
        lerped = prev + (new_rep - prev) * a
        val = jnp.where(subframe > 0, lerped, new_rep)
    else:
        val = new_rep
    region = jnp.where(ring_rep, val, prev)
    return lax.dynamic_update_slice(canvas, region, (start_y, start_x, 0))


def finalize(canvas: jnp.ndarray, pad: int, config: RenderConfig) -> jnp.ndarray:
    """Crop the canvas and run the postprocess chain → (H, W, 3) uint8
    (exposure → Reinhard → sRGB, deviceProgram.cu:583-600)."""
    h = canvas.shape[0] - 2 * pad
    w = canvas.shape[1] - 2 * pad
    accum = lax.dynamic_slice(canvas, (pad, pad, 0), (h, w, 3))
    return tonemap.postprocess(
        accum,
        exposure_stops=config.exposure_stops,
        white=config.white,
        exposure_on=config.exposure_correction,
        tonemap_on=config.tone_mapping,
    )
