"""Post-processing chain: exposure → Reinhard → sRGB → uint8.

Behavior twins: exposure ``* 2^4`` (deviceProgram.cu:586), Reinhard with
Rec.709 luminance and white point (deviceProgram.cu:126-131,597), and the SDK's
``make_color`` sRGB quantizer (cuda/helpers.h:35-61). One fused jnp pipeline —
XLA fuses the whole chain into the producing kernel.
"""

from __future__ import annotations

import jax.numpy as jnp

from fovpathtracing_optixcodelatest_tpu.ops.sampling import luminance_rec709


def exposure_correct(color, stops: float = 4.0):
    """pprocessingExposureCorrected = accum_color * 2^stops (deviceProgram.cu:586)."""
    return color * (2.0 ** stops)


def reinhard(color, white: float = 1.0):
    """c / (1 + lum(c)/white) with Rec.709 luminance (deviceProgram.cu:126-131)."""
    lum = luminance_rec709(color)
    return color / (1.0 + lum / white)[..., None]


def to_srgb(c):
    """Linear→sRGB EOTF with the 0.0031308 toe (cuda/helpers.h toSRGB)."""
    c = jnp.clip(c, 0.0, 1.0)
    powed = jnp.power(jnp.maximum(c, 1e-10), 1.0 / 2.4)
    return jnp.where(c < 0.0031308, 12.92 * c, 1.055 * powed - 0.055)


def quantize_u8(x):
    """min(uint(x*256), 255) quantizer (cuda/helpers.h quantizeUnsigned8Bits)."""
    x = jnp.clip(x, 0.0, 1.0)
    return jnp.minimum((x * 256.0).astype(jnp.uint32), 255).astype(jnp.uint8)


def make_color(c):
    """float3 linear → uint8 RGB via clamp + sRGB (cuda/helpers.h make_color)."""
    return quantize_u8(to_srgb(jnp.clip(c, 0.0, 1.0)))


def postprocess(
    accum_color,
    exposure_stops: float = 4.0,
    white: float = 1.0,
    exposure_on: bool = True,
    tonemap_on: bool = True,
):
    """The full raygen postprocessing chain (deviceProgram.cu:583-600):
    exposure (EXPOSURE_CORR_ON) → Reinhard (TONE_MAPPING__ENABLE) → make_color."""
    c = exposure_correct(accum_color, exposure_stops) if exposure_on else accum_color
    c = reinhard(c, white) if tonemap_on else c
    return make_color(c)
