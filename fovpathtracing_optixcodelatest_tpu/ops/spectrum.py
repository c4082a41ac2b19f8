"""Spectral sampling: SampledSpectrum bins, CIE curves, RGB↔spectrum, sRGB.

Capability twin of the reference's (dead, never-included) spectral header
(PT_sv5_/spectrum.h: 81-bin 380-720nm SampledSpectrum, CIE X/Y/Z gaussians,
RGB↔spectrum tables, XYZ↔sRGB — SURVEY.md §2.1 [SKIP/stretch]). Rebuilt
compactly and vectorized:

- CIE 1931 color matching via Wyman-Sloan-Shirley multi-lobe gaussian fits
  (analytic, no 81-entry tables to ship);
- RGB→spectrum with a smooth Smits-style 7-basis reconstruction solved at
  import time (least squares against the CIE curves, so round-tripping
  RGB → spectrum → XYZ → RGB is tight);
- hero-wavelength sampling for spectral path tracing: one uniform sample
  spawns NUM_HERO rotated wavelengths integrated together.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

LAMBDA_MIN = 380.0
LAMBDA_MAX = 720.0
NUM_BINS = 81  # reference bin count (spectrum.h)
NUM_HERO = 4

_LAMBDAS = np.linspace(LAMBDA_MIN, LAMBDA_MAX, NUM_BINS)


def _g(x, mu, s1, s2):
    s = np.where(x < mu, s1, s2)
    return np.exp(-0.5 * ((x - mu) / s) ** 2)


def cie_xyz_bar(lam: np.ndarray):
    """Wyman et al. 2013 multi-lobe gaussian fits of the CIE 1931 2° CMFs."""
    lam = np.asarray(lam, dtype=np.float64)
    x = (
        1.056 * _g(lam, 599.8, 37.9, 31.0)
        + 0.362 * _g(lam, 442.0, 16.0, 26.7)
        - 0.065 * _g(lam, 501.1, 20.4, 26.2)
    )
    y = 0.821 * _g(lam, 568.8, 46.9, 40.5) + 0.286 * _g(lam, 530.9, 16.3, 31.1)
    z = 1.217 * _g(lam, 437.0, 11.8, 36.0) + 0.681 * _g(lam, 459.0, 26.0, 13.8)
    return x, y, z


def cie_xyz_bar_jnp(lam: jnp.ndarray):
    """Traced (jnp) version of cie_xyz_bar for use inside jit."""

    def g(x, mu, s1, s2):
        s = jnp.where(x < mu, s1, s2)
        return jnp.exp(-0.5 * ((x - mu) / s) ** 2)

    x = (
        1.056 * g(lam, 599.8, 37.9, 31.0)
        + 0.362 * g(lam, 442.0, 16.0, 26.7)
        - 0.065 * g(lam, 501.1, 20.4, 26.2)
    )
    y = 0.821 * g(lam, 568.8, 46.9, 40.5) + 0.286 * g(lam, 530.9, 16.3, 31.1)
    z = 1.217 * g(lam, 437.0, 11.8, 36.0) + 0.681 * g(lam, 459.0, 26.0, 13.8)
    return x, y, z


_XBAR, _YBAR, _ZBAR = cie_xyz_bar(_LAMBDAS)
_DL = (LAMBDA_MAX - LAMBDA_MIN) / (NUM_BINS - 1)
_Y_NORM = float(np.sum(_YBAR) * _DL)

XYZ_TO_SRGB = np.asarray(
    [
        [3.2404542, -1.5371385, -0.4985314],
        [-0.9692660, 1.8760108, 0.0415560],
        [0.0556434, -0.2040259, 1.0572252],
    ]
)
SRGB_TO_XYZ = np.linalg.inv(XYZ_TO_SRGB)


def _build_rgb_basis() -> np.ndarray:
    """Smooth 3-basis spectra for R, G, B solved so that each basis, viewed
    through the CMFs, reproduces its sRGB primary; smoothness from wide
    raised-cosine bumps."""
    centers = np.asarray([460.0, 550.0, 630.0])
    widths = np.asarray([70.0, 75.0, 80.0])
    bumps = np.stack(
        [
            np.clip(np.cos((_LAMBDAS - c) / w * np.pi / 2), 0.0, None) ** 2
            for c, w in zip(centers, widths)
        ]
    )  # (3 bumps, bins)
    # CMF response of each bump → 3x3 mixing matrix in XYZ, with the SAME
    # Y-normalization spectrum_to_xyz/-rgb apply, so round-trips are unit-scale
    resp = np.stack(
        [
            [
                np.sum(b * _XBAR) * _DL / _Y_NORM,
                np.sum(b * _YBAR) * _DL / _Y_NORM,
                np.sum(b * _ZBAR) * _DL / _Y_NORM,
            ]
            for b in bumps
        ]
    )  # (bump, xyz)
    # want: basis_c = Σ_b w[c,b] * bump_b with CMF response == primary c's XYZ
    targets = SRGB_TO_XYZ.T  # rows: XYZ of R, G, B primaries
    weights = targets @ np.linalg.inv(resp)  # (rgb, bump)
    basis = weights @ bumps  # (3, bins)
    return np.maximum(basis, 0.0)


RGB_BASIS = _build_rgb_basis()  # (3, NUM_BINS)


def rgb_to_spectrum(rgb: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) linear sRGB → (..., NUM_BINS) spectral power (non-negative)."""
    basis = jnp.asarray(RGB_BASIS, dtype=jnp.float32)
    return jnp.maximum(jnp.einsum("...c,cb->...b", rgb, basis), 0.0)


def spectrum_to_xyz(spec: jnp.ndarray) -> jnp.ndarray:
    """(..., NUM_BINS) → (..., 3) CIE XYZ (Y-normalized)."""
    cmf = jnp.asarray(np.stack([_XBAR, _YBAR, _ZBAR]), dtype=jnp.float32)
    return jnp.einsum("...b,cb->...c", spec, cmf) * (_DL / _Y_NORM)


def spectrum_to_rgb(spec: jnp.ndarray) -> jnp.ndarray:
    """(..., NUM_BINS) → linear sRGB."""
    cmf = jnp.asarray(np.stack([_XBAR, _YBAR, _ZBAR]), dtype=jnp.float32)
    xyz = jnp.einsum("...b,cb->...c", spec, cmf) * (_DL / _Y_NORM)
    m = jnp.asarray(XYZ_TO_SRGB, dtype=jnp.float32)
    return jnp.einsum("...c,rc->...r", xyz, m)


def sample_hero_wavelengths(u: jnp.ndarray) -> jnp.ndarray:
    """Hero-wavelength sampling: one uniform (N,) → (N, NUM_HERO) wavelengths
    rotated evenly across the visible range (pdf uniform)."""
    span = LAMBDA_MAX - LAMBDA_MIN
    hero = LAMBDA_MIN + u[..., None] * span
    offsets = jnp.arange(NUM_HERO, dtype=jnp.float32) * (span / NUM_HERO)
    lam = hero + offsets
    return jnp.where(lam > LAMBDA_MAX, lam - span, lam)


def eval_spectrum_at(spec: jnp.ndarray, lam: jnp.ndarray) -> jnp.ndarray:
    """Linear interpolation of (..., NUM_BINS) spectra at wavelengths
    (..., K) → (..., K)."""
    t = (lam - LAMBDA_MIN) / (LAMBDA_MAX - LAMBDA_MIN) * (NUM_BINS - 1)
    t = jnp.clip(t, 0.0, NUM_BINS - 1)
    i0 = jnp.minimum(t.astype(jnp.int32), NUM_BINS - 2)
    frac = t - i0
    s0 = jnp.take_along_axis(spec, i0, axis=-1)
    s1 = jnp.take_along_axis(spec, i0 + 1, axis=-1)
    return s0 * (1 - frac) + s1 * frac
