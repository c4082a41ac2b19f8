"""Hero-wavelength spectral path tracing — thin wrapper over the unified
integrator.

The reference ships spectrum.h as dead code (never #included — SURVEY.md
§2.1); this framework renders it. Since round 3 the spectral machinery lives
INSIDE render/integrator.py as ``config.spectral`` — one parameterized bounce
body, so spectral paths get the same staged traversal, bounce compaction,
occlusion skipping, shadow-catcher handling and AOVs as the RGB path (they
used to be a ~200-line structural copy). This module keeps the round-2 API
for callers and tests.

Estimator (unchanged): every path tracks NUM_HERO wavelengths (one hero + 3
rotations, ops/spectrum.py:133-140), RGB BSDF/light values are lifted through
the Smits-style basis, dispersive refraction (Cauchy eta(lambda)) collapses
the non-hero wavelengths at the first dispersive transmission, and each
bounce's spectral contribution is CIE-integrated to linear sRGB (linearity
makes per-bounce conversion exact).
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax.numpy as jnp

from fovpathtracing_optixcodelatest_tpu.config import RenderConfig
from fovpathtracing_optixcodelatest_tpu.models.scene import Scene
from fovpathtracing_optixcodelatest_tpu.render.integrator import trace_paths


def trace_paths_spectral(
    scene: Scene,
    origin: jnp.ndarray,
    direction: jnp.ndarray,
    active: jnp.ndarray,
    key: jnp.ndarray,
    config: RenderConfig,
    ray_ids: jnp.ndarray | None = None,
    dispersion: float = 4200.0,
) -> Dict[str, jnp.ndarray]:
    """Trace N spectral paths to completion; returns dict with radiance
    (N, 3) linear sRGB (CIE-integrated over the hero wavelengths) and
    traces (). ``dispersion`` is the Cauchy B coefficient in nm^2 applied to
    transmissive materials (0 = achromatic refraction)."""
    cfg = dataclasses.replace(config, spectral=True, dispersion=dispersion)
    out = trace_paths(scene, origin, direction, active, key, cfg,
                      ray_ids=ray_ids)
    return {"radiance": out["radiance"], "traces": out["traces"]}
