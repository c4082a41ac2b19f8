"""Device-side environment-probe evaluation, pdf, and CDF-inversion sampling.

Behavior twins (Probe.cuh):
- ``dir_to_uv`` / ``uv_to_dir`` — lat-long mapping (:38-58), exact round-trip.
- ``probe_eval``                — nearest-texel fetch with clamp (:61-67).
- ``probe_pdf``                 — 2-level pdf with the sin(theta) Jacobian (:69-93).
- ``probe_sample``              — row then column CDF inversion (:138-169). The
  device binary search ``LowerBound`` (:119-136) becomes ``searchsorted`` for the
  row marginal and a batched branchless binary search over the flattened
  row-conditional CDF (a vmapped searchsorted would gather whole (N, W) rows;
  log2(W) scalarless gather steps keep it O(N log W) memory-free).

All functions take the full ray batch; nothing is per-ray scalar code.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from fovpathtracing_optixcodelatest_tpu.models.probe import ProbeParams
from fovpathtracing_optixcodelatest_tpu.ops.sampling import PI, TWO_PI


def dir_to_uv(d: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) unit dirs → (..., 2) lat-long uv (Probe.cuh ProbeDirToUV)."""
    theta = jnp.arccos(jnp.clip(d[..., 1], -1.0, 1.0))
    phi = jnp.where(
        (d[..., 0] == 0.0) & (d[..., 2] == 0.0),
        0.0,
        jnp.arctan2(d[..., 2], d[..., 0]),
    )
    u = (PI + phi) / TWO_PI
    v = theta / PI
    return jnp.stack([u, v], axis=-1)


def uv_to_dir(uv: jnp.ndarray) -> jnp.ndarray:
    """(..., 2) uv → (..., 3) unit dirs (Probe.cuh ProbeUVToDir)."""
    theta = uv[..., 1] * PI
    phi = uv[..., 0] * TWO_PI
    sin_t = jnp.sin(theta)
    return jnp.stack(
        [-sin_t * jnp.cos(phi), jnp.cos(theta), -sin_t * jnp.sin(phi)], axis=-1
    )


def probe_eval(probe: ProbeParams, uv: jnp.ndarray) -> jnp.ndarray:
    """Nearest-texel radiance fetch with clamped indices (Probe.cuh ProbeEval)."""
    w, h = probe.width, probe.height
    px = jnp.clip((uv[..., 0] * w).astype(jnp.int32), 0, w - 1)
    py = jnp.clip((uv[..., 1] * h).astype(jnp.int32), 0, h - 1)
    flat = probe.data.reshape(-1, 3)
    return jnp.take(flat, py * w + px, axis=0)


def probe_pdf(probe: ProbeParams, d: jnp.ndarray) -> jnp.ndarray:
    """Solid-angle pdf of sampling direction d (Probe.cuh ProbePdf)."""
    w, h = probe.width, probe.height
    uv = dir_to_uv(d)
    col = jnp.clip((uv[..., 0] * w).astype(jnp.int32), 0, w - 1)
    row = jnp.clip((uv[..., 1] * h).astype(jnp.int32), 0, h - 1)
    pdf = jnp.take(probe.pdf_x.reshape(-1), row * w + col, axis=0) * jnp.take(
        probe.pdf_y, row, axis=0
    )
    sin_theta = jnp.sin(uv[..., 1] * PI)
    jac = w * h / (2.0 * PI * PI * jnp.where(jnp.abs(sin_theta) < 1e-4, 1.0, sin_theta))
    return jnp.where(jnp.abs(sin_theta) < 1e-4, 0.0, pdf * jac)


def _lower_bound_rows(
    cdf_flat: jnp.ndarray, row: jnp.ndarray, width: int, values: jnp.ndarray
) -> jnp.ndarray:
    """Batched lower_bound over per-ray rows of a flattened (H*W,) CDF.

    Returns col in [0, width] such that cdf[row, col] is the first entry >=
    value (LowerBound semantics, Probe.cuh:119-136). Branchless binary search:
    ceil(log2(width)) gather steps for the whole batch.
    """
    base = row.astype(jnp.int32) * width
    lo = jnp.zeros_like(row, dtype=jnp.int32)
    hi = jnp.full_like(lo, width)
    steps = max(1, math.ceil(math.log2(width)) if width > 1 else 1)

    def body(_, carry):
        lo, hi = carry
        mid = lo + (hi - lo) // 2
        v = jnp.take(cdf_flat, base + jnp.minimum(mid, width - 1), axis=0)
        go_right = v < values
        lo = jnp.where(go_right & (lo < hi), mid + 1, lo)
        hi = jnp.where(~go_right & (lo < hi), mid, hi)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, steps + 1, body, (lo, hi))
    return lo


def probe_sample(probe: ProbeParams, r1: jnp.ndarray, r2: jnp.ndarray):
    """Importance-sample the probe — same texel distribution as the
    reference's 2-level CDF inversion (Probe.cuh ProbeSample) but via the
    Walker alias table: O(1) per sample, two gathers + one compare (the
    binary search's log(W) gather steps dominated frame profiles).

    Args: uniforms r1 (texel pick) and r2 (accept/alias), each (N,).
    Returns: (dir (N,3), color (N,3), pdf (N,)).
    """
    w, h = probe.width, probe.height
    k = w * h
    cand = jnp.minimum((r1 * k).astype(jnp.int32), k - 1)
    # ONE row gather resolves the whole sample: the row carries BOTH alias
    # outcomes (prob, u, v, pdf, color for candidate AND alias texel —
    # models/probe.py sample_rows). Separate prob/idx/color/pdf fetches were
    # 4 element-rate gathers ≈ 47 ms/bounce at 1.9M rays (frame profile);
    # a packed row gather is ~11 ms and the dependent alias fetch vanishes.
    # Huge probes (> SAMPLE_ROWS_MAX_TEXELS) carry no sample_rows — memory
    # beats the gather win there; fall back to the per-field path.
    if probe.sample_rows is not None:
        g = jnp.take(probe.sample_rows, cand, axis=0)  # (N, 13)
        accept = r2 < g[:, 0]
        u = jnp.where(accept, g[:, 1], g[:, 7])
        v = jnp.where(accept, g[:, 2], g[:, 8])
        pdf = jnp.where(accept, g[:, 3], g[:, 9])
        color = jnp.where(accept[:, None], g[:, 4:7], g[:, 10:13])
    else:
        accept = r2 < jnp.take(probe.alias_prob, cand, axis=0)
        lin = jnp.where(
            accept, cand, jnp.take(probe.alias_idx, cand, axis=0)
        )
        row = lin // w
        col = lin - row * w
        color = jnp.take(probe.data.reshape(-1, 3), lin, axis=0)
        pdf = jnp.take(probe.pdf_flat, lin, axis=0)
        u = col.astype(jnp.float32) / w
        v = row.astype(jnp.float32) / h
    # NOTE: the reference uses the texel *corner* (col/W, row/H) for both the
    # Jacobian and the returned direction (Probe.cuh:157-169); keep parity.
    sin_theta = jnp.sin(v * PI)
    zero = sin_theta == 0.0
    pdf = jnp.where(
        zero, 0.0, pdf * w * h / (2.0 * PI * PI * jnp.where(zero, 1.0, sin_theta))
    )
    direction = uv_to_dir(jnp.stack([u, v], axis=-1))
    return direction, color, pdf


def probe_sample_cdf(probe: ProbeParams, r1: jnp.ndarray, r2: jnp.ndarray):
    """The reference's exact 2-level CDF inversion (Probe.cuh:138-169) — kept
    as the distribution oracle for tests; probe_sample (alias) must match its
    texel marginals."""
    w, h = probe.width, probe.height
    row = jnp.clip(
        jnp.searchsorted(probe.cdf_y, r1, side="left").astype(jnp.int32), 0, h - 1
    )
    col = jnp.clip(
        _lower_bound_rows(probe.cdf_x.reshape(-1), row, w, r2), 0, w - 1
    )
    lin = row * w + col
    color = jnp.take(probe.data.reshape(-1, 3), lin, axis=0)
    pdf = jnp.take(probe.pdf_x.reshape(-1), lin, axis=0) * jnp.take(
        probe.pdf_y, row, axis=0
    )
    u = col.astype(jnp.float32) / w
    v = row.astype(jnp.float32) / h
    sin_theta = jnp.sin(v * PI)
    zero = sin_theta == 0.0
    pdf = jnp.where(
        zero, 0.0, pdf * w * h / (2.0 * PI * PI * jnp.where(zero, 1.0, sin_theta))
    )
    direction = uv_to_dir(jnp.stack([u, v], axis=-1))
    return direction, color, pdf
