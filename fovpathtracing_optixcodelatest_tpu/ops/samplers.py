"""AA-jitter sample generators: random / stratified / blue-noise.

Twin of the reference's sampling toolbox (PT_sv5_/sample.h): stratified 1D/2D
strata (:6-45), best-candidate and projective blue-noise point generators
(:80-214), and the Sample1D/Sample2D dispatch whose shipped configuration is
pure random (USE_RANDOM 1, :253-291).

TPU shaping:
- The stratified path is closed-form per (pixel, sample-slot) — no host
  tables, just integer math on the slot plus the usual counter-hash in-cell
  jitter (ops/rng.py), so it stays layout- and sharding-invariant.
- The blue-noise path builds ONE host-side best-candidate point set per spp
  (cached) and gives every pixel its own toroidal Cranley-Patterson rotation
  of it, keyed by pixel id. Rotation preserves the set's spectrum; the table
  is tiny (spp <= 64) and applied with unrolled selects — small
  compile-time-constant tables must never become in-loop gathers (PLAN.md
  rule 1/5).
"""

from __future__ import annotations

import functools
import math

import jax.numpy as jnp
import numpy as np

from fovpathtracing_optixcodelatest_tpu.ops.rng import ray_uniforms

SAMPLERS = ("random", "stratified", "blue_noise")


def _strata_dims(spp: int):
    nx = int(math.ceil(math.sqrt(spp)))
    ny = int(math.ceil(spp / nx))
    return nx, ny


def best_candidate_points(
    n: int, seed: int = 0, candidates_per_point: int = 32
) -> np.ndarray:
    """Best-candidate (Mitchell) blue-noise points in [0,1)^2, toroidal
    metric (twin: sample.h BestCandidateSampling, :80-130). Returns (n, 2)."""
    rng = np.random.default_rng(seed)
    pts = np.empty((n, 2), np.float64)
    pts[0] = rng.random(2)
    for i in range(1, n):
        cand = rng.random((candidates_per_point * i, 2))
        d = np.abs(cand[:, None, :] - pts[None, :i, :])
        d = np.minimum(d, 1.0 - d)  # toroidal wrap
        dist2 = (d * d).sum(-1).min(axis=1)
        pts[i] = cand[np.argmax(dist2)]
    return pts.astype(np.float32)


def projective_blue_noise_points(
    n: int, seed: int = 0, candidates_per_point: int = 32
) -> np.ndarray:
    """Projective blue noise: candidate score is the min over the 2-D
    distance AND each 1-D axis projection (so the x- and y-projections are
    well distributed too — twin: sample.h ProjectiveBlueNoise, :132-214)."""
    rng = np.random.default_rng(seed)
    pts = np.empty((n, 2), np.float64)
    pts[0] = rng.random(2)
    for i in range(1, n):
        cand = rng.random((candidates_per_point * i, 2))
        d = np.abs(cand[:, None, :] - pts[None, :i, :])
        d = np.minimum(d, 1.0 - d)
        d2 = (d * d).sum(-1)
        # projections scaled to be commensurable with the 2-D spacing
        # (1-D spacing target ~1/n vs 2-D ~1/sqrt(n))
        px = (d[:, :, 0] * i) ** 2
        py = (d[:, :, 1] * i) ** 2
        score = np.minimum(d2 * i, np.minimum(px, py)).min(axis=1)
        pts[i] = cand[np.argmax(score)]
    return pts.astype(np.float32)


@functools.lru_cache(maxsize=32)
def _bn_table(spp: int) -> tuple:
    return tuple(map(tuple, best_candidate_points(spp, seed=7)))


def aa_jitter(
    key: jnp.ndarray,
    ray_ids: jnp.ndarray,
    slots: jnp.ndarray,
    spp: int,
    sampler: str = "random",
) -> jnp.ndarray:
    """Per-ray 2-D AA jitter in [0,1)^2 by sampler mode.

    ``ray_ids`` are global ray ids (pixel*spp + slot + base, raygen.py);
    ``slots`` the per-ray sample slot in [0, spp). All modes are pure
    functions of (key, ray id) so multi-chip sample sharding stays
    bit-identical (parallel/tiles.py).
    """
    if sampler == "random" or spp <= 1:
        return ray_uniforms(key, ray_ids, 2)
    if sampler == "stratified":
        nx, ny = _strata_dims(spp)
        r = ray_uniforms(key, ray_ids, 2)
        sx = (slots % nx).astype(jnp.float32)
        sy = (slots // nx).astype(jnp.float32)
        u = (sx + r[:, 0]) * (1.0 / nx)
        v = (sy + r[:, 1]) * (1.0 / ny)
        return jnp.stack([u, v], axis=-1)
    if sampler == "blue_noise":
        table = _bn_table(spp)
        # slot -> base point via unrolled selects (tiny static table)
        bx = jnp.zeros(slots.shape, jnp.float32)
        by = jnp.zeros(slots.shape, jnp.float32)
        for j, (px, py) in enumerate(table):
            sel = slots == j
            bx = jnp.where(sel, np.float32(px), bx)
            by = jnp.where(sel, np.float32(py), by)
        # per-pixel Cranley-Patterson rotation keyed by pixel identity
        pix_key_ids = ray_ids - slots  # = base + pixel*spp, unique per pixel
        shift = ray_uniforms(key, pix_key_ids, 2)
        u = (bx + shift[:, 0]) % 1.0
        v = (by + shift[:, 1]) % 1.0
        return jnp.stack([u, v], axis=-1)
    raise ValueError(f"unknown sampler {sampler!r}; one of {SAMPLERS}")
