"""Sampler toolbox tests (twin capability: PT_sv5_/sample.h:6-214).

The reference ships its stratified / best-candidate / projective blue-noise
generators compiled out (USE_RANDOM 1); here each generator is exercised and
its defining property is asserted: stratified and blue-noise jitter reduce
equal-spp integration variance vs pure random, and the blue-noise point sets
keep a minimum toroidal spacing pure random does not.
"""

import jax
import jax.numpy as jnp
import numpy as np

from fovpathtracing_optixcodelatest_tpu.ops import samplers


def _min_toroidal_dist(pts: np.ndarray) -> float:
    d = np.abs(pts[:, None, :] - pts[None, :, :])
    d = np.minimum(d, 1.0 - d)
    dist = np.sqrt((d * d).sum(-1))
    np.fill_diagonal(dist, np.inf)
    return float(dist.min())


def test_best_candidate_spacing():
    n = 32
    bn = samplers.best_candidate_points(n, seed=3)
    assert bn.shape == (n, 2)
    assert np.all((bn >= 0) & (bn < 1))
    # best-candidate spacing approaches poisson-disk: well above random's
    # typical min distance (~1/n), near the ~0.75/sqrt(n) disk bound
    assert _min_toroidal_dist(bn) > 0.4 / np.sqrt(n)
    rnd = np.random.default_rng(3).random((n, 2))
    assert _min_toroidal_dist(bn) > 2.0 * _min_toroidal_dist(rnd)


def test_projective_blue_noise_projections():
    n = 24
    pts = samplers.projective_blue_noise_points(n, seed=5)
    # defining property: the 1-D projections are ALSO well separated
    for axis in (0, 1):
        p = np.sort(pts[:, axis])
        gaps = np.diff(np.concatenate([p, [p[0] + 1.0]]))
        assert gaps.min() > 0.1 / n, f"axis {axis} projection collapsed"


def _pixel_estimates(sampler: str, spp: int, n_pix: int):
    """Monte-Carlo estimate of integral f over [0,1)^2 per pixel."""
    key = jax.random.PRNGKey(9)
    pix = jnp.repeat(jnp.arange(n_pix, dtype=jnp.int32), spp)
    slots = jnp.tile(jnp.arange(spp, dtype=jnp.int32), n_pix)
    ray_ids = pix * spp + slots
    uv = samplers.aa_jitter(key, ray_ids, slots, spp, sampler)
    f = jnp.sin(3.0 * uv[:, 0]) * uv[:, 1] ** 2  # smooth integrand
    est = f.reshape(n_pix, spp).mean(axis=1)
    exact = float((1.0 - np.cos(3.0)) / 3.0 / 3.0)
    return np.asarray(est), exact


def test_stratified_and_blue_noise_reduce_variance():
    spp, n_pix = 16, 4096
    mse = {}
    for s in samplers.SAMPLERS:
        est, exact = _pixel_estimates(s, spp, n_pix)
        mse[s] = float(np.mean((est - exact) ** 2))
    # stratification beats random by ~O(spp) on smooth integrands; require
    # a conservative 3x. blue-noise sits between.
    assert mse["stratified"] < mse["random"] / 3.0, mse
    assert mse["blue_noise"] < mse["random"] / 1.5, mse


def test_jitter_in_unit_square_and_deterministic():
    key = jax.random.PRNGKey(0)
    n = 1024
    slots = jnp.tile(jnp.arange(8, dtype=jnp.int32), n // 8)
    ray_ids = jnp.arange(n, dtype=jnp.int32)
    for s in samplers.SAMPLERS:
        uv = np.asarray(samplers.aa_jitter(key, ray_ids, slots, 8, s))
        assert uv.shape == (n, 2)
        assert np.all((uv >= 0.0) & (uv < 1.0)), s
        uv2 = np.asarray(samplers.aa_jitter(key, ray_ids, slots, 8, s))
        np.testing.assert_array_equal(uv, uv2)
