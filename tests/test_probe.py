"""Probe CDF build + importance sampling tests (twins: Probe.h BuildCDF,
Probe.cuh ProbeSample/ProbePdf/ProbeEval)."""

import jax
import jax.numpy as jnp
import numpy as np

from fovpathtracing_optixcodelatest_tpu.models import probe as probe_mod
from fovpathtracing_optixcodelatest_tpu.ops import probe_sampling as ps


def _test_probe(w=64, h=32, seed=0):
    rng = np.random.default_rng(seed)
    data = rng.uniform(0.01, 1.0, size=(h, w, 3)).astype(np.float32)
    data[h // 4, w // 3] = 50.0  # bright texel to exercise importance sampling
    return probe_mod.build_cdf(data), data


def test_cdf_monotone_and_normalized():
    p, _ = _test_probe()
    cdf_x = np.asarray(p.cdf_x)
    cdf_y = np.asarray(p.cdf_y)
    assert (np.diff(cdf_x, axis=1) >= -1e-6).all()
    assert (np.diff(cdf_y) >= -1e-6).all()
    np.testing.assert_allclose(cdf_x[:, -1], 1.0, atol=1e-5)
    np.testing.assert_allclose(cdf_y[-1], 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(p.pdf_x).sum(axis=1), 1.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(p.pdf_y).sum(), 1.0, atol=1e-4)


def test_uv_dir_roundtrip():
    rng = np.random.default_rng(3)
    d = rng.normal(size=(1000, 3))
    d = (d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32)
    uv = ps.dir_to_uv(jnp.asarray(d))
    d2 = ps.uv_to_dir(uv)
    np.testing.assert_allclose(np.asarray(d2), d, atol=1e-4)


def test_probe_eval_nearest():
    p, data = _test_probe()
    uv = jnp.asarray([[(1 / 3) + 1e-4, 0.25 + 1e-4]], dtype=jnp.float32)
    c = ps.probe_eval(p, uv)
    np.testing.assert_allclose(np.asarray(c[0]), data[8, 21, :3], atol=1e-6)


def test_probe_sample_matches_luminance_distribution():
    """Sampled texel frequencies must track the luminance pdf (chi-square-ish)."""
    p, data = _test_probe()
    n = 200_000
    key = jax.random.PRNGKey(0)
    r = jax.random.uniform(key, (2, n))
    d, color, pdf = ps.probe_sample(p, r[0], r[1])
    assert np.isfinite(np.asarray(pdf)).all()
    assert (np.asarray(pdf) >= 0).all()
    # Bright texel at (row 8, col 21): expect its uv bin to dominate
    uv = np.asarray(ps.dir_to_uv(d))
    col = np.clip((uv[:, 0] * p.width).astype(int), 0, p.width - 1)
    row = np.clip((uv[:, 1] * p.height).astype(int), 0, p.height - 1)
    lum = 0.3 * data[..., 0] + 0.6 * data[..., 1] + 0.1 * data[..., 2]
    expected_frac = lum[8, 21] / lum.sum()
    got_frac = ((row == 8) & (col == 21)).mean()
    np.testing.assert_allclose(got_frac, expected_frac, rtol=0.15)


def test_probe_pdf_matches_formula_at_texel_centers():
    """probe_pdf at texel-center directions == pdf_x·pdf_y·WH/(2π² sinθ)."""
    p, _ = _test_probe()
    w, h = p.width, p.height
    rows = np.arange(1, h - 1)
    cols = np.arange(w)
    rr, cc = np.meshgrid(rows, cols, indexing="ij")
    u = (cc.ravel() + 0.5) / w
    v = (rr.ravel() + 0.5) / h
    d = ps.uv_to_dir(jnp.asarray(np.stack([u, v], axis=-1), dtype=jnp.float32))
    got = np.asarray(ps.probe_pdf(p, d))
    sin_t = np.sin(v * np.pi)
    expected = (
        np.asarray(p.pdf_x)[rr.ravel(), cc.ravel()]
        * np.asarray(p.pdf_y)[rr.ravel()]
        * w * h / (2.0 * np.pi**2 * sin_t)
    )
    np.testing.assert_allclose(got, expected, rtol=2e-2)


def test_probe_sample_pdf_matches_texel_formula():
    """pdf returned by probe_sample == the analytic texel pdf at (row, col),
    reconstructed from the sampled direction's texel (corner-uv convention,
    Probe.cuh:157-169)."""
    p, _ = _test_probe()
    w, h = p.width, p.height
    key = jax.random.PRNGKey(1)
    r = jax.random.uniform(key, (2, 4096))
    d, _, pdf_s = ps.probe_sample(p, r[0], r[1])
    # recover (row, col) robustly: round corner uv to nearest texel corner
    uv = np.asarray(ps.dir_to_uv(d))
    col = np.clip(np.round(uv[:, 0] * w).astype(int), 0, w - 1)
    row = np.clip(np.round(uv[:, 1] * h).astype(int), 0, h - 1)
    sin_t = np.sin(row / h * np.pi)
    expected = np.where(
        sin_t == 0.0,
        0.0,
        np.asarray(p.pdf_x)[row, col] * np.asarray(p.pdf_y)[row]
        * w * h / (2.0 * np.pi**2 * np.where(sin_t == 0, 1.0, sin_t)),
    )
    np.testing.assert_allclose(np.asarray(pdf_s), expected, rtol=5e-2)


def test_probe_pdf_integrates_to_one():
    """MC integral of pdf over the sphere ≈ 1 (uniform-direction estimator)."""
    p, _ = _test_probe()
    rng = np.random.default_rng(7)
    d = rng.normal(size=(400_000, 3))
    d = (d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32)
    pdf = np.asarray(ps.probe_pdf(p, jnp.asarray(d)))
    integral = pdf.mean() * 4.0 * np.pi
    np.testing.assert_allclose(integral, 1.0, rtol=5e-2)


def test_constant_probe_uniformish_pdf():
    p = probe_mod.constant_probe((2.5, 2.5, 2.5), width=64, height=32)
    key = jax.random.PRNGKey(2)
    r = jax.random.uniform(key, (2, 8192))
    d, color, pdf = ps.probe_sample(p, r[0], r[1])
    np.testing.assert_allclose(np.asarray(color), 2.5, atol=1e-5)
    # Row 0 has sinθ=0 ⇒ pdf forced to 0 (Probe.cuh:163-166 zero-guard, same
    # in the reference); every other row must be strictly positive.
    pdf = np.asarray(pdf)
    assert (pdf >= 0).all()
    assert (pdf > 0).mean() > 0.9


def test_gradient_sky_probe_builds():
    p = probe_mod.gradient_sky_probe(width=128, height=64)
    assert p.width == 128 and p.height == 64
    assert np.isfinite(np.asarray(p.data)).all()


def test_huge_probe_falls_back_without_sample_rows():
    """Probes above SAMPLE_ROWS_MAX_TEXELS skip the (H*W,13) one-gather rows
    (a ~4x device-memory copy) and probe_sample must produce the SAME
    samples through the per-field fallback path."""
    import numpy as np

    from fovpathtracing_optixcodelatest_tpu.models import probe as probe_mod
    from fovpathtracing_optixcodelatest_tpu.ops.probe_sampling import (
        probe_sample,
    )

    rng = np.random.default_rng(0)
    img = rng.random((16, 32, 3)).astype(np.float32) + 0.01
    small = probe_mod.build_cdf(img)
    assert small.sample_rows is not None
    old = probe_mod.SAMPLE_ROWS_MAX_TEXELS
    try:
        probe_mod.SAMPLE_ROWS_MAX_TEXELS = 4
        big = probe_mod.build_cdf(img)
    finally:
        probe_mod.SAMPLE_ROWS_MAX_TEXELS = old
    assert big.sample_rows is None
    r1 = np.asarray(rng.random(512), np.float32)
    r2 = np.asarray(rng.random(512), np.float32)
    a = probe_sample(small, r1, r2)
    b = probe_sample(big, r1, r2)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_prefiltered_cdf_spreads_to_neighbors():
    """Texture.cpp variant (3x3 Gaussian prefilter, OptixUtils
    Texture.cpp:7-44): on a spiky HDR, the plain CDF gives zero sampling
    probability to texels adjacent to an isolated bright texel; the
    prefiltered CDF must give them nonzero probability while both keep a
    normalized, unbiased estimator."""
    h, w = 32, 64
    data = np.zeros((h, w, 3), dtype=np.float32)
    data[10, 20] = 100.0  # single bright texel in a black env
    data[0, 0] = 1e-3     # keep total > 0 away from the spike too
    plain = probe_mod.build_cdf(data)
    pre = probe_mod.build_cdf(data, prefilter=True)
    pdf_plain = np.asarray(plain.pdf_x) * np.asarray(plain.pdf_y)[:, None]
    pdf_pre = np.asarray(pre.pdf_x) * np.asarray(pre.pdf_y)[:, None]
    # neighbors of the spike: zero probability plain, nonzero prefiltered
    assert pdf_plain[10, 21] == 0.0 and pdf_plain[9, 20] == 0.0
    assert pdf_pre[10, 21] > 0.0 and pdf_pre[9, 20] > 0.0
    assert pdf_pre[11, 21] > 0.0  # corner neighbor too
    # x wraps, y clamps (Texture.cpp:10-13): a spike at column 0 must leak
    # to the last column, and a spike at row 0 must not wrap to the bottom
    data2 = np.zeros((h, w, 3), dtype=np.float32)
    data2[0, 0] = 100.0
    pre2 = probe_mod.build_cdf(data2, prefilter=True)
    pdf2 = np.asarray(pre2.pdf_x) * np.asarray(pre2.pdf_y)[:, None]
    assert pdf2[0, w - 1] > 0.0  # x repeat
    assert pdf2[h - 1, 0] == 0.0  # y clamp (no wrap to bottom)
    # CDF stays normalized on rows with any weight (all-black rows keep
    # cdf 0 and pdf_y 0 — never sampled, same as the plain build)
    nz = np.asarray(pre.pdf_y) > 0
    np.testing.assert_allclose(np.asarray(pre.cdf_x)[nz, -1], 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pre.cdf_y)[-1], 1.0, atol=1e-5)


def test_prefiltered_estimator_unbiased():
    """MC estimate of the env integral with the prefiltered pdf must match
    the plain pdf's estimate (importance distribution changes, estimator
    doesn't)."""
    rng = np.random.default_rng(7)
    data = rng.uniform(0.0, 1.0, size=(16, 32, 3)).astype(np.float32)
    data[5, 7] = 200.0
    n = 400_000
    key = jax.random.PRNGKey(1)
    r = jax.random.uniform(key, (2, n))
    ests = []
    for pf in (False, True):
        p = probe_mod.build_cdf(data, prefilter=pf)
        d, color, pdf = ps.probe_sample(p, r[0], r[1])
        lum = np.asarray(0.3 * color[:, 0] + 0.6 * color[:, 1]
                         + 0.1 * color[:, 2])
        pdfn = np.asarray(pdf)
        ok = pdfn > 0
        ests.append((lum[ok] / pdfn[ok]).sum() / n)
    np.testing.assert_allclose(ests[0], ests[1], rtol=0.05)
