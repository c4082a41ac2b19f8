"""Spectral module tests: CMF sanity, RGB round-trip, hero wavelengths."""

import jax.numpy as jnp
import numpy as np

from fovpathtracing_optixcodelatest_tpu.ops import spectrum as sp


def test_cie_curves_shape_and_peaks():
    x, y, z = sp.cie_xyz_bar(np.linspace(380, 720, 100))
    lam = np.linspace(380, 720, 100)
    assert abs(lam[np.argmax(y)] - 555) < 20  # y-bar peaks near 555nm
    assert abs(lam[np.argmax(z)] - 445) < 20  # z-bar peaks in the blue
    assert (np.asarray([x, y, z]) > -0.1).all()


def test_rgb_spectrum_roundtrip():
    rgbs = jnp.asarray([
        [1.0, 1.0, 1.0],
        [1.0, 0.0, 0.0],
        [0.0, 1.0, 0.0],
        [0.0, 0.0, 1.0],
        [0.2, 0.5, 0.8],
    ])
    spec = sp.rgb_to_spectrum(rgbs)
    assert spec.shape == (5, sp.NUM_BINS)
    assert (np.asarray(spec) >= 0).all()
    back = np.asarray(sp.spectrum_to_rgb(spec))
    # non-negative basis clipping costs some saturation; whites and mixed
    # colors round-trip tightly, primaries within tolerance
    np.testing.assert_allclose(back[0], [1, 1, 1], atol=0.15)
    np.testing.assert_allclose(back[4], [0.2, 0.5, 0.8], atol=0.15)
    for i in range(1, 4):
        assert np.argmax(back[i]) == i - 1  # hue preserved


def test_hero_wavelengths():
    u = jnp.asarray([0.0, 0.25, 0.9])
    lam = np.asarray(sp.sample_hero_wavelengths(u))
    assert lam.shape == (3, sp.NUM_HERO)
    assert ((lam >= sp.LAMBDA_MIN) & (lam <= sp.LAMBDA_MAX)).all()
    # rotated strata: pairwise distinct, evenly spread
    d = np.diff(np.sort(lam[1]))
    np.testing.assert_allclose(d, (sp.LAMBDA_MAX - sp.LAMBDA_MIN) / sp.NUM_HERO,
                               atol=1.0)


def test_eval_spectrum_interpolation():
    spec = jnp.asarray(np.linspace(0, 1, sp.NUM_BINS, dtype=np.float32))[None, :]
    lam = jnp.asarray([[sp.LAMBDA_MIN, 0.5 * (sp.LAMBDA_MIN + sp.LAMBDA_MAX), sp.LAMBDA_MAX]])
    vals = np.asarray(sp.eval_spectrum_at(spec, lam))
    np.testing.assert_allclose(vals[0], [0.0, 0.5, 1.0], atol=1e-3)
