"""Disney BSDF tests: sample/pdf consistency, normalization, energy bounds
(the vectorized-JAX upgrade of the reference's eyeball-only BSDFTest harness,
Disney.cuh:431-504)."""

import jax
import jax.numpy as jnp
import numpy as np

from fovpathtracing_optixcodelatest_tpu.models.material import Material, MaterialTable
from fovpathtracing_optixcodelatest_tpu.ops import bsdf
from fovpathtracing_optixcodelatest_tpu.ops.sampling import basis_from_vector, dot


def _mat_batch(n, **kw):
    table = MaterialTable.from_materials([Material(**kw)])
    return table.gather(jnp.zeros((n,), dtype=jnp.int32))


def _frame(n):
    normal = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], dtype=jnp.float32), (n, 1))
    u, v = basis_from_vector(normal)
    return u, v, normal


def _view(n, angle=0.4):
    view = jnp.tile(
        jnp.asarray([[np.sin(angle), 0.0, np.cos(angle)]], dtype=jnp.float32),
        (n, 1),
    )
    return view


def test_sample_pdf_consistency():
    """For non-specular samples, bsdf_pdf(sampled light) == returned pdf."""
    n = 20_000
    mat = _mat_batch(n, transmission=0.3, roughness=0.4, subsurface=0.1,
                     metallic=0.2, color=(0.7, 0.5, 0.3))
    u, v, nrm = _frame(n)
    view = _view(n)
    eta_i = jnp.ones(n)
    eta_o = jnp.full((n,), 1.4)
    uniforms = jax.random.uniform(jax.random.PRNGKey(0), (n, 6))
    light, pdf, stype = bsdf.bsdf_sample(mat, eta_i, eta_o, u, v, nrm, view, uniforms)
    nonspec = np.asarray(stype) != bsdf.BSDF_SPECULAR
    pdf_re = np.asarray(bsdf.bsdf_pdf(mat, eta_i, eta_o, nrm, view, light))
    np.testing.assert_allclose(
        np.asarray(pdf)[nonspec], pdf_re[nonspec], rtol=1e-4, atol=1e-6
    )
    assert (np.asarray(pdf) >= 0).all()
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(light)[nonspec], axis=1), 1.0, atol=1e-3
    )


def test_pdf_normalization_no_transmission():
    """transmission=0, subsurface=0 ⇒ pdf is a true density on the upper
    hemisphere: E_{ω~p}[1/p] = 2π (support measure)."""
    n = 400_000
    mat = _mat_batch(n, transmission=0.0, subsurface=0.0, roughness=0.5)
    u, v, nrm = _frame(n)
    view = _view(n)
    eta_i = jnp.ones(n)
    eta_o = jnp.full((n,), 1.4)
    uniforms = jax.random.uniform(jax.random.PRNGKey(1), (n, 6))
    light, pdf, _ = bsdf.bsdf_sample(mat, eta_i, eta_o, u, v, nrm, view, uniforms)
    p = np.asarray(pdf)
    # GGX reflection occasionally lands below the horizon where the pdf is 0 —
    # the reference terminates those paths (deviceProgram.cu:708-711). The
    # surviving mass must integrate to the hemisphere measure.
    ok = p > 0
    assert ok.mean() > 0.85
    est = np.sum(1.0 / p[ok]) / n
    np.testing.assert_allclose(est, 2 * np.pi, rtol=0.08)


def test_sampled_directions_above_horizon_for_brdf():
    n = 50_000
    mat = _mat_batch(n, transmission=0.0, subsurface=0.0, roughness=0.8)
    u, v, nrm = _frame(n)
    view = _view(n)
    uniforms = jax.random.uniform(jax.random.PRNGKey(2), (n, 6))
    light, pdf, stype = bsdf.bsdf_sample(
        mat, jnp.ones(n), jnp.full((n,), 1.4), u, v, nrm, view, uniforms
    )
    z = np.asarray(light)[:, 2]
    # cosine + GGX-reflection samples: wide (α=0.8) GGX reflections dip below
    # the horizon ~20% of the time (those paths terminate with pdf=0, the
    # reference behavior); the bulk must be above
    assert (z > 0).mean() > 0.7
    assert (np.asarray(stype) == bsdf.BSDF_REFLECTED).all()


def test_specular_refraction_branch():
    """transmission=1 materials refract by Snell with pdf=(1-F)·transmission."""
    n = 10_000
    mat = _mat_batch(n, transmission=1.0, roughness=0.05)
    u, v, nrm = _frame(n)
    view = _view(n, angle=0.3)
    eta_i = jnp.ones(n)
    eta_o = jnp.full((n,), 1.5)
    uniforms = jax.random.uniform(jax.random.PRNGKey(3), (n, 6))
    light, pdf, stype = bsdf.bsdf_sample(mat, eta_i, eta_o, u, v, nrm, view, uniforms)
    st = np.asarray(stype)
    spec = st == bsdf.BSDF_SPECULAR
    assert spec.any() and (st != bsdf.BSDF_TRANSMITTED).all()
    lz = np.asarray(light)[spec, 2]
    assert (lz < 0).all()  # transmitted into the surface
    # Snell: sin_t = sin_i / 1.5
    sin_i = np.sin(0.3)
    sin_t = np.linalg.norm(np.asarray(light)[spec, :2], axis=1)
    np.testing.assert_allclose(sin_t, sin_i / 1.5, atol=1e-4)
    f = float(
        np.asarray(
            bsdf.bsdf_pdf(mat, eta_i, eta_o, nrm, view, view) * 0
        )[0]
    )  # unused; keep pdf check direct:
    from fovpathtracing_optixcodelatest_tpu.ops.sampling import fresnel_dielectric

    f = np.asarray(fresnel_dielectric(dot(nrm, view), eta_i, eta_o))
    np.testing.assert_allclose(np.asarray(pdf)[spec], (1 - f[spec]), rtol=1e-5)


def test_eval_nonnegative_and_reciprocal_shape():
    n = 5000
    mat = _mat_batch(n, transmission=0.2, roughness=0.3, metallic=0.5,
                     specular=0.8, color=(0.8, 0.6, 0.4), clearcoat=0.5)
    _, _, nrm = _frame(n)
    view = _view(n)
    rng = np.random.default_rng(0)
    d = rng.normal(size=(n, 3))
    d = jnp.asarray((d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32))
    albedo = jnp.tile(jnp.asarray([[0.8, 0.6, 0.4]], dtype=jnp.float32), (n, 1))
    f = np.asarray(
        bsdf.bsdf_eval(mat, albedo, jnp.ones(n), jnp.full((n,), 1.4), nrm, view, d)
    )
    assert np.isfinite(f).all()
    assert (f >= -1e-6).all()


def test_energy_conservation_mc():
    """∫ f·cosθ dω ≤ ~1 per channel for a plausible material (white-furnace
    upper bound; the Disney model is not exactly normalized)."""
    n = 400_000
    mat = _mat_batch(n, transmission=0.0, subsurface=0.0, roughness=0.6,
                     metallic=0.0, specular=0.5, specular_tint=0.0,
                     color=(1.0, 1.0, 1.0), clearcoat=0.0)
    _, _, nrm = _frame(n)
    view = _view(n, angle=0.2)
    # uniform hemisphere MC
    rng = np.random.default_rng(1)
    z = rng.uniform(0, 1, n)
    phi = rng.uniform(0, 2 * np.pi, n)
    r = np.sqrt(1 - z * z)
    d = jnp.asarray(
        np.stack([r * np.cos(phi), r * np.sin(phi), z], axis=-1).astype(np.float32)
    )
    albedo = jnp.ones((n, 3), dtype=jnp.float32)
    f = np.asarray(
        bsdf.bsdf_eval(mat, albedo, jnp.ones(n), jnp.full((n,), 1.4), nrm, view, d)
    )
    integrand = f * z[:, None]
    integral = integrand.mean(axis=0) * 2 * np.pi
    assert (integral < 1.6).all()  # diffuse+spec with Fd90 retro boost ≤ ~1.6
    assert (integral > 0.3).all()


def test_pdf_below_horizon_subsurface_only():
    n = 4
    mat = _mat_batch(n, transmission=0.0, subsurface=0.4)
    _, _, nrm = _frame(n)
    view = _view(n)
    below = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]], dtype=jnp.float32), (n, 1))
    p = np.asarray(bsdf.bsdf_pdf(mat, jnp.ones(n), jnp.full((n,), 1.4), nrm, view, below))
    np.testing.assert_allclose(p, 0.4 * 0.5 / (2 * np.pi), rtol=1e-5)
