"""Unit tests for geometric sampling ops (twin behaviors from PT_sv5_/maths.h
and Disney.cuh helper functions)."""

import jax
import jax.numpy as jnp
import numpy as np

from fovpathtracing_optixcodelatest_tpu.ops import sampling as smp


def _rand_dirs(n, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3))
    return (v / np.linalg.norm(v, axis=1, keepdims=True)).astype(np.float32)


def test_basis_from_vector_orthonormal():
    w = jnp.asarray(_rand_dirs(512))
    u, v = smp.basis_from_vector(w)
    np.testing.assert_allclose(smp.dot(u, w), 0.0, atol=1e-5)
    np.testing.assert_allclose(smp.dot(v, w), 0.0, atol=1e-5)
    np.testing.assert_allclose(smp.dot(u, v), 0.0, atol=1e-5)
    np.testing.assert_allclose(smp.dot(u, u), 1.0, atol=1e-4)
    np.testing.assert_allclose(smp.dot(v, v), 1.0, atol=1e-4)
    # right-handed: u × v = w
    np.testing.assert_allclose(np.cross(u, v), w, atol=1e-4)


def test_basis_from_vector_branch_convention():
    # |w.x| > |w.y| branch: tangent in the xz-plane with zero y (maths.h:96-100)
    w = jnp.asarray([[0.8, 0.1, 0.59]], dtype=jnp.float32)
    u, _ = smp.basis_from_vector(w)
    assert abs(float(u[0, 1])) < 1e-6
    # else branch: tangent has zero x (maths.h:101-105)
    w = jnp.asarray([[0.1, 0.8, 0.59]], dtype=jnp.float32)
    u, _ = smp.basis_from_vector(w)
    assert abs(float(u[0, 0])) < 1e-6


def test_onb_orthonormal():
    n = jnp.asarray(_rand_dirs(256, seed=1))
    t, b = smp.onb(n)
    np.testing.assert_allclose(smp.dot(t, n), 0.0, atol=1e-5)
    np.testing.assert_allclose(smp.dot(b, n), 0.0, atol=1e-5)
    np.testing.assert_allclose(smp.dot(t, b), 0.0, atol=1e-5)


def test_cosine_hemisphere_distribution():
    key = jax.random.PRNGKey(0)
    u = jax.random.uniform(key, (2, 100_000))
    d = smp.cosine_sample_hemisphere(u[0], u[1])
    z = np.asarray(d[..., 2])
    assert (z >= 0).all()
    # E[cos theta] for pdf cos/pi is 2/3
    np.testing.assert_allclose(z.mean(), 2.0 / 3.0, atol=5e-3)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(d), axis=-1), 1.0, atol=1e-4
    )


def test_uniform_sphere_mean_zero():
    key = jax.random.PRNGKey(1)
    u = jax.random.uniform(key, (2, 100_000))
    d = np.asarray(smp.uniform_sample_sphere(u[0], u[1]))
    np.testing.assert_allclose(d.mean(axis=0), 0.0, atol=8e-3)
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-4)


def test_uniform_hemisphere_z_distribution():
    # maths.h UniformSampleHemisphere: z = u1 uniform in [0,1]
    key = jax.random.PRNGKey(2)
    u = jax.random.uniform(key, (2, 100_000))
    d = np.asarray(smp.uniform_sample_hemisphere(u[0], u[1]))
    np.testing.assert_allclose(d[:, 2].mean(), 0.5, atol=5e-3)


def test_refract_and_tir():
    n = jnp.asarray([[0.0, 0.0, 1.0]], dtype=jnp.float32)
    wi = smp.normalize(jnp.asarray([[0.3, 0.0, 0.954]], dtype=jnp.float32))
    # glass entry: eta = 1/1.5
    wt, ok = smp.refract(wi, n, jnp.asarray([1.0 / 1.5]))
    assert bool(ok[0])
    # Snell: sin_t = eta * sin_i
    sin_i = float(jnp.sqrt(1 - smp.dot(wi, n) ** 2)[0])
    sin_t = float(jnp.sqrt(wt[0, 0] ** 2 + wt[0, 1] ** 2))
    np.testing.assert_allclose(sin_t, sin_i / 1.5, atol=1e-5)
    assert float(wt[0, 2]) < 0  # transmitted into the lower hemisphere
    # TIR: grazing exit from dense medium
    wi2 = smp.normalize(jnp.asarray([[0.9, 0.0, 0.436]], dtype=jnp.float32))
    _, ok2 = smp.refract(wi2, n, jnp.asarray([1.5]))
    assert not bool(ok2[0])


def test_fresnel_dielectric_limits():
    # normal incidence on glass: R = ((n1-n2)/(n1+n2))^2 = 0.04
    f = smp.fresnel_dielectric(jnp.asarray([1.0]), 1.0, 1.5)
    np.testing.assert_allclose(float(f[0]), 0.04, atol=1e-4)
    # TIR from inside
    f = smp.fresnel_dielectric(jnp.asarray([0.2]), 1.5, 1.0)
    np.testing.assert_allclose(float(f[0]), 1.0)


def test_face_forward():
    n = jnp.asarray([[0.0, 0.0, 1.0]], dtype=jnp.float32)
    v_same = jnp.asarray([[0.0, 0.0, 1.0]], dtype=jnp.float32)
    v_opp = jnp.asarray([[0.0, 0.0, -1.0]], dtype=jnp.float32)
    np.testing.assert_allclose(smp.face_forward(n, v_same), n)
    np.testing.assert_allclose(smp.face_forward(n, v_opp), -n)


def test_reflect():
    h = jnp.asarray([[0.0, 0.0, 1.0]], dtype=jnp.float32)
    v = smp.normalize(jnp.asarray([[1.0, 0.0, 1.0]], dtype=jnp.float32))
    r = smp.reflect(v, h)
    np.testing.assert_allclose(np.asarray(r[0]), [-v[0, 0], 0.0, v[0, 2]], atol=1e-6)
