"""Geometric sampling + frame helpers, vectorized over ray batches.

Behavior twins (semantics matched, implementation vectorized JAX):
- ``basis_from_vector``  — PT_sv5_/maths.h:94-108 (branch on |w.x|>|w.y|)
- ``onb``                — deviceProgram.cu:92-123 (the Onb struct used for AO)
- hemisphere/sphere/disc/triangle samplers — PT_sv5_/maths.h:230-277
- ``luminance``          — PT_sv5_/maths.h:165-168 (0.3/0.6/0.1 weights)
- ``luminance_rec709``   — deviceProgram.cu:126-131 (tone-map weights)
- ``safe_normalize``     — PT_sv5_/maths.h:144-156
- ``reflect``/``refract``/``schlick_fresnel``/``fresnel_dielectric`` — Disney.cuh

All direction math is float32; inputs of shape (..., 3) broadcast elementwise.
"""

from __future__ import annotations

import jax.numpy as jnp

TWO_PI = 6.283185307179586
PI = 3.141592653589793
INV_PI = 1.0 / PI
INV_2PI = 0.5 / PI


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def normalize(v, eps=1e-20):
    return v * jnp.reciprocal(jnp.sqrt(jnp.maximum(dot(v, v), eps)))[..., None]


def safe_normalize(v, fallback=None):
    """Normalize, returning ``fallback`` (default 0) for near-zero vectors
    (twin: maths.h SafeNormalize)."""
    length2 = dot(v, v)
    ok = length2 > 1e-20
    inv = jnp.where(ok, jnp.reciprocal(jnp.sqrt(jnp.maximum(length2, 1e-20))), 0.0)
    out = v * inv[..., None]
    if fallback is not None:
        out = jnp.where(ok[..., None], out, fallback)
    return out


def luminance(c):
    """0.3/0.6/0.1 luminance used for probe CDFs and BSDF tint (maths.h:165)."""
    return 0.3 * c[..., 0] + 0.6 * c[..., 1] + 0.1 * c[..., 2]


def luminance_rec709(c):
    """Rec.709 luminance used by the Reinhard tone map (deviceProgram.cu:128)."""
    return 0.2126 * c[..., 0] + 0.7152 * c[..., 1] + 0.0722 * c[..., 2]


def basis_from_vector(w):
    """Build (u, v) orthonormal to unit vector w.

    Matches the branch structure of maths.h BasisFromVector: if |w.x|>|w.y| the
    tangent lies in the xz-plane, else in the yz-plane — exact convention parity
    matters for RNG-matched golden images.
    """
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    # Guard both denominators; the unused branch must not produce inf/nan grads.
    inv_xz = jnp.reciprocal(jnp.sqrt(jnp.maximum(wx * wx + wz * wz, 1e-20)))
    inv_yz = jnp.reciprocal(jnp.sqrt(jnp.maximum(wy * wy + wz * wz, 1e-20)))
    u_a = jnp.stack([-wz * inv_xz, jnp.zeros_like(wx), wx * inv_xz], axis=-1)
    u_b = jnp.stack([jnp.zeros_like(wx), wz * inv_yz, -wy * inv_yz], axis=-1)
    use_a = (jnp.abs(wx) > jnp.abs(wy))[..., None]
    u = jnp.where(use_a, u_a, u_b)
    v = jnp.cross(w, u)
    return u, v


def onb(n):
    """The raygen Onb frame (deviceProgram.cu:92-123): returns (tangent, binormal)
    with binormal from the larger of |n.x| vs |n.z|."""
    nx, ny, nz = n[..., 0], n[..., 1], n[..., 2]
    b_a = jnp.stack([-ny, nx, jnp.zeros_like(nx)], axis=-1)
    b_b = jnp.stack([jnp.zeros_like(nx), -nz, ny], axis=-1)
    use_a = (jnp.abs(nx) > jnp.abs(nz))[..., None]
    binormal = normalize(jnp.where(use_a, b_a, b_b))
    tangent = jnp.cross(binormal, n)
    return tangent, binormal


def face_forward(n, v):
    """Flip n to the hemisphere of v: faceforward(N, -ray_dir, N) in the CH
    program (deviceProgram.cu:634) == flip when dot(n, v) < 0."""
    return jnp.where(dot(n, v)[..., None] < 0.0, -n, n)


def uniform_sample_sphere(u1, u2):
    z = 1.0 - 2.0 * u1
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = TWO_PI * u2
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def uniform_sample_hemisphere(u1, u2):
    """maths.h UniformSampleHemisphere: z = u1 directly (NOT cos-weighted)."""
    z = u1
    w = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = TWO_PI * u2
    return jnp.stack([jnp.cos(phi) * w, jnp.sin(phi) * w, z], axis=-1)


def uniform_sample_disc(u1, u2):
    r = jnp.sqrt(u1)
    theta = TWO_PI * u2
    return jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta)], axis=-1)


def cosine_sample_hemisphere(u1, u2):
    s = uniform_sample_disc(u1, u2)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - s[..., 0] ** 2 - s[..., 1] ** 2))
    return jnp.stack([s[..., 0], s[..., 1], z], axis=-1)


def uniform_sample_triangle(u1, u2):
    """Returns barycentric (u, v) (maths.h UniformSampleTriangle)."""
    r = jnp.sqrt(u1)
    return 1.0 - r, u2 * r


def local_to_world(d, u, v, n):
    """light = U*d.x + V*d.y + N*d.z (Disney.cuh BSDFSample frame use)."""
    return (
        u * d[..., 0:1] + v * d[..., 1:2] + n * d[..., 2:3]
    )


def reflect(v, h):
    """Mirror v about h: 2*dot(v,h)*h - v (Disney.cuh specular reflection)."""
    return 2.0 * dot(v, h)[..., None] * h - v


def refract(wi, n, eta):
    """Snell refraction (Disney.cuh Refract). Returns (wt, ok) where ok=False
    signals total internal reflection (wt undefined there)."""
    cos_i = dot(n, wi)
    sin2_i = jnp.maximum(0.0, 1.0 - cos_i * cos_i)
    sin2_t = eta * eta * sin2_i
    ok = sin2_t < 1.0
    cos_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2_t))
    wt = eta[..., None] * -wi + (eta * cos_i - cos_t)[..., None] * n
    return wt, ok


def schlick_fresnel(u):
    """(1-u)^5 clamped (Disney.cuh SchlickFresnel)."""
    m = jnp.clip(1.0 - u, 0.0, 1.0)
    m2 = m * m
    return m2 * m2 * m


def fresnel_dielectric(v_dot_n, eta_i, eta_t):
    """Exact dielectric Fresnel, matching Disney.cuh Fr() including its
    return-1-on-TIR behavior."""
    sin2_t = (eta_i / eta_t) ** 2 * (1.0 - v_dot_n * v_dot_n)
    tir = sin2_t > 1.0
    l_dot_n = jnp.sqrt(jnp.maximum(0.0, 1.0 - jnp.minimum(sin2_t, 1.0)))
    eta = eta_t / eta_i
    denom1 = v_dot_n + eta * l_dot_n
    denom2 = l_dot_n + eta * v_dot_n
    r1 = (v_dot_n - eta * l_dot_n) / jnp.where(jnp.abs(denom1) < 1e-12, 1e-12, denom1)
    r2 = (l_dot_n - eta * v_dot_n) / jnp.where(jnp.abs(denom2) < 1e-12, 1e-12, denom2)
    f = 0.5 * (r1 * r1 + r2 * r2)
    return jnp.where(tir, 1.0, f)
