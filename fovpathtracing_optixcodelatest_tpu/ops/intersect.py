"""Ray-triangle intersection and the brute-force closest-hit oracle.

The reference delegates intersection to OptiX's hardware BVH (optixTrace,
deviceProgram.cu:196-248). Here the primitive test is vectorized
Möller-Trumbore over (rays × triangle-chunk) tiles under ``lax.scan`` — the
oracle every BVH traversal result is validated against (SURVEY.md §7 milestone
2). Occlusion queries replicate OPTIX_RAY_FLAG_CULL_BACK_FACING_TRIANGLES
(deviceProgram.cu:237): back-facing triangles do not occlude.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fovpathtracing_optixcodelatest_tpu.models.mesh import SceneGeometry


def ray_triangle(
    origin, direction, v0, e1, e2, tmin, tmax, cull_backface: bool = False
):
    """Möller-Trumbore. All inputs broadcast; origin/direction (..., 3) against
    triangles (..., 3). Returns (t, u, v, hit).

    hit=False ⇒ t undefined. Degenerate/parallel cases rejected via |det| eps.
    """
    pvec = jnp.cross(direction, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    if cull_backface:
        # Back-face: ray hits the CW side (det < 0 with CCW winding).
        det_ok = det > 1e-9
    else:
        det_ok = jnp.abs(det) > 1e-9
    inv_det = jnp.where(det_ok, 1.0 / jnp.where(det_ok, det, 1.0), 0.0)
    tvec = origin - v0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(direction * qvec, axis=-1) * inv_det
    t = jnp.sum(e2 * qvec, axis=-1) * inv_det
    hit = (
        det_ok
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t >= tmin)
        & (t <= tmax)
    )
    return t, u, v, hit


def brute_force_closest_hit(
    geom: SceneGeometry,
    origin: jnp.ndarray,
    direction: jnp.ndarray,
    tmin: float,
    tmax: float,
    chunk: int = 512,
):
    """O(N·T) closest hit: scan triangle chunks, keep min-t.

    Returns dict with t (N,), tri_id (N,) int32 (-1 = miss), u, v (N,), hit (N,).
    """
    n = origin.shape[0]
    t_count = geom.num_triangles
    pad = (-t_count) % chunk
    v0 = jnp.pad(geom.tri_v0, ((0, pad), (0, 0)))
    e1 = jnp.pad(geom.tri_e1, ((0, pad), (0, 0)))
    e2 = jnp.pad(geom.tri_e2, ((0, pad), (0, 0)), constant_values=0.0)
    valid_tri = jnp.arange(t_count + pad) < t_count
    num_chunks = (t_count + pad) // chunk

    init = (
        jnp.full((n,), jnp.inf, dtype=jnp.float32),  # best t
        jnp.full((n,), -1, dtype=jnp.int32),  # tri id
        jnp.zeros((n,), dtype=jnp.float32),  # u
        jnp.zeros((n,), dtype=jnp.float32),  # v
    )

    o = origin[:, None, :]
    d = direction[:, None, :]

    def body(carry, ci):
        bt, bid, bu, bv = carry
        sl = ci * chunk
        cv0 = jax.lax.dynamic_slice_in_dim(v0, sl, chunk, 0)[None, :, :]
        ce1 = jax.lax.dynamic_slice_in_dim(e1, sl, chunk, 0)[None, :, :]
        ce2 = jax.lax.dynamic_slice_in_dim(e2, sl, chunk, 0)[None, :, :]
        cvalid = jax.lax.dynamic_slice_in_dim(valid_tri, sl, chunk, 0)[None, :]
        t, u, v, hit = ray_triangle(o, d, cv0, ce1, ce2, tmin, tmax)
        hit = hit & cvalid
        t = jnp.where(hit, t, jnp.inf)
        # per-ray argmin across the chunk
        k = jnp.argmin(t, axis=1)
        rows = jnp.arange(n)
        tk = t[rows, k]
        better = tk < bt
        bt = jnp.where(better, tk, bt)
        bid = jnp.where(better, (sl + k).astype(jnp.int32), bid)
        bu = jnp.where(better, u[rows, k], bu)
        bv = jnp.where(better, v[rows, k], bv)
        return (bt, bid, bu, bv), None

    (bt, bid, bu, bv), _ = jax.lax.scan(
        body, init, jnp.arange(num_chunks, dtype=jnp.int32)
    )
    hit = bid >= 0
    return {"t": bt, "tri_id": bid, "u": bu, "v": bv, "hit": hit}


def brute_force_occluded(
    geom: SceneGeometry,
    origin: jnp.ndarray,
    direction: jnp.ndarray,
    tmin: float,
    tmax: float,
    chunk: int = 512,
):
    """Any-hit occlusion with back-face culling (deviceProgram.cu:237 flag).
    Returns (N,) bool."""
    n = origin.shape[0]
    t_count = geom.num_triangles
    pad = (-t_count) % chunk
    v0 = jnp.pad(geom.tri_v0, ((0, pad), (0, 0)))
    e1 = jnp.pad(geom.tri_e1, ((0, pad), (0, 0)))
    e2 = jnp.pad(geom.tri_e2, ((0, pad), (0, 0)), constant_values=0.0)
    valid_tri = jnp.arange(t_count + pad) < t_count
    num_chunks = (t_count + pad) // chunk
    o = origin[:, None, :]
    d = direction[:, None, :]

    def body(occ, ci):
        sl = ci * chunk
        cv0 = jax.lax.dynamic_slice_in_dim(v0, sl, chunk, 0)[None, :, :]
        ce1 = jax.lax.dynamic_slice_in_dim(e1, sl, chunk, 0)[None, :, :]
        ce2 = jax.lax.dynamic_slice_in_dim(e2, sl, chunk, 0)[None, :, :]
        cvalid = jax.lax.dynamic_slice_in_dim(valid_tri, sl, chunk, 0)[None, :]
        _, _, _, hit = ray_triangle(o, d, cv0, ce1, ce2, tmin, tmax, cull_backface=True)
        return occ | jnp.any(hit & cvalid, axis=1), None

    occ, _ = jax.lax.scan(
        body, jnp.zeros((n,), dtype=bool), jnp.arange(num_chunks, dtype=jnp.int32)
    )
    return occ
