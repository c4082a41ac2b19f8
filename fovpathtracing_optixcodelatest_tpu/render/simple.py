"""Simple renderers — the tutorial-ladder capability checkpoints.

Twins of the incremental samples the reference author used as their de-facto
integration tests (SURVEY.md §2.4):

- ``solid_color``  — 01HelloRaytracing (raygen writes one color,
  draw_solid_color.cu:10-18).
- ``test_pattern`` — 02/03HelloRaytracing (procedural pattern from pixel id).
- ``raycast``      — 04HelloRaytracing: one primary ray per pixel, shading
  normal with geometric-normal faceforward (deviceProgram.cu:86-104), diffuse
  texture modulation (:108-117), one shadow ray toward a point light with
  0..1 tmax over the light distance (:121-153), and the exact shading formula
  ``(.1 + (.2 + .8·vis) · cosDN) · diffuse`` with
  ``cosDN = .1 + .8·|dot(rayDir, Ns)|`` (:158-165); misses are black.

These run the full batched pipeline (camera rays → wide-BVH traversal →
vectorized shading) with none of the path-tracing machinery — the oracle
stack for golden-image tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from fovpathtracing_optixcodelatest_tpu.models.camera import CameraParams
from fovpathtracing_optixcodelatest_tpu.models.scene import Scene
from fovpathtracing_optixcodelatest_tpu.models.texture import sample_bilinear_wrap
from fovpathtracing_optixcodelatest_tpu.ops import traverse8
from fovpathtracing_optixcodelatest_tpu.ops.sampling import dot, normalize


def solid_color(width: int, height: int, color=(0.0, 0.3, 0.8)):
    """01 twin: constant-color frame."""
    c = jnp.asarray(color, dtype=jnp.float32)
    frame = jnp.broadcast_to(c, (height, width, 3))
    return (jnp.clip(frame, 0, 1) * 255.99).astype(jnp.uint8)


def test_pattern(width: int, height: int):
    """02 twin: deterministic per-pixel test pattern."""
    x = jnp.arange(width)[None, :, None]
    y = jnp.arange(height)[:, None, None]
    r = ((x // 8) % 2) ^ ((y // 8) % 2)
    g = (x % 256) / 255.0
    b = (y % 256) / 255.0
    frame = jnp.concatenate(
        [r.astype(jnp.float32), jnp.broadcast_to(g, r.shape),
         jnp.broadcast_to(b, r.shape)], axis=-1
    )
    return (jnp.clip(frame, 0, 1) * 255.99).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("width", "height"))
def raycast(
    scene: Scene,
    camera: CameraParams,
    width: int,
    height: int,
    light_pos=(-907.108, 2205.875, -400.0267),
):
    """04 twin: primary raycast + 1 shadow ray + Lambert-ish shading.

    Pixel-center rays in the 04 camera convention: dir = normalize(W +
    (sx-.5)·U + (sy-.5)·V) with screen ∈ [0,1]² (deviceProgram.cu:203-214 —
    note the 0.5-offset differs from PT_sv5_'s 2x-1 NDC).
    Returns (H, W, 3) uint8.
    """
    n = width * height
    x = jnp.arange(width, dtype=jnp.float32)
    y = jnp.arange(height, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(x, y)
    sx = ((gx + 0.5) / width).reshape(-1)
    sy = ((gy + 0.5) / height).reshape(-1)
    direction = normalize(
        camera.w[None, :]
        + (sx - 0.5)[:, None] * camera.u[None, :]
        + (sy - 0.5)[:, None] * camera.v[None, :]
    )
    origin = jnp.broadcast_to(camera.eye[None, :], direction.shape)

    hit = traverse8.closest_hit(scene.bvh, origin, direction, 0.0, 1e20)
    hm = hit["hit"]
    tri = jnp.maximum(hit["tri_id"], 0)
    p = origin + hit["t"][:, None] * direction

    # normals: geometric with faceforward, shading normal flipped to agree
    ng = scene.geom.geometric_normal(tri)
    ng = jnp.where(dot(direction, ng)[:, None] > 0.0, -ng, ng)
    bu = hit["u"][:, None]
    bv = hit["v"][:, None]
    ns_raw = (
        (1.0 - bu - bv) * jnp.take(scene.geom.tri_n0, tri, axis=0)
        + bu * jnp.take(scene.geom.tri_n1, tri, axis=0)
        + bv * jnp.take(scene.geom.tri_n2, tri, axis=0)
    )
    has_ns = jnp.take(scene.geom.has_shading_normals, tri)
    ns = jnp.where(has_ns[:, None], ns_raw, ng)
    ns = jnp.where(dot(ng, ns)[:, None] < 0.0, ns - 2.0 * dot(ng, ns)[:, None] * ng, ns)
    ns = normalize(ns)

    # diffuse color × texture
    mat = scene.materials.gather(jnp.take(scene.geom.tri_material, tri))
    uv = (
        (1.0 - bu - bv) * jnp.take(scene.geom.tri_uv0, tri, axis=0)
        + bu * jnp.take(scene.geom.tri_uv1, tri, axis=0)
        + bv * jnp.take(scene.geom.tri_uv2, tri, axis=0)
    )
    tex_id = jnp.take(scene.geom.tri_texture, tri)
    tex = sample_bilinear_wrap(scene.textures, tex_id, uv)
    diffuse = mat.color * jnp.where(
        (tex_id >= 0)[:, None], tex, jnp.ones_like(tex)
    )

    # shadow ray toward the point light over normalized [0,1] ray extent
    light = jnp.asarray(light_pos, dtype=jnp.float32)
    light_dir = light[None, :] - p
    shadow_origin = p + 1e-3 * ng
    occ = traverse8.occluded(
        scene.bvh, shadow_origin, light_dir, 1e-3, 1.0 - 1e-3, active=hm,
        cull_backface=False,
    )
    visibility = jnp.where(occ, 0.0, 1.0)

    cos_dn = 0.1 + 0.8 * jnp.abs(dot(direction, ns))
    color = (0.1 + (0.2 + 0.8 * visibility) * cos_dn)[:, None] * diffuse
    color = jnp.where(hm[:, None], color, 0.0)
    frame = jnp.clip(color, 0.0, 1.0).reshape(height, width, 3)
    return (frame * 255.99).astype(jnp.uint8)
