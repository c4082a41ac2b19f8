"""Procedural test/benchmark scenes.

The reference loads Crytek Sponza / San Miguel / Lost Empire OBJs from absolute
paths outside the repo (main.cpp:195-205) — no assets ship in-tree. These
generators provide deterministic stand-ins at controllable triangle counts:
``cornell`` for golden-image integrator tests, ``box_city`` as the
Sponza-class benchmark scene (closed-ish architecture, heavy occlusion),
``furnace_sphere`` for energy tests.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import numpy as np

from fovpathtracing_optixcodelatest_tpu.models.camera import Camera
from fovpathtracing_optixcodelatest_tpu.models.material import Material
from fovpathtracing_optixcodelatest_tpu.models.mesh import (
    HostMesh,
    make_box,
    make_icosphere,
    make_quad,
)


def _matte(color, roughness=1.0) -> Material:
    """Diffuse-ish material with emission/transmission off (the reference's
    defaults emit white and transmit 0.4 — Material.h:13-38 — which is never
    what a scene wall wants)."""
    return Material(
        color=color, emission=(0.0, 0.0, 0.0), metallic=0.0, specular=0.5,
        specular_tint=0.0, roughness=roughness, transmission=0.0, eta=1.4,
    )


def cornell(sphere_subdiv: int = 2) -> Tuple[List[HostMesh], Camera]:
    """Cornell-style box: white floor/ceiling/back, red/green walls, one
    glossy sphere, one mirror-ish box. Lit by the environment through the open
    front (+z). ~1.4k triangles."""
    s = 2.0
    meshes = [
        make_quad((-s, -s, s), (s, -s, s), (s, -s, -s), (-s, -s, -s), _matte((0.73, 0.73, 0.73))),  # floor
        make_quad((-s, s, -s), (s, s, -s), (s, s, s), (-s, s, s), _matte((0.73, 0.73, 0.73))),  # ceiling
        make_quad((-s, -s, -s), (s, -s, -s), (s, s, -s), (-s, s, -s), _matte((0.73, 0.73, 0.73))),  # back
        make_quad((-s, -s, s), (-s, -s, -s), (-s, s, -s), (-s, s, s), _matte((0.65, 0.05, 0.05))),  # left red
        make_quad((s, -s, -s), (s, -s, s), (s, s, s), (s, s, -s), _matte((0.12, 0.45, 0.15))),  # right green
        make_icosphere((-0.8, -1.2, -0.5), 0.8, sphere_subdiv,
                       Material(color=(0.9, 0.75, 0.4), emission=(0, 0, 0),
                                metallic=0.8, roughness=0.25, specular=1.0,
                                specular_tint=0.0, transmission=0.0, eta=1.5)),
        make_box((1.0, -1.3, 0.6), (0.55, 0.7, 0.55), _matte((0.73, 0.73, 0.73), roughness=0.6)),
    ]
    cam = Camera(eye=(0.0, 0.0, 7.5), lookat=(0.0, 0.0, 0.0), up=(0, 1, 0),
                 fov_y=40.0, aspect=1.0)
    return meshes, cam


def furnace_sphere(subdiv: int = 3) -> Tuple[List[HostMesh], Camera]:
    """A single white diffuse sphere in an empty world — the white-furnace
    setup: under a constant probe L, a perfectly white surface should converge
    toward L (bounded by the 4-bounce cap and the Disney lobes)."""
    mat = Material(
        color=(1.0, 1.0, 1.0), emission=(0, 0, 0), metallic=0.0, specular=0.0,
        specular_tint=0.0, roughness=1.0, transmission=0.0, eta=1.4,
        subsurface=0.0,
    )
    meshes = [make_icosphere((0, 0, 0), 1.0, subdiv, mat)]
    cam = Camera(eye=(0, 0, 4), lookat=(0, 0, 0), fov_y=45.0, aspect=1.0)
    return meshes, cam


def box_city_fast(
    n: int = 400, seed: int = 0, spread: float = 40.0, palette: int = 8
) -> Tuple[List[HostMesh], Camera]:
    """Vectorized box_city for large triangle counts (n=900 ⇒ ~9.7M tris):
    all boxes of a palette color are batched into ONE HostMesh with fully
    broadcast vertex math — python-loop scene assembly took ~90 s at 10M
    tris, this takes ~1 s."""
    rng = np.random.default_rng(seed)
    cell = 2 * spread / n
    ii, jj = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    x = (-spread + cell * (ii + 0.5) + rng.uniform(-0.2, 0.2, (n, n)) * cell).ravel()
    z = (-spread + cell * (jj + 0.5) + rng.uniform(-0.2, 0.2, (n, n)) * cell).ravel()
    height = rng.uniform(1.0, 8.0, n * n)
    half = rng.uniform(0.25, 0.45, n * n) * cell
    color_id = rng.integers(0, palette, n * n)
    colors = rng.uniform(0.2, 0.9, (palette, 3))

    # unit box template (make_box at origin, extent 1): 36 verts, 12 tris
    unit = make_box((0, 0, 0), (1, 1, 1), _matte((1, 1, 1)))
    uv = unit.vertex  # (36, 3)
    un = unit.normal
    meshes = [
        make_box((0, -1.0, 0), (spread, 1.0, spread), _matte((0.6, 0.6, 0.6)))
    ]
    for c in range(palette):
        sel = np.nonzero(color_id == c)[0]
        if not len(sel):
            continue
        k = len(sel)
        ext = np.stack([half[sel], height[sel], half[sel]], axis=1)  # (k, 3)
        pos = np.stack([x[sel], height[sel] - 1.0, z[sel]], axis=1)
        verts = uv[None, :, :] * ext[:, None, :] + pos[:, None, :]  # (k, 36, 3)
        normals = np.broadcast_to(un[None], (k, 36, 3))
        index = (
            unit.index[None, :, :] + (np.arange(k) * 36)[:, None, None]
        )  # (k, 12, 3)
        meshes.append(
            HostMesh(
                vertex=verts.reshape(-1, 3).astype(np.float32),
                index=index.reshape(-1, 3).astype(np.int32),
                normal=normals.reshape(-1, 3).astype(np.float32),
                texcoord=np.zeros((k * 36, 2), dtype=np.float32),
                material=_matte(tuple(colors[c])),
            )
        )
    cam = Camera(
        eye=(-spread * 1.2, spread * 0.45, spread * 1.2),
        lookat=(0.0, 0.0, 0.0), up=(0, 1, 0), fov_y=45.0, aspect=1.0,
    )
    return meshes, cam


def _procedural_texture(hue: np.ndarray, kind: int, res: int = 256) -> np.ndarray:
    """Deterministic (res, res, 3) float32 texture: 0 = brick courses,
    1 = checker, 2 = speckle noise — stand-ins for the reference's diffuse
    maps (Model.cpp:87-136 loadTexture), which ship outside its repo."""
    v = np.linspace(0.0, 1.0, res, endpoint=False)
    uu, vv = np.meshgrid(v, v, indexing="xy")
    if kind == 0:  # brick: offset courses with mortar lines
        row = np.floor(vv * 8.0)
        uo = uu + 0.5 * (row % 2)
        mortar = ((vv * 8.0) % 1.0 < 0.08) | ((uo * 4.0) % 1.0 < 0.05)
        base = np.where(mortar, 0.35, 1.0)
    elif kind == 1:  # checker
        base = 0.45 + 0.55 * (
            (np.floor(uu * 8.0) + np.floor(vv * 8.0)) % 2
        )
    else:  # speckle: deterministic hash noise
        g = np.sin((np.floor(uu * 64) * 127.1 + np.floor(vv * 64) * 311.7))
        base = 0.6 + 0.4 * ((g * 43758.5453) % 1.0)
    return (base[:, :, None] * hue[None, None, :]).astype(np.float32)


def box_city_textured(
    n: int = 24, seed: int = 0, spread: float = 40.0, palette: int = 8
) -> Tuple[List[HostMesh], Camera, List[np.ndarray]]:
    """box_city with per-face UV-mapped procedural diffuse textures — the
    textured-benchmark twin (all three reference benchmark OBJs are textured;
    deviceProgram.cu:655-670 tex2D fetch). Returns (meshes, camera, images)
    for build_scene(texture_images=...). Geometry is IDENTICAL to
    box_city(n, seed, spread); only texcoords/texture ids differ."""
    meshes, cam = box_city(n=n, seed=seed, spread=spread)
    rng = np.random.default_rng(seed + 7)
    hues = rng.uniform(0.4, 1.0, (palette, 3)).astype(np.float32)
    images = [
        _procedural_texture(hues[k], kind=k % 3) for k in range(palette)
    ]
    # unit-box face UVs: each face of make_box's 36-vertex layout spans
    # [0,tile]² so the bilinear-wrap path really wraps
    face_uv = np.asarray(
        [[0, 0], [1, 0], [1, 1], [0, 0], [1, 1], [0, 1]], dtype=np.float32
    )
    out = []
    for i, m in enumerate(meshes):
        tile = 4.0 if i == 0 else 2.0  # ground tiles more
        tc = np.tile(face_uv, (m.vertex.shape[0] // 6, 1)) * tile
        out.append(
            dataclasses.replace(
                m,
                texcoord=tc.astype(np.float32),
                diffuse_texture_id=int(rng.integers(0, palette)),
            )
        )
    return out, cam, images


def box_city(
    n: int = 12, seed: int = 0, spread: float = 40.0
) -> Tuple[List[HostMesh], Camera]:
    """An n×n grid of boxes of random height on a ground slab — the
    Sponza-class occlusion benchmark (12 tris per box ⇒ n²·12+12 tris; raise n
    for San-Miguel-class counts)."""
    rng = np.random.default_rng(seed)
    meshes = [
        make_box((0, -1.0, 0), (spread, 1.0, spread), _matte((0.6, 0.6, 0.6)))
    ]
    cell = 2 * spread / n
    for i in range(n):
        for j in range(n):
            x = -spread + cell * (i + 0.5) + rng.uniform(-0.2, 0.2) * cell
            z = -spread + cell * (j + 0.5) + rng.uniform(-0.2, 0.2) * cell
            height = rng.uniform(1.0, 8.0)
            half = rng.uniform(0.25, 0.45) * cell
            color = tuple(rng.uniform(0.2, 0.9, 3))
            meshes.append(
                make_box((x, height - 1.0, z), (half, height, half),
                         _matte(color, roughness=rng.uniform(0.3, 1.0)))
            )
    cam = Camera(
        eye=(-spread * 1.2, spread * 0.45, spread * 1.2),
        lookat=(0.0, 0.0, 0.0),
        up=(0, 1, 0),
        fov_y=45.0,
        aspect=1.0,
    )
    return meshes, cam
