"""Tests for config, materials, camera, textures, tone mapping."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from fovpathtracing_optixcodelatest_tpu.config import FoveationSchedule, RenderConfig
from fovpathtracing_optixcodelatest_tpu.models.camera import Camera, Trackball
from fovpathtracing_optixcodelatest_tpu.models.material import (
    MATERIAL_FLAG_SHADOW_CATCHER,
    Material,
    MaterialTable,
)
from fovpathtracing_optixcodelatest_tpu.models.mesh import (
    flatten_meshes,
    host_triangles,
    make_box,
    make_icosphere,
    make_quad,
)
from fovpathtracing_optixcodelatest_tpu.models.texture import (
    build_texture_array,
    checkerboard,
    sample_bilinear_wrap,
)
from fovpathtracing_optixcodelatest_tpu.ops import tonemap


def test_reference_foveation_schedule():
    s = FoveationSchedule.reference_32_16_8()
    assert len(s.passes) == 3
    periphery, annulus, fovea = s.passes
    assert (periphery.factor, periphery.spp) == (4, 8)
    assert (annulus.factor, annulus.spp) == (2, 16)
    assert (fovea.factor, fovea.spp) == (1, 32)
    assert annulus.r_inner == 74.0 and annulus.r_outer == 243.0
    assert fovea.r_outer == 75.0
    assert annulus.launch_w == 243 and fovea.launch_w == 150
    # schedule must be hashable (static jit arg)
    hash(s)
    hash(RenderConfig())


def test_material_ior_inference():
    m = Material(eta=0.0, specular=0.5)
    # 2/(1-sqrt(0.08*0.5)) - 1 (Material.h:40-46)
    expected = 2.0 / (1.0 - np.sqrt(0.04)) - 1.0
    np.testing.assert_allclose(m.index_of_refraction(), expected, rtol=1e-6)
    assert Material(eta=1.33).index_of_refraction() == 1.33


def test_material_table_gather():
    mats = [
        Material(color=(1, 0, 0), roughness=0.1),
        Material(color=(0, 1, 0), roughness=0.9, flags=MATERIAL_FLAG_SHADOW_CATCHER),
    ]
    table = MaterialTable.from_materials(mats)
    per_ray = table.gather(jnp.asarray([1, 0, 1], dtype=jnp.int32))
    np.testing.assert_allclose(
        np.asarray(per_ray.color), [[0, 1, 0], [1, 0, 0], [0, 1, 0]]
    )
    np.testing.assert_allclose(np.asarray(per_ray.roughness), [0.9, 0.1, 0.9])
    np.testing.assert_array_equal(np.asarray(per_ray.flags), [1, 0, 1])


def test_camera_uvw_frame():
    """Camera.cpp:34-45: |V| = |W| tan(fov/2), |U| = |V|·aspect, U⊥V⊥W."""
    cam = Camera(eye=(0, 0, 5), lookat=(0, 0, 0), up=(0, 1, 0), fov_y=90.0, aspect=2.0)
    u, v, w = cam.uvw_frame()
    np.testing.assert_allclose(w, [0, 0, -5], atol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(v), 5.0, rtol=1e-6)  # tan(45°)=1
    np.testing.assert_allclose(np.linalg.norm(u), 10.0, rtol=1e-6)
    assert abs(np.dot(u, v)) < 1e-5 and abs(np.dot(u, w)) < 1e-5
    # V points along +up for this geometry
    assert v[1] > 0


def test_trackball_orbit_preserves_radius():
    cam = Camera(eye=(10, 0, 0), lookat=(0, 0, 0))
    tb = Trackball(camera=cam)
    tb.reinitialize_from_camera()
    cam2 = tb.orbit(25.0, -10.0)
    r = np.linalg.norm(np.asarray(cam2.eye) - np.asarray(cam2.lookat))
    np.testing.assert_allclose(r, 10.0, rtol=1e-6)
    cam3 = tb.zoom(+1)
    r3 = np.linalg.norm(np.asarray(cam3.eye) - np.asarray(cam3.lookat))
    np.testing.assert_allclose(r3, 9.0, rtol=1e-6)


def test_box_geometry():
    mesh = make_box((1, 2, 3), (0.5, 1.0, 2.0), Material())
    assert mesh.num_triangles == 12
    assert mesh.vertex.shape == (36, 3)
    lo, hi = mesh.vertex.min(axis=0), mesh.vertex.max(axis=0)
    np.testing.assert_allclose(lo, [0.5, 1.0, 1.0])
    np.testing.assert_allclose(hi, [1.5, 3.0, 5.0])


def test_icosphere_counts_and_radius():
    mesh = make_icosphere((0, 0, 0), 2.0, 2, Material())
    assert mesh.num_triangles == 20 * 16
    np.testing.assert_allclose(
        np.linalg.norm(mesh.vertex, axis=1), 2.0, rtol=1e-5
    )


def test_flatten_meshes():
    meshes = [
        make_box((0, 0, 0), (1, 1, 1), Material(color=(1, 0, 0))),
        make_quad((0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0), Material(color=(0, 1, 0)), texture_id=0),
    ]
    geom, table = flatten_meshes(meshes)
    assert geom.num_triangles == 14
    assert table.num_materials == 2
    np.testing.assert_array_equal(
        np.asarray(geom.tri_material), [0] * 12 + [1] * 2
    )
    np.testing.assert_array_equal(
        np.asarray(geom.tri_texture), [-1] * 12 + [0] * 2
    )
    tris = host_triangles(meshes)
    assert tris.shape == (14, 3, 3)
    # e1/e2 consistency
    np.testing.assert_allclose(
        np.asarray(geom.tri_e1), tris[:, 1] - tris[:, 0], atol=1e-6
    )
    # geometric normal of the quad is +z
    n = np.asarray(geom.geometric_normal(jnp.asarray([12])))
    np.testing.assert_allclose(n[0], [0, 0, 1], atol=1e-6)


def test_texture_bilinear_wrap():
    img = checkerboard(size=8, squares=2, c0=(1, 1, 1), c1=(0, 0, 0))
    tex = build_texture_array([img])
    ids = jnp.zeros((3,), dtype=jnp.int32)
    # texel centers reproduce exact values
    uv = jnp.asarray([[0.5 / 8 + 0.25, 0.5 / 8], [0.5 / 8, 0.5 / 8], [0.5 / 8 + 0.5, 0.5 / 8]])
    c = np.asarray(sample_bilinear_wrap(tex, ids, uv))
    np.testing.assert_allclose(c[1], img[0, 0], atol=1e-5)
    # halfway between two texels of different color = average
    uv_mid = jnp.asarray([[(0.5 + 1.5) / 2 / 8, 3.5 / 8 / 1]], dtype=jnp.float32)
    # wrap: u = -0.5/8 should equal u = 7.5/8 fetch
    uv_a = jnp.asarray([[-0.5 / 8, 0.5 / 8]], dtype=jnp.float32)
    uv_b = jnp.asarray([[7.5 / 8, 0.5 / 8]], dtype=jnp.float32)
    ca = np.asarray(sample_bilinear_wrap(tex, ids[:1], uv_a))
    cb = np.asarray(sample_bilinear_wrap(tex, ids[:1], uv_b))
    np.testing.assert_allclose(ca, cb, atol=1e-5)


def test_tonemap_chain():
    c = jnp.asarray([[0.25, 0.5, 1.0]], dtype=jnp.float32)
    exposed = tonemap.exposure_correct(c, 4.0)
    np.testing.assert_allclose(np.asarray(exposed), np.asarray(c) * 16.0)
    tm = tonemap.reinhard(jnp.asarray([[1.0, 1.0, 1.0]]), white=1.0)
    np.testing.assert_allclose(np.asarray(tm), 0.5, atol=1e-6)
    # sRGB: linear 1 → 255, linear 0 → 0, toe region is linear*12.92
    u8 = np.asarray(tonemap.make_color(jnp.asarray([[1.0, 0.0, 0.002]])))
    assert u8[0, 0] == 255 and u8[0, 1] == 0
    np.testing.assert_allclose(u8[0, 2], int(0.002 * 12.92 * 256), atol=1)


def test_postprocess_matches_manual():
    c = jnp.asarray([[0.01, 0.02, 0.03]], dtype=jnp.float32)
    out = tonemap.postprocess(c, exposure_stops=4.0, white=1.0)
    manual = tonemap.make_color(tonemap.reinhard(c * 16.0, 1.0))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(manual))


def test_foveation_sweep_schedules():
    s = FoveationSchedule.sweep(32, 2, 1)
    assert [p.spp for p in s.passes] == [1, 2, 32]
    u = FoveationSchedule.uniform(4)
    assert len(u.passes) == 1 and u.passes[0].spp == 4
    assert dataclasses.asdict(u.passes[0])["factor"] == 1


def test_trackball_eye_fixed_mode():
    """Trackball.h:74-78 ViewMode parity: eye_fixed pivots the LOOKAT about a
    fixed eye (first-person look-around); lookat_fixed orbits the EYE. Both
    preserve the eye-lookat distance."""
    import dataclasses as _dc

    from fovpathtracing_optixcodelatest_tpu.models.camera import (
        Camera,
        Trackball,
    )

    cam = Camera(eye=(3.0, 1.0, 0.0), lookat=(0.0, 0.0, 0.0))
    r0 = np.linalg.norm(np.asarray(cam.eye) - np.asarray(cam.lookat))

    tb = Trackball(camera=cam, view_mode="eye_fixed")
    tb.reinitialize_from_camera()
    c2 = tb.orbit(40.0, -25.0)
    assert c2.eye == cam.eye  # eye pinned
    assert c2.lookat != cam.lookat  # view direction moved
    r2 = np.linalg.norm(np.asarray(c2.eye) - np.asarray(c2.lookat))
    np.testing.assert_allclose(r2, r0, rtol=1e-6)

    tb3 = Trackball(camera=cam, view_mode="lookat_fixed")
    tb3.reinitialize_from_camera()
    c3 = tb3.orbit(40.0, -25.0)
    assert c3.lookat == cam.lookat  # pivot pinned
    assert c3.eye != cam.eye
    r3 = np.linalg.norm(np.asarray(c3.eye) - np.asarray(c3.lookat))
    np.testing.assert_allclose(r3, r0, rtol=1e-6)
    # same deltas, complementary modes: the new view DIRECTION matches
    d_eye_fixed = np.asarray(c2.lookat) - np.asarray(c2.eye)
    d_look_fixed = np.asarray(c3.lookat) - np.asarray(c3.eye)
    np.testing.assert_allclose(
        d_eye_fixed / np.linalg.norm(d_eye_fixed),
        d_look_fixed / np.linalg.norm(d_look_fixed),
        atol=1e-6,
    )


def test_trackball_zoom_respects_view_mode():
    """zoom in eye_fixed mode moves the LOOKAT (eye stays pinned, like
    orbit); lookat_fixed moves the EYE along the view ray."""
    from fovpathtracing_optixcodelatest_tpu.models.camera import (
        Camera,
        Trackball,
    )

    cam = Camera(eye=(3.0, 1.0, 0.0), lookat=(0.0, 0.0, 0.0))

    tb = Trackball(camera=cam, view_mode="eye_fixed")
    tb.reinitialize_from_camera()
    c2 = tb.zoom(+1)
    assert c2.eye == cam.eye
    assert c2.lookat != cam.lookat

    tb3 = Trackball(camera=cam, view_mode="lookat_fixed")
    tb3.reinitialize_from_camera()
    c3 = tb3.zoom(+1)
    assert c3.lookat == cam.lookat
    assert c3.eye != cam.eye
    # zoom-in shrinks the distance by 10% either way
    d2 = np.linalg.norm(np.asarray(c2.eye) - np.asarray(c2.lookat))
    d3 = np.linalg.norm(np.asarray(c3.eye) - np.asarray(c3.lookat))
    np.testing.assert_allclose([d2, d3], [0.9 * np.sqrt(10.0)] * 2,
                               rtol=1e-6)
