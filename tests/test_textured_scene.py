"""Textured benchmark scene (box_city_textured): pins that the bench's
textured datapoint really exercises the texel-gather path the reference
always pays (deviceProgram.cu:655-670 tex2D in every closest-hit shade).

- geometry is bit-identical to the untextured box_city (same tris/BVH);
- has_textures flips the integrator's static albedo gate ON;
- the textured render differs from the untextured one on hit pixels but
  agrees on pure-sky pixels (textures only feed albedo).
"""

import dataclasses

import numpy as np
import pytest

from fovpathtracing_optixcodelatest_tpu.config import (
    FoveationSchedule,
    RenderConfig,
)


@pytest.fixture(autouse=True)
def _no_persistent_cache():
    """The persistent-compile-cache GET/PUT for this module's frame
    executable crashes the interpreter (segfault/abort inside jax's
    zstandard codepath) when it lands ~150 tests into a full-suite run —
    four times reproduced at the same position (fresh cache dir included),
    never standalone. jax_enable_compilation_cache=False did NOT stop the
    cache lookup mid-process, so unset the cache DIR itself — no cache IO
    at all for this module (the tiny renders compile in seconds)."""
    import jax

    jax.config.update("jax_compilation_cache_dir", None)
    yield
    jax.config.update("jax_compilation_cache_dir", "/tmp/fovtpu_jax_cache")
from fovpathtracing_optixcodelatest_tpu.models import scenes
from fovpathtracing_optixcodelatest_tpu.models.probe import constant_probe
from fovpathtracing_optixcodelatest_tpu.render.renderer import Renderer


def test_box_city_textured_geometry_and_images():
    meshes_t, cam_t, images = scenes.box_city_textured(n=3, seed=5)
    meshes_u, cam_u = scenes.box_city(n=3, seed=5)
    assert cam_t == cam_u
    assert len(meshes_t) == len(meshes_u)
    for mt, mu in zip(meshes_t, meshes_u):
        np.testing.assert_array_equal(mt.vertex, mu.vertex)
        np.testing.assert_array_equal(mt.index, mu.index)
        assert mt.diffuse_texture_id >= 0
        assert mt.texcoord.shape == (mt.vertex.shape[0], 2)
        assert mt.texcoord.max() > 1.0  # tiling wraps
    assert len(images) == 8
    for im in images:
        assert im.shape == (256, 256, 3) and im.dtype == np.float32
        assert 0.0 <= im.min() and im.max() <= 1.0
        assert im.std() > 0.01  # actually patterned


def test_textured_render_differs_only_on_geometry():
    config = RenderConfig(width=48, height=32, max_depth=3)
    schedule = FoveationSchedule.uniform(spp=2)
    probe = constant_probe((1.5, 1.5, 1.5))

    meshes_t, cam, images = scenes.box_city_textured(n=3, seed=5)
    rt = Renderer(meshes=meshes_t, config=config, schedule=schedule,
                  probe=probe, texture_images=images)
    assert rt.scene.geom.has_textures
    rt.set_camera(dataclasses.replace(cam, aspect=48 / 32))
    ft = rt.render()

    meshes_u, _cam = scenes.box_city(n=3, seed=5)
    ru = Renderer(meshes=meshes_u, config=config, schedule=schedule,
                  probe=probe)
    assert not ru.scene.geom.has_textures
    ru.set_camera(dataclasses.replace(cam, aspect=48 / 32))
    fu = ru.render()

    diff = np.any(ft != fu, axis=-1)
    assert diff.sum() > 50  # textures visibly change hit pixels

    # primary-miss pixels (pure sky) are identical: textures touch albedo
    # only. Find them via a 1-bounce depth render against the same camera.
    cfg1 = dataclasses.replace(config, max_depth=1)
    r1 = Renderer(meshes=meshes_u, config=cfg1, schedule=schedule, probe=probe)
    r1.set_camera(dataclasses.replace(cam, aspect=48 / 32))
    f1 = r1.render()
    del f1
    # high row indices look at open sky in this camera framing (the V-up
    # convention puts +y at high row index — see test_raycast_04_twin)
    sky_rows = slice(-4, None)
    np.testing.assert_array_equal(ft[sky_rows], fu[sky_rows])


def test_quad_rows_match_four_tap():
    """The packed 2x2 quad-row bilinear path (round 5, one row gather) must
    return BIT-IDENTICAL samples to the 4-tap gather path."""
    import dataclasses as _dc

    import jax.numpy as jnp
    import numpy as np

    from fovpathtracing_optixcodelatest_tpu.models.texture import (
        build_texture_array,
        checkerboard,
        sample_bilinear_wrap,
    )

    rng = np.random.default_rng(3)
    imgs = [
        checkerboard(32, 4),
        rng.uniform(0, 1, (17, 23, 3)).astype(np.float32),
        rng.uniform(0, 1, (8, 40, 3)).astype(np.float32),
    ]
    tex = build_texture_array(imgs)
    assert tex.quad is not None
    n = 4096
    ids = jnp.asarray(rng.integers(0, 3, n).astype(np.int32))
    uv = jnp.asarray(rng.uniform(-2, 3, (n, 2)).astype(np.float32))
    got = sample_bilinear_wrap(tex, ids, uv)
    tex4 = _dc.replace(tex, quad=None)
    want = sample_bilinear_wrap(tex4, ids, uv)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
