"""Tests for tutorial-ladder renderers, denoiser, stereo, AOVs, CLI app."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from fovpathtracing_optixcodelatest_tpu.config import FoveationSchedule, RenderConfig
from fovpathtracing_optixcodelatest_tpu.models import scenes
from fovpathtracing_optixcodelatest_tpu.models.camera import Camera
from fovpathtracing_optixcodelatest_tpu.models.material import Material
from fovpathtracing_optixcodelatest_tpu.models.mesh import make_quad
from fovpathtracing_optixcodelatest_tpu.models.probe import constant_probe
from fovpathtracing_optixcodelatest_tpu.models.scene import build_scene
from fovpathtracing_optixcodelatest_tpu.models.texture import checkerboard
from fovpathtracing_optixcodelatest_tpu.render import simple


def test_solid_color_and_pattern():
    f = np.asarray(simple.solid_color(16, 8, (1.0, 0.0, 0.0)))
    assert f.shape == (8, 16, 3) and (f[..., 0] == 255).all() and (f[..., 1] == 0).all()
    p = np.asarray(simple.test_pattern(32, 16))
    assert p.shape == (16, 32, 3)
    assert len(np.unique(p[..., 0])) == 2  # checker in red channel


def test_raycast_04_twin():
    """04 twin: floor quad + wall; light above; shadow behind the wall."""
    floor = make_quad((-5, 0, 5), (5, 0, 5), (5, 0, -5), (-5, 0, -5),
                      Material(color=(1.0, 1.0, 1.0), emission=(0, 0, 0)))
    wall = make_quad((-1, 0, 0), (1, 0, 0), (1, 2, 0), (-1, 2, 0),
                     Material(color=(1.0, 0.2, 0.2), emission=(0, 0, 0)),
                     texture_id=0)
    scene = build_scene([floor, wall], texture_images=[checkerboard(16, 4)])
    cam = Camera(eye=(0, 3, 8), lookat=(0, 0.5, 0), fov_y=50.0, aspect=4 / 3)
    frame = np.asarray(
        simple.raycast(scene, cam.device_params(), 64, 48,
                       light_pos=(0.0, 10.0, 2.0))
    )
    assert frame.shape == (48, 64, 3)
    assert frame.max() > 60  # lit geometry visible
    # sky rows (V-up convention puts +y at high row index) are black
    assert (frame[-1] == 0).all()
    # the white floor shows two shading levels: lit vs wall-shadowed
    # (visibility flips the .2+.8*vis factor, deviceProgram.cu:158-165)
    r, g, b = frame[..., 0].astype(int), frame[..., 1].astype(int), frame[..., 2].astype(int)
    floor = (abs(r - g) < 3) & (abs(g - b) < 3) & (r > 10)
    vals = r[floor].astype(float)
    assert len(vals) > 100
    assert np.percentile(vals, 95) / max(np.percentile(vals, 5), 1.0) > 1.5
    # the textured red wall is visible (red-dominant pixels)
    assert ((r > g + 30) & (r > 20)).sum() > 20


def test_denoiser_reduces_noise_preserves_edges():
    from fovpathtracing_optixcodelatest_tpu.ops.denoise import atrous_denoise

    rng = np.random.default_rng(0)
    h = w = 48
    clean = np.zeros((h, w, 3), np.float32)
    clean[:, : w // 2] = 0.2
    clean[:, w // 2 :] = 0.8
    normal = np.zeros((h, w, 3), np.float32)
    normal[:, : w // 2, 2] = 1.0
    normal[:, w // 2 :, 0] = 1.0
    albedo = clean.copy()
    noisy = clean + rng.normal(0, 0.1, clean.shape).astype(np.float32)
    out = np.asarray(
        atrous_denoise(jnp.asarray(noisy), jnp.asarray(normal), jnp.asarray(albedo))
    )
    err_noisy = np.abs(noisy - clean).mean()
    err_out = np.abs(out - clean).mean()
    assert err_out < 0.4 * err_noisy  # big variance reduction
    # edge preserved: the two halves stay distinct
    assert abs(out[:, : w // 2].mean() - 0.2) < 0.05
    assert abs(out[:, w // 2 :].mean() - 0.8) < 0.05


def test_render_frame_aov():
    from fovpathtracing_optixcodelatest_tpu.render import film
    from fovpathtracing_optixcodelatest_tpu.render.renderer import render_frame_aov

    meshes, cam = scenes.cornell(sphere_subdiv=1)
    scene = build_scene(meshes, probe=constant_probe((2.0, 2.0, 2.0)))
    cfg = RenderConfig(width=32, height=24)
    sched = FoveationSchedule.uniform(2)
    camp = dataclasses.replace(cam, aspect=32 / 24).device_params()
    pad = film.schedule_padding(sched, 32, 24)
    canvas = film.new_canvas(32, 24, pad)
    _, frame, aovs, _ = render_frame_aov(
        scene, camp, jnp.asarray(16, jnp.int32), jnp.asarray(12, jnp.int32),
        jnp.asarray(0, jnp.int32), canvas, jax.random.PRNGKey(0), cfg, sched,
    )
    assert aovs["normal"].shape == (24, 32, 3)
    assert aovs["albedo"].shape == (24, 32, 3)
    n = np.asarray(aovs["normal"])
    # normals are spp-averaged (deviceProgram.cu:541-543): interior pixels
    # where both samples hit the same surface have ~unit length; silhouette
    # pixels mix normals and shorten. All must stay <= 1.
    lens = np.linalg.norm(n, axis=-1)
    assert (lens <= 1.01).all()
    hit = lens > 0.1
    assert (lens[hit] > 0.95).mean() > 0.5
    a = np.asarray(aovs["albedo"])
    assert a.max() > 0.5  # white walls visible in albedo


def test_stereo_renderer():
    from fovpathtracing_optixcodelatest_tpu.parallel.stereo import (
        StereoRenderer,
        camera_from_fov_angles,
        eye_cameras_from_pose,
    )

    meshes, cam = scenes.cornell(sphere_subdiv=1)
    scene = build_scene(meshes, probe=constant_probe((2.5, 2.5, 2.5)))
    cfg = RenderConfig(width=32, height=32)
    sr = StereoRenderer(scene=scene, config=cfg,
                        schedule=FoveationSchedule.uniform(1))
    left, right = eye_cameras_from_pose(
        position=cam.eye, forward=np.subtract(cam.lookat, cam.eye),
        ipd=0.4, fov_y=40.0,
    )
    frames = sr.render(left, right)
    assert frames.shape == (2, 32, 32, 3)
    # eyes see (slightly) different images
    assert (frames[0] != frames[1]).mean() > 0.01
    # asymmetric-fov camera builds and is finite
    cp = camera_from_fov_angles(
        (0, 0, 5), (0, 0, -1), (0, 1, 0), -0.6, 0.4, 0.5, -0.5
    )
    assert np.isfinite(np.asarray(cp.w)).all()


def test_cli_app_smoke(tmp_path):
    from fovpathtracing_optixcodelatest_tpu.apps.main import main

    out = tmp_path / "f.png"
    tsv = tmp_path / "t.tsv"
    ck = tmp_path / "c.npz"
    rc = main([
        "--scene", "cornell", "--width", "32", "--height", "24",
        "--frames", "2", "--schedule", "uniform:1",
        "--out", str(out), "--tsv", str(tsv), "--checkpoint", str(ck),
        "--gaze-mode", "orbit", "--camera-mode", "per_frame",
    ])
    assert rc == 0
    assert out.exists() and tsv.exists() and ck.exists()
    from fovpathtracing_optixcodelatest_tpu.utils.image import load_png

    img = load_png(str(out))
    assert img.shape == (24, 32, 3)


def test_cli_resume(tmp_path):
    from fovpathtracing_optixcodelatest_tpu.apps.main import main

    ck = tmp_path / "c.npz"
    assert main([
        "--scene", "furnace", "--width", "16", "--height", "16",
        "--frames", "1", "--schedule", "uniform:1", "--checkpoint", str(ck),
    ]) == 0
    assert main([
        "--scene", "furnace", "--width", "16", "--height", "16",
        "--frames", "1", "--schedule", "uniform:1", "--resume", str(ck),
    ]) == 0
