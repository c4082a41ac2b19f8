"""Tests for OBJ/MTL loading, image IO, metrics, checkpointing, BSDF viz."""

import os

import numpy as np

from fovpathtracing_optixcodelatest_tpu.models.obj_loader import load_obj
from fovpathtracing_optixcodelatest_tpu.utils import image as img
from fovpathtracing_optixcodelatest_tpu.utils.checkpoint import (
    load_checkpoint,
    save_checkpoint,
)
from fovpathtracing_optixcodelatest_tpu.utils.metrics import (
    FrameTimers,
    TsvLogger,
    ssim,
)

OBJ_TEXT = """
mtllib scene.mtl
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
v 0 0 1
vn 0 0 1
vt 0 0
vt 1 0
vt 1 1
vt 0 1
usemtl red
f 1/1/1 2/2/1 3/3/1 4/4/1
usemtl green
f 1/1/1 2/2/1 5/1/1
f -5/-4/-1 -4/-3/-1 -1/-4/-1
"""

MTL_TEXT = """
newmtl red
Kd 0.8 0.1 0.1
Ke 0.0 0.0 0.0
Ns 250
newmtl green
Kd 0.1 0.8 0.1
Ke 1.0 2.0 3.0
d 0.5
"""


def _write_obj(tmp_path):
    obj = tmp_path / "scene.obj"
    obj.write_text(OBJ_TEXT)
    (tmp_path / "scene.mtl").write_text(MTL_TEXT)
    return str(obj)


def test_obj_loader_splits_by_material(tmp_path):
    meshes, textures = load_obj(_write_obj(tmp_path))
    assert len(meshes) == 2 and textures == []
    by_color = {tuple(np.round(m.material.color, 2)): m for m in meshes}
    red = by_color[(0.8, 0.1, 0.1)]
    green = by_color[(0.1, 0.8, 0.1)]
    # quad fan-triangulated into 2 tris, 4 deduped verts
    assert red.num_triangles == 2 and red.vertex.shape == (4, 3)
    # negative indices resolve to the same corners as face 1 → full dedup:
    # both green faces share all 3 (v,t,n) triples
    assert green.num_triangles == 2
    assert green.vertex.shape[0] == 3
    np.testing.assert_allclose(green.material.emission, (1.0, 2.0, 3.0))
    # dissolve 0.5 → transmission 0.5
    np.testing.assert_allclose(green.material.transmission, 0.5)
    # Ns 250 → low roughness for red
    assert red.material.roughness < 0.3


def test_obj_negative_index_resolution(tmp_path):
    meshes, _ = load_obj(_write_obj(tmp_path))
    green = [m for m in meshes if m.material.color[1] > 0.5][0]
    # both green faces use vertex 5 (0,0,1): present among deduped verts
    assert any(np.allclose(v, [0, 0, 1]) for v in green.vertex)


def test_png_ppm_pfm_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    imgf = rng.uniform(0, 1, (17, 23, 3)).astype(np.float32)
    p1 = str(tmp_path / "x.png")
    img.save_png(p1, imgf)
    back = img.load_png(p1)
    np.testing.assert_allclose(back, np.round(imgf * 255) / 255, atol=1 / 255)
    p2 = str(tmp_path / "x.ppm")
    img.save_ppm(p2, imgf)
    back2 = img.load_ppm(p2)
    np.testing.assert_allclose(back2, np.round(imgf * 255) / 255, atol=1 / 255)
    p3 = str(tmp_path / "x.pfm")
    hdr = (imgf * 37.5).astype(np.float32)
    img.save_pfm(p3, hdr)
    back3 = img.load_pfm(p3)
    np.testing.assert_allclose(back3, hdr, rtol=1e-6)


def test_ssim_properties():
    rng = np.random.default_rng(1)
    a = rng.uniform(0, 1, (32, 32, 3))
    assert ssim(a, a) > 0.9999
    noisy = np.clip(a + rng.normal(0, 0.2, a.shape), 0, 1)
    s = ssim(a, noisy)
    assert 0.0 < s < 0.9
    assert ssim(a, noisy) < ssim(a, np.clip(a + rng.normal(0, 0.02, a.shape), 0, 1))


def test_frame_timers_and_tsv(tmp_path):
    t = FrameTimers()
    logger = TsvLogger(str(tmp_path / "log.tsv"))
    for _ in range(3):
        t.begin("state_update"); t.end("state_update")
        t.begin("render"); t.end("render")
        t.begin("display"); t.end("display")
        t.frame_done()
        logger.log(t, gaze=(10, 20), subframe=1)
    logger.close()
    line = t.stats_line((10, 20), 1)
    assert "fps" in line and "render" in line
    rows = (tmp_path / "log.tsv").read_text().strip().splitlines()
    assert rows[0].split("\t") == list(TsvLogger.COLUMNS)
    assert len(rows) == 4


def test_checkpoint_roundtrip(tmp_path):
    from fovpathtracing_optixcodelatest_tpu.models.camera import Camera

    canvas = np.random.default_rng(2).normal(size=(8, 8, 3)).astype(np.float32)
    path = str(tmp_path / "ck.npz")
    cam = Camera(eye=(1, 2, 3), lookat=(0, 0, 0), fov_y=40.0, aspect=1.5)
    save_checkpoint(path, canvas, 7, camera=cam, gaze=(3, 4))
    ck = load_checkpoint(path)
    np.testing.assert_array_equal(ck["canvas"], canvas)
    assert ck["subframe"] == 7
    assert ck["camera"].eye == (1.0, 2.0, 3.0) and ck["camera"].fov_y == 40.0
    assert ck["gaze"] == (3, 4)


def test_hdr_rgbe_decode(tmp_path):
    """Write a tiny flat (non-RLE) Radiance HDR and decode it."""
    w, h = 4, 2
    vals = np.asarray([[1.0, 0.5, 0.25]], dtype=np.float32).repeat(w * h, 0)
    # encode RGBE manually: mantissa in [0.5,1), e s.t. v = m * 2^(e-128)
    rgbe = np.zeros((h * w, 4), dtype=np.uint8)
    maxv = vals.max(axis=1)
    exp = np.floor(np.log2(maxv)).astype(int) + 1
    scale = 256.0 / np.exp2(exp.astype(float))
    rgbe[:, :3] = np.clip(vals * scale[:, None], 0, 255).astype(np.uint8)
    rgbe[:, 3] = (exp + 128).astype(np.uint8)
    path = tmp_path / "t.hdr"
    with open(path, "wb") as fh:
        fh.write(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
        fh.write(f"-Y {h} +X {w}\n".encode())
        fh.write(rgbe.reshape(h, w, 4).tobytes())
    out = img.load_hdr_probe(str(path))
    assert out is not None and out.shape == (h, w, 3)
    np.testing.assert_allclose(out[0, 0], [1.0, 0.5, 0.25], rtol=0.02)


def test_bsdf_viz_harness():
    from fovpathtracing_optixcodelatest_tpu.models.material import Material
    from fovpathtracing_optixcodelatest_tpu.utils.bsdf_viz import bsdf_test_image

    mat = Material(color=(0.95, 0.9, 0.9), specular=1.0, roughness=0.2,
                   metallic=0.0, transmission=0.0, emission=(0, 0, 0))
    image, uv = bsdf_test_image(mat, width=64, height=32, num_samples=100)
    assert image.shape == (32, 64, 3)
    assert np.isfinite(image).all()
    assert ((uv >= 0) & (uv <= 1)).all()
    # some sample markers present
    assert (image == [1.0, 0.0, 0.0]).all(axis=-1).sum() > 10


def test_obj_end_to_end_through_cli(tmp_path):
    """OBJ + MTL + texture file → CLI render → PNG (the full Model.cpp-twin
    pipeline including texture loading)."""
    from fovpathtracing_optixcodelatest_tpu.apps.main import main
    from fovpathtracing_optixcodelatest_tpu.utils.image import load_png, save_png

    # a textured ground quad + a box, with a real texture file on disk
    tex = np.zeros((8, 8, 3), dtype=np.float32)
    tex[::2, ::2] = 1.0
    save_png(str(tmp_path / "checker.png"), tex)
    (tmp_path / "scene.mtl").write_text(
        "newmtl ground\nKd 1 1 1\nmap_Kd checker.png\n"
        "newmtl cube\nKd 0.9 0.2 0.2\n"
    )
    obj = ["mtllib scene.mtl"]
    for v in [(-5, 0, 5), (5, 0, 5), (5, 0, -5), (-5, 0, -5),
              (-1, 0, 1), (1, 0, 1), (1, 2, 1), (-1, 2, 1)]:
        obj.append(f"v {v[0]} {v[1]} {v[2]}")
    obj += ["vt 0 0", "vt 1 0", "vt 1 1", "vt 0 1",
            "usemtl ground", "f 1/1 2/2 3/3 4/4",
            "usemtl cube", "f 5/1 6/2 7/3 8/4"]
    (tmp_path / "scene.obj").write_text("\n".join(obj))
    out = tmp_path / "render.png"
    rc = main([
        "--obj", str(tmp_path / "scene.obj"), "--width", "32", "--height",
        "24", "--frames", "1", "--schedule", "uniform:1", "--out", str(out),
    ])
    assert rc == 0 and out.exists()
    img = load_png(str(out))
    assert img.shape == (24, 32, 3) and img.max() > 0.05


def test_exr_roundtrip_half_float_zip_none(tmp_path):
    """EXR codec (utils/exr.py; reference twin tinyexr via sutil.cpp:253-360):
    HALF/FLOAT x ZIP/NONE round-trips, odd sizes crossing the 16-line ZIP
    block boundary, RGBA, and the save_image dispatcher."""
    from fovpathtracing_optixcodelatest_tpu.utils import exr

    rng = np.random.default_rng(1)
    hdr = (rng.uniform(0, 1, (37, 21, 3)) ** 2 * 40).astype(np.float32)
    for half in (False, True):
        for comp in ("zip", "none"):
            p = str(tmp_path / f"x_{half}_{comp}.exr")
            exr.write_exr(p, hdr, half=half, compression=comp)
            back = exr.read_exr(p)
            if half:
                np.testing.assert_allclose(
                    back, hdr.astype(np.float16).astype(np.float32), rtol=1e-7
                )
            else:
                np.testing.assert_allclose(back, hdr, rtol=1e-7)

    # RGBA + single channel
    rgba = rng.uniform(0, 2, (16, 16, 4)).astype(np.float32)
    p = str(tmp_path / "a.exr")
    exr.write_exr(p, rgba, half=False)
    np.testing.assert_allclose(exr.read_exr(p), rgba, rtol=1e-7)
    lum = rng.uniform(0, 2, (5, 9)).astype(np.float32)
    p = str(tmp_path / "y.exr")
    exr.write_exr(p, lum, half=False)
    np.testing.assert_allclose(exr.read_exr(p)[:, :, 0], lum, rtol=1e-7)

    # dispatcher + probe loader path
    p = str(tmp_path / "d.exr")
    img.save_image(p, hdr)
    probe = img.load_hdr_probe(p)
    assert probe.shape == hdr.shape
