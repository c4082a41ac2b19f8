"""Demand-loaded texture subsystem (models/demand.py — the lib/DemandLoading
twin, SURVEY L9). Exercises the full request/fill/upload cycle end-to-end:
frame 1 samples fall back to tile means + record requests; after
process_requests().wait() + launch_prepare(), the same samples are exact;
LRU eviction keeps the atlas bounded; Ticket honors Ticket.h semantics.
"""

import numpy as np

from fovpathtracing_optixcodelatest_tpu.models import demand
from fovpathtracing_optixcodelatest_tpu.models.demand import (
    TILE,
    DemandLoader,
    demand_tex2d,
    page_requests,
)

import jax
import jax.numpy as jnp


def _checker_image(w, h):
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [
            (xx / w).astype(np.float32),
            (yy / h).astype(np.float32),
            ((xx // TILE + yy // TILE) % 2).astype(np.float32),
        ],
        axis=-1,
    )
    return img


def test_demand_cycle_fallback_then_exact():
    img = _checker_image(256, 192)  # 4x3 = 12 tiles
    loader = DemandLoader(max_pages=32)
    tid = loader.create_texture(img)
    ctx = loader.launch_prepare()

    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.random(4096, dtype=np.float32))
    v = jnp.asarray(rng.random(4096, dtype=np.float32))
    tex = jnp.full((4096,), tid, jnp.int32)

    sample = jax.jit(
        lambda ctx, t, u, v: demand_tex2d(ctx, t, u, v)
    )
    rgb1, res1, pages = sample(ctx, tex, u, v)
    assert not bool(np.asarray(res1).any())  # nothing resident yet

    # fallback = per-tile mean (never wildly off for this smooth image)
    tx = np.minimum((np.asarray(u) * 256).astype(int), 255)
    ty = np.minimum((np.asarray(v) * 192).astype(int), 191)
    exact = img[ty, tx]
    assert np.abs(np.asarray(rgb1) - exact).max() > 1e-4  # means, not texels
    assert np.abs(np.asarray(rgb1)[:, 0] - exact[:, 0]).max() < 0.2

    req = page_requests(loader.total_pages, pages, res1)
    ticket = loader.process_requests(req)
    assert ticket.num_tasks_total() == int(np.asarray(req).sum())
    assert ticket.wait(timeout=60)
    assert ticket.num_tasks_remaining() == 0
    ctx2 = loader.launch_prepare()

    rgb2, res2, _ = sample(ctx2, tex, u, v)
    assert bool(np.asarray(res2).all())
    np.testing.assert_allclose(np.asarray(rgb2), exact, rtol=0, atol=1e-6)
    assert loader.num_tiles_loaded == int(np.asarray(req).sum())


def test_demand_lru_eviction_bounded_atlas():
    img = _checker_image(512, 512)  # 8x8 = 64 tiles
    loader = DemandLoader(max_pages=8)  # atlas holds 8 of 64
    tid = loader.create_texture(img)
    assert loader.total_pages == 64

    sample = jax.jit(lambda ctx, t, u, v: demand_tex2d(ctx, t, u, v))
    # sweep tile rows in order; each batch requests 8 fresh tiles
    for row in range(4):
        ctx = loader.launch_prepare()
        u = jnp.asarray((np.arange(8) + 0.5) / 8.0, jnp.float32)
        v = jnp.full((8,), (row + 0.5) / 8.0, jnp.float32)
        t = jnp.full((8,), tid, jnp.int32)
        _, res, pages = sample(ctx, t, u, v)
        loader.touch(np.asarray(pages)[np.asarray(res)])
        req = page_requests(loader.total_pages, pages, res)
        loader.process_requests(req).wait(timeout=60)
    # atlas stayed bounded; later rows evicted earlier rows
    assert (np.asarray(loader._page_table) >= 0).sum() <= 8
    assert loader.num_tiles_evicted >= 16
    # the most recent row is resident and exact
    ctx = loader.launch_prepare()
    u = jnp.asarray((np.arange(8) + 0.5) / 8.0, jnp.float32)
    v = jnp.full((8,), 3.5 / 8.0, jnp.float32)
    rgb, res, _ = sample(ctx, jnp.full((8,), tid, jnp.int32), u, v)
    assert bool(np.asarray(res).all())
    tx = np.minimum((np.asarray(u) * 512).astype(int), 511)
    ty = np.minimum((np.asarray(v) * 512).astype(int), 511)
    np.testing.assert_allclose(np.asarray(rgb), img[ty, tx], atol=1e-6)


def test_demand_multi_texture_page_bases():
    a = _checker_image(128, 64)  # 2x1 = 2 tiles
    b = _checker_image(64, 128)  # 1x2 = 2 tiles
    loader = DemandLoader(max_pages=8)
    ta, tb = loader.create_texture(a), loader.create_texture(b)
    ctx = loader.launch_prepare()
    t = jnp.asarray([ta, ta, tb, tb], jnp.int32)
    u = jnp.asarray([0.1, 0.9, 0.5, 0.5], jnp.float32)
    v = jnp.asarray([0.5, 0.5, 0.1, 0.9], jnp.float32)
    _, res, pages = demand_tex2d(ctx, t, u, v)
    req = page_requests(loader.total_pages, pages, res)
    assert int(np.asarray(req).sum()) == 4  # all four distinct tiles
    loader.process_requests(req).wait(timeout=60)
    ctx = loader.launch_prepare()
    rgb, res, _ = demand_tex2d(ctx, t, u, v)
    assert bool(np.asarray(res).all())
    for i, (img, uu, vv) in enumerate(
        [(a, 0.1, 0.5), (a, 0.9, 0.5), (b, 0.5, 0.1), (b, 0.5, 0.9)]
    ):
        h, w = img.shape[:2]
        px = img[min(int(vv * h), h - 1), min(int(uu * w), w - 1)]
        np.testing.assert_allclose(np.asarray(rgb)[i], px, atol=1e-6)


def test_ticket_before_processing():
    t = demand.Ticket()
    assert t.num_tasks_total() == -1  # Ticket.h: -1 before processing
    assert t.num_tasks_remaining() == -1


def test_demand_udim_texture():
    """createUdimTexture twin: a 2x2 UDIM grid resolves (u,v) to the right
    sub-image cell; sub-images page independently."""
    imgs = [np.full((64, 64, 3), c, np.float32)
            for c in (0.1, 0.3, 0.5, 0.7)]  # one tile each
    loader = DemandLoader(max_pages=8)
    gid = loader.create_udim_texture(imgs, udim=2, vdim=2)
    ctx = loader.launch_prepare()
    t = jnp.full((4,), gid, jnp.int32)
    u = jnp.asarray([0.25, 0.75, 0.25, 0.75], jnp.float32)
    v = jnp.asarray([0.25, 0.25, 0.75, 0.75], jnp.float32)
    rgb, res, pages = demand_tex2d(ctx, t, u, v)
    assert not bool(np.asarray(res).any())
    # tile-mean fallback of a constant tile ~= the color (f32 sum rounding)
    np.testing.assert_allclose(
        np.asarray(rgb)[:, 0], [0.1, 0.3, 0.5, 0.7], atol=1e-3
    )
    loader.process_requests(
        page_requests(loader.total_pages, pages, res)
    ).wait(timeout=60)
    ctx = loader.launch_prepare()
    rgb2, res2, _ = demand_tex2d(ctx, t, u, v)
    assert bool(np.asarray(res2).all())
    np.testing.assert_allclose(
        np.asarray(rgb2)[:, 0], [0.1, 0.3, 0.5, 0.7], atol=1e-6
    )
    assert loader.num_tiles_loaded == 4


def test_demand_textures_in_render_loop():
    """End-to-end: a textured scene rendered through Renderer with a
    DemandLoader — frame 1 uses tile-mean fallbacks and records page
    requests; after process_demand_requests() the next frame samples the
    resident tiles. The converged frame matches the plain resident-texture
    render of the same scene (point-sampling deltas aside: compare the
    request lifecycle + non-trivial texture influence)."""
    import dataclasses as _dc

    from fovpathtracing_optixcodelatest_tpu.config import (
        FoveationSchedule as FS,
        RenderConfig,
    )
    from fovpathtracing_optixcodelatest_tpu.models.camera import Camera
    from fovpathtracing_optixcodelatest_tpu.models.material import Material
    from fovpathtracing_optixcodelatest_tpu.models.mesh import make_quad
    from fovpathtracing_optixcodelatest_tpu.models.scene import build_scene
    from fovpathtracing_optixcodelatest_tpu.render.renderer import Renderer

    img = _checker_image(128, 128)  # 2x2 tiles
    wall = make_quad((-2, -2, 0), (2, -2, 0), (2, 2, 0), (-2, 2, 0),
                     Material(color=(1.0, 1.0, 1.0)), texture_id=0)
    scene = build_scene([wall])
    loader = DemandLoader(max_pages=8)
    tid = loader.create_texture(img)
    assert tid == 0  # matches the mesh's texture_id
    cam = Camera(eye=(0, 0, 6), lookat=(0, 0, 0), fov_y=45.0, aspect=4 / 3)
    config = RenderConfig(width=32, height=24, max_depth=2)
    r = Renderer(scene=scene, config=config,
                 schedule=FS.uniform(2), demand_loader=loader)
    r.set_camera(_dc.replace(cam, aspect=32 / 24))
    assert r.scene.demand is not None

    r.render()
    n_req = r.process_demand_requests()
    assert n_req > 0  # frame 1 sampled non-resident tiles
    assert loader.num_tiles_loaded == n_req
    f2 = r.render()
    n_req2 = r.process_demand_requests()
    assert n_req2 == 0  # everything the camera sees is now resident
    assert f2.shape == (24, 32, 3)
    assert f2.max() > 0


def test_demand_textures_cli(tmp_path):
    """--demand-textures routes OBJ textures through the DemandLoader; the
    multi-frame CLI run pages tiles in after frame 1 and still renders."""
    from fovpathtracing_optixcodelatest_tpu.apps.main import main
    from fovpathtracing_optixcodelatest_tpu.utils.image import (
        load_png,
        save_png,
    )

    tex = np.zeros((8, 8, 3), dtype=np.float32)
    tex[::2, ::2] = 1.0
    save_png(str(tmp_path / "checker.png"), tex)
    (tmp_path / "scene.mtl").write_text(
        "newmtl ground\nKd 1 1 1\nmap_Kd checker.png\n"
    )
    obj = ["mtllib scene.mtl"]
    for v in [(-5, 0, 5), (5, 0, 5), (5, 0, -5), (-5, 0, -5)]:
        obj.append(f"v {v[0]} {v[1]} {v[2]}")
    obj += ["vt 0 0", "vt 1 0", "vt 1 1", "vt 0 1",
            "usemtl ground", "f 1/1 2/2 3/3 4/4"]
    (tmp_path / "scene.obj").write_text("\n".join(obj))
    out = tmp_path / "render.png"
    rc = main([
        "--obj", str(tmp_path / "scene.obj"), "--width", "32", "--height",
        "24", "--frames", "2", "--schedule", "uniform:1",
        "--demand-textures", "--demand-pages", "4", "--out", str(out),
    ])
    assert rc == 0 and out.exists()
    img = load_png(str(out))
    assert img.shape == (24, 32, 3) and img.max() > 0.05
