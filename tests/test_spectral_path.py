"""Hero-wavelength spectral path tracer tests (render/spectral_path.py).

The reference's spectrum.h is dead code; here the spectral machinery runs
through the FULL multi-bounce integrator. Tests: (1) spectral furnace —
on an achromatic diffuse scene the CIE-integrated result matches the RGB
integrator within hero-sampling noise, per channel, through multi-bounce
paths; (2) dispersion through refraction chains produces chromatic fringes
that vanish when the Cauchy coefficient is zero.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from fovpathtracing_optixcodelatest_tpu.config import RenderConfig
from fovpathtracing_optixcodelatest_tpu.models.material import Material
from fovpathtracing_optixcodelatest_tpu.models.mesh import make_icosphere
from fovpathtracing_optixcodelatest_tpu.models.probe import constant_probe
from fovpathtracing_optixcodelatest_tpu.models.scene import build_scene
from fovpathtracing_optixcodelatest_tpu.render.integrator import trace_paths
from fovpathtracing_optixcodelatest_tpu.render.spectral_path import (
    trace_paths_spectral,
)

CFG = RenderConfig(width=16, height=16)


def _sphere_scene(mat, probe_v=1.0):
    sphere = make_icosphere((0.0, 0.0, 0.0), 1.0, 3, mat)
    return build_scene([sphere], probe=constant_probe((probe_v,) * 3))


def _rays_at_sphere(n, seed=0, z=4.0, spread=0.5):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(-spread, spread, (n, 2))
    o = np.concatenate([xy, np.full((n, 1), z)], 1).astype(np.float32)
    d = np.tile([[0.0, 0.0, -1.0]], (n, 1)).astype(np.float32)
    return jnp.asarray(o), jnp.asarray(d)


def test_spectral_furnace_matches_rgb_integrator():
    mat = Material(color=(1.0, 1.0, 1.0), metallic=0.0, roughness=1.0,
                   specular=0.0, transmission=0.0)
    scene = _sphere_scene(mat)
    n = 4096
    o, d = _rays_at_sphere(n)
    act = jnp.ones(n, bool)
    key = jax.random.PRNGKey(0)

    rgb_out = trace_paths(scene, o, d, act, key, CFG)
    sp_out = trace_paths_spectral(scene, o, d, act, key, CFG)
    m_rgb = np.asarray(rgb_out["radiance"]).mean(axis=0)
    m_sp = np.asarray(sp_out["radiance"]).mean(axis=0)
    assert np.isfinite(np.asarray(sp_out["radiance"])).all()
    # achromatic scene: per-channel agreement within hero-sampling noise +
    # the RGB->spectrum->CIE round-trip tolerance
    np.testing.assert_allclose(m_sp, m_rgb, rtol=0.12)
    # the spectral result is itself achromatic
    np.testing.assert_allclose(m_sp[0], m_sp[2], rtol=0.1)


def test_spectral_multibounce_white_stays_achromatic():
    mat = Material(color=(1.0, 1.0, 1.0), metallic=0.0, roughness=1.0,
                   specular=0.0, transmission=0.0)
    scene = _sphere_scene(mat, probe_v=2.0)
    n = 8192
    o, d = _rays_at_sphere(n, seed=1)
    cfg6 = dataclasses.replace(CFG, max_depth=6)
    out = trace_paths_spectral(
        scene, o, d, jnp.ones(n, bool), jax.random.PRNGKey(2), cfg6
    )
    mean = np.asarray(out["radiance"]).mean(axis=0)
    assert mean.min() > 0.1
    # hero-quadrature noise shrinks with ray count; 8k rays keeps the
    # chromatic residual of a white multibounce scene under ~12%
    assert abs(mean[0] - mean[2]) < 0.12 * mean.mean()


def test_dispersion_produces_fringes_only_when_enabled():
    glass = Material(color=(1.0, 1.0, 1.0), metallic=0.0, roughness=0.05,
                     specular=0.5, transmission=1.0, eta=1.5)
    scene = _sphere_scene(glass, probe_v=1.5)
    n = 4096
    o, d = _rays_at_sphere(n, seed=2, spread=0.9)
    act = jnp.ones(n, bool)
    key = jax.random.PRNGKey(3)

    out_disp = trace_paths_spectral(scene, o, d, act, key, CFG,
                                    dispersion=20000.0)
    out_flat = trace_paths_spectral(scene, o, d, act, key, CFG,
                                    dispersion=0.0)
    r_d = np.asarray(out_disp["radiance"])
    r_f = np.asarray(out_flat["radiance"])
    assert np.isfinite(r_d).all() and np.isfinite(r_f).all()

    # dispersion rewrites only transmissive paths: rays missing the sphere
    # are bit-identical (same RNG streams), glass paths differ materially
    miss = np.linalg.norm(np.asarray(o)[:, :2], axis=1) > 1.05
    hit = ~miss
    assert miss.sum() > 100 and hit.sum() > 1000
    np.testing.assert_array_equal(r_d[miss], r_f[miss])
    assert np.abs(r_d[hit] - r_f[hit]).mean() > 0.02
    # and it redistributes color, not energy
    assert abs(r_d.mean() - r_f.mean()) < 0.15 * r_f.mean()


def test_spectral_frame_through_film_furnace():
    """Frame-level furnace: config.spectral=True renders a full foveated
    frame through render_frame (accumulation + backplate + tone map). On an
    achromatic diffuse scene the spectral frame matches the RGB frame within
    hero-sampling noise — the product-surface check the round-2 spectral
    path lacked (it was library-only)."""
    from fovpathtracing_optixcodelatest_tpu.config import (
        FoveationPass,
        FoveationSchedule,
    )
    from fovpathtracing_optixcodelatest_tpu.models.camera import Camera
    from fovpathtracing_optixcodelatest_tpu.render import film
    from fovpathtracing_optixcodelatest_tpu.render.renderer import render_frame

    mat = Material(color=(0.9, 0.9, 0.9), metallic=0.0, roughness=1.0,
                   specular=0.0, transmission=0.0)
    scene = _sphere_scene(mat, probe_v=1.5)
    w, h = 64, 48
    schedule = FoveationSchedule(passes=(
        FoveationPass(factor=2, spp=2, r_inner=0.0, r_outer=1e9, redraw=False),
        FoveationPass(factor=1, spp=4, r_inner=0.0, r_outer=12.0, redraw=True,
                      launch_w=24, launch_h=24, centered=True,
                      center_offset=12),
    ))
    cam = Camera(eye=(0, 0.3, 3.5), lookat=(0, 0, 0), fov_y=45.0,
                 aspect=w / h)
    camp = cam.device_params()
    pad = film.schedule_padding(schedule, w, h)
    gx = jnp.asarray(w // 2, jnp.int32)
    gy = jnp.asarray(h // 2, jnp.int32)
    key = jax.random.PRNGKey(9)

    frames = {}
    for name, spec in (("rgb", False), ("spectral", True)):
        cfg = dataclasses.replace(CFG, width=w, height=h, spectral=spec)
        canvas = film.new_canvas(w, h, pad)
        canvas, frame, stats = render_frame(
            scene, camp, gx, gy, jnp.asarray(0, jnp.int32), canvas, key,
            cfg, schedule)
        frames[name] = np.asarray(frame).astype(np.float32) / 255.0
        assert int(stats["traces"]) > 0
    diff = np.abs(frames["rgb"] - frames["spectral"]).mean()
    assert diff < 0.04, f"spectral frame deviates from RGB furnace: {diff}"
    assert np.isfinite(frames["spectral"]).all()


def test_spectral_cli_flag(tmp_path):
    """--spectral end-to-end through the CLI driver."""
    from fovpathtracing_optixcodelatest_tpu.apps.main import main as cli_main

    out = tmp_path / "spec.png"
    rc = cli_main([
        "--scene", "furnace", "--width", "48", "--height", "32",
        "--frames", "1", "--schedule", "uniform:2", "--spectral",
        "--out", str(out),
    ])
    assert rc == 0 and out.exists() and out.stat().st_size > 100
