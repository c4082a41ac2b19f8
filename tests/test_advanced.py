"""Advanced-feature tests: shadow catcher, glass transmission, textured PT,
spectral dispersion renderer, GIF output."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from fovpathtracing_optixcodelatest_tpu.config import RenderConfig
from fovpathtracing_optixcodelatest_tpu.models.camera import Camera
from fovpathtracing_optixcodelatest_tpu.models.material import (
    MATERIAL_FLAG_SHADOW_CATCHER,
    Material,
)
from fovpathtracing_optixcodelatest_tpu.models.mesh import (
    make_icosphere,
    make_quad,
)
from fovpathtracing_optixcodelatest_tpu.models.probe import constant_probe
from fovpathtracing_optixcodelatest_tpu.models.scene import build_scene
from fovpathtracing_optixcodelatest_tpu.models.texture import checkerboard
from fovpathtracing_optixcodelatest_tpu.render.integrator import trace_paths

CFG = RenderConfig(width=16, height=16)


def _rays_down(n, y=6.0, spread=3.0, seed=0):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(-spread, spread, (n, 2))
    o = np.stack([xy[:, 0], np.full(n, y), xy[:, 1]], axis=1).astype(np.float32)
    d = np.tile([[0.0, -1.0, 0.0]], (n, 1)).astype(np.float32)
    return jnp.asarray(o), jnp.asarray(d)


def test_shadow_catcher_alpha():
    """Catcher plane under a sphere: alpha on the catcher accumulates the
    shadow term instead of being set to 1 (deviceProgram.cu:646-651,691-694),
    so the film composites backplate*(1-alpha)."""
    catcher = Material(color=(1, 1, 1), emission=(0, 0, 0), metallic=0.0,
                       roughness=1.0, transmission=0.0, specular=0.0,
                       flags=MATERIAL_FLAG_SHADOW_CATCHER)
    floor = make_quad((-10, 0, 10), (10, 0, 10), (10, 0, -10), (-10, 0, -10),
                      catcher)
    blocker = make_icosphere((0, 2.0, 0), 1.2, 1,
                             Material(color=(0.1, 0.1, 0.1), emission=(0, 0, 0),
                                      metallic=0.0, roughness=1.0,
                                      transmission=0.0))
    scene = build_scene([floor, blocker], probe=constant_probe((2.0, 2.0, 2.0)))
    o, d = _rays_down(512)
    out = trace_paths(scene, o, d, jnp.ones(512, dtype=bool),
                      jax.random.PRNGKey(0), CFG)
    alpha = np.asarray(out["alpha"])
    # subdiv-1 icosphere silhouette is smaller than its circumradius; use a
    # conservative inner radius to classify definite sphere hits
    hits_sphere = np.asarray(o)[:, 0] ** 2 + np.asarray(o)[:, 2] ** 2 < 0.9**2
    # sphere hits (non-catcher) pin alpha to exactly 1 (assignment, cu:691)
    np.testing.assert_allclose(alpha[hits_sphere], 1.0, atol=1e-6)
    # catcher hits accumulate a shadow term: spread of values, not pinned
    catcher_alpha = alpha[np.asarray(o)[:, 0] ** 2 + np.asarray(o)[:, 2] ** 2 > 1.5**2]
    assert (catcher_alpha != 1.0).any()
    assert catcher_alpha.max() > 0.01  # occluded NEE samples produce shadow
    assert np.isfinite(alpha).all()


def test_glass_sphere_transmission_and_eta_tracking():
    """Rays through a transmissive sphere must continue (not vanish): the
    medium eta flip (deviceProgram.cu:673-683,717-721) keeps refraction
    consistent so a good fraction of paths exit and stay alive for ≥2
    bounces."""
    glass = Material(color=(1, 1, 1), emission=(0, 0, 0), metallic=0.0,
                     roughness=0.05, transmission=1.0, eta=1.5, specular=1.0)
    sphere = make_icosphere((0, 0, 0), 1.0, 2, glass)
    scene = build_scene([sphere], probe=constant_probe((1.5, 1.5, 1.5)))
    n = 1024
    rng = np.random.default_rng(1)
    xy = rng.uniform(-0.6, 0.6, (n, 2))
    o = jnp.asarray(np.stack([xy[:, 0], xy[:, 1], np.full(n, 4.0)], 1).astype(np.float32))
    d = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]], dtype=jnp.float32), (n, 1))
    out = trace_paths(scene, o, d, jnp.ones(n, dtype=bool),
                      jax.random.PRNGKey(2), CFG)
    rad = np.asarray(out["radiance"])
    assert np.isfinite(rad).all()
    # transmissive paths pick up NEE at interior/exterior vertices: nonzero
    assert (rad.sum(axis=1) > 0).mean() > 0.3
    np.testing.assert_allclose(np.asarray(out["alpha"]), 1.0, atol=1e-6)


def test_textured_albedo_affects_radiance():
    img = checkerboard(8, 2, c0=(1, 1, 1), c1=(0, 0, 0))
    floor = make_quad((-4, 0, 4), (4, 0, 4), (4, 0, -4), (-4, 0, -4),
                      Material(color=(1, 1, 1), emission=(0, 0, 0),
                               metallic=0.0, roughness=1.0, transmission=0.0,
                               specular=0.0),
                      texture_id=0)
    scene = build_scene([floor], probe=constant_probe((2.0, 2.0, 2.0)),
                        texture_images=[img])
    o, d = _rays_down(2048, seed=3)
    out = trace_paths(scene, o, d, jnp.ones(2048, dtype=bool),
                      jax.random.PRNGKey(4), CFG)
    rad = np.asarray(out["radiance"]).mean(axis=1)
    # black vs white checker cells must differ strongly in gathered radiance
    op = np.asarray(o)
    u = (op[:, 0] + 4) / 8
    v_ = (op[:, 2] - 4) / -8  # quad uv orientation
    cell = ((u * 2).astype(int) + (v_ * 2).astype(int)) % 2
    white_mean = rad[cell == 0].mean()
    black_mean = rad[cell == 1].mean()
    lo, hi = min(white_mean, black_mean), max(white_mean, black_mean)
    assert hi > 5 * (lo + 1e-6)


def test_spectral_dispersion_renders_color_fringes():
    from fovpathtracing_optixcodelatest_tpu.render.spectral import spectral_render

    glass = Material(color=(1, 1, 1), emission=(0, 0, 0), metallic=0.0,
                     roughness=0.05, transmission=1.0, eta=1.5)
    sphere = make_icosphere((0, 0, 0), 1.0, 2, glass)
    scene = build_scene([sphere], probe=constant_probe((1.0, 1.0, 1.0)))
    cam = Camera(eye=(0, 0, 4), lookat=(0, 0, 0), fov_y=40.0)
    frame_hi = np.asarray(
        spectral_render(scene, cam.device_params(), 48, 48, dispersion=30000.0)
    ).astype(float)
    frame_lo = np.asarray(
        spectral_render(scene, cam.device_params(), 48, 48, dispersion=0.0)
    ).astype(float)
    assert frame_hi.shape == (48, 48, 3)
    assert frame_hi.max() > 30
    # dispersion only changes rays that refract: the sphere region must
    # differ between dispersion settings while the background is IDENTICAL
    # (same wavelengths, same non-refracting paths)
    diff = np.abs(frame_hi - frame_lo).mean(axis=-1)
    center = diff[14:34, 14:34].mean()
    border = diff[:6, :].mean()
    assert border < 1e-6
    assert center > 0.2  # refracting region visibly wavelength-dependent


def test_save_gif(tmp_path):
    from fovpathtracing_optixcodelatest_tpu.utils.image import save_gif

    frames = [np.full((8, 8, 3), i * 40, dtype=np.uint8) for i in range(4)]
    p = tmp_path / "t.gif"
    save_gif(str(p), frames, fps=5)
    assert p.exists() and p.stat().st_size > 100


def test_shadow_catcher_secondary_passthrough():
    """Secondary rays pass THROUGH catcher geometry (deviceProgram.cu:646-651:
    re-trace from the hit point, bounce refunded). A 45-degree mirror turns
    primary rays horizontal through a huge catcher wall; a lit diffuse wall
    sits beyond it. With pass-through the bounce reaches the diffuse wall and
    collects NEE radiance; without it the catcher swallows the vertex."""
    s2 = 1.0 / np.sqrt(2.0)
    e1 = np.array([0.0, 0.0, 1.0])
    e2 = np.array([s2, -s2, 0.0])
    c = [tuple(5 * (a * e1 + b * e2)) for a, b in
         ((-1, -1), (1, -1), (1, 1), (-1, 1))]
    mirror = make_quad(c[0], c[1], c[2], c[3],
                       Material(color=(1, 1, 1), metallic=1.0, roughness=0.01,
                                specular=1.0, transmission=0.0))
    # small plate: intercepts the reflected beam but occludes little of the
    # lit wall's NEE hemisphere
    catcher_wall = make_quad((5, -1.5, -1.5), (5, 1.5, -1.5), (5, 1.5, 1.5),
                             (5, -1.5, 1.5),
                             Material(color=(1, 1, 1), roughness=1.0,
                                      flags=MATERIAL_FLAG_SHADOW_CATCHER))
    lit_wall = make_quad((8, -10, -10), (8, 10, -10), (8, 10, 10),
                         (8, -10, 10),
                         Material(color=(1, 1, 1), roughness=1.0,
                                  metallic=0.0, specular=0.0))
    scene = build_scene([mirror, catcher_wall, lit_wall],
                        probe=constant_probe((2.0, 2.0, 2.0)))
    assert scene.materials.has_catcher

    n = 256
    rng = np.random.default_rng(3)
    o = np.stack([rng.uniform(-1, 1, n), np.full(n, 10.0),
                  rng.uniform(-1, 1, n)], 1).astype(np.float32)
    d = np.tile([[0.0, -1.0, 0.0]], (n, 1)).astype(np.float32)
    o, d = jnp.asarray(o), jnp.asarray(d)
    act = jnp.ones(n, dtype=bool)
    key = jax.random.PRNGKey(1)

    out_pt = trace_paths(scene, o, d, act, key,
                         dataclasses.replace(CFG, catcher_passthrough=2))
    out_no = trace_paths(scene, o, d, act, key,
                         dataclasses.replace(CFG, catcher_passthrough=0))
    r_pt = float(np.asarray(out_pt["radiance"]).mean())
    r_no = float(np.asarray(out_no["radiance"]).mean())
    assert np.isfinite(r_pt) and np.isfinite(r_no)
    # pass-through reaches the lit wall behind the catcher: its NEE adds on
    # top of the ~1.0 the mirror's own NEE contributes in both modes
    assert r_pt - r_no > 0.2 and r_pt > 1.2 * r_no, (r_pt, r_no)
    # the re-trace queries are counted in the traces metric
    assert int(out_pt["traces"]) > int(out_no["traces"])


def test_catcher_passthrough_without_compaction():
    """Regression (ADVICE r2): with compact_bounces=False the raw traverse
    dict used to leak a 'pending' key into the catcher fori_loop carry and
    fail with a pytree-structure TypeError. Must run AND match the compacted
    path bit-for-bit (compaction is a pure reordering)."""
    catcher = Material(color=(1, 1, 1), roughness=1.0,
                       flags=MATERIAL_FLAG_SHADOW_CATCHER)
    floor = make_quad((-10, 0, 10), (10, 0, 10), (10, 0, -10), (-10, 0, -10),
                      catcher)
    blocker = make_icosphere((0, 2.0, 0), 1.2, 1,
                             Material(color=(0.4, 0.4, 0.4), roughness=1.0))
    scene = build_scene([floor, blocker], probe=constant_probe((2.0, 2.0, 2.0)))
    assert scene.materials.has_catcher
    o, d = _rays_down(256, seed=7)
    act = jnp.ones(256, dtype=bool)
    key = jax.random.PRNGKey(5)
    cfg_nc = dataclasses.replace(CFG, compact_bounces=False,
                                 catcher_passthrough=2)
    cfg_c = dataclasses.replace(CFG, compact_bounces=True,
                                catcher_passthrough=2)
    out_nc = trace_paths(scene, o, d, act, key, cfg_nc)
    out_c = trace_paths(scene, o, d, act, key, cfg_c)
    np.testing.assert_array_equal(np.asarray(out_nc["radiance"]),
                                  np.asarray(out_c["radiance"]))
    np.testing.assert_array_equal(np.asarray(out_nc["alpha"]),
                                  np.asarray(out_c["alpha"]))
