"""FoveationSchedule.validate_coverage + benchmark sweep smoke tests."""

import numpy as np

from fovpathtracing_optixcodelatest_tpu.config import (
    FoveationPass,
    FoveationSchedule,
)


def test_reference_schedule_has_known_boundary_holes():
    """PARITY: the verbatim reference schedule leaves a small number of
    ring-boundary pixels unwritten per frame (stride-block rejection at the
    ring edges — stale-pixel artifact in the original too). Assert the twin
    reproduces it exactly: few holes, all confined to the ring boundaries."""
    s = FoveationSchedule.reference_32_16_8()
    holes = s.validate_coverage(960, 540)
    n = int(holes.sum())
    assert 0 < n < 400, n
    ys, xs = np.nonzero(holes)
    d = np.sqrt((xs - 480.0) ** 2 + (ys - 270.0) ** 2)
    # holes only near the fovea/annulus (≈75) and annulus/periphery (≈243) rings
    assert (((d > 74) & (d < 78)) | ((d > 240) & (d < 247))).all()


def test_sealed_schedule_is_hole_free():
    s = FoveationSchedule.reference_32_16_8_sealed()
    for gaze in [None, (0, 0), (959, 539), (0, 539), (959, 0), (13, 400)]:
        holes = s.validate_coverage(960, 540, gaze=gaze)
        assert holes.sum() == 0, f"gaze {gaze}: {holes.sum()} holes"


def test_sweep_schedules_nearly_cover():
    for trip in ("32_2_1", "32_4_2", "32_8_4", "32_16_8"):
        f, a, p = (int(x) for x in trip.split("_"))
        s = FoveationSchedule.sweep(f, a, p)
        # sweeps inherit the reference ring geometry incl. its boundary holes
        assert s.validate_coverage(960, 540).sum() < 400


def test_validator_detects_gap():
    r = 10
    bad = FoveationSchedule(
        passes=(
            FoveationPass(factor=4, spp=1, r_inner=float(r), r_outer=1e9,
                          redraw=False),
            FoveationPass(factor=1, spp=1, r_inner=0.0, r_outer=float(r + 1),
                          redraw=True, launch_w=2 * (r + 1), launch_h=2 * (r + 1),
                          centered=True, center_offset=r + 1),
        )
    )
    holes = bad.validate_coverage(48, 36)
    assert holes.sum() > 0  # the ring gap the sentinel test renders


def test_benchmark_sweep_cli(tmp_path):
    from fovpathtracing_optixcodelatest_tpu.apps.benchmark_sweep import main

    rc = main([
        "--scene", "cornell", "--width", "48", "--height", "36",
        "--frames", "1", "--skip-uniform", "--out-dir", str(tmp_path),
    ])
    assert rc == 0
    assert (tmp_path / "frame_rate.dat").exists()
    assert (tmp_path / "cornell_fov_32_16_8.tsv").exists()
    first = (tmp_path / "cornell_fov_32_16_8.tsv").read_text().splitlines()[0]
    assert "e+" in first  # tri-count tag like the reference's TSVs


def test_box_city_fast_generator():
    """Vectorized large-scene generator: matches box_city's structure at a
    fraction of the host cost and round-trips the BVH build."""
    from fovpathtracing_optixcodelatest_tpu.models import scenes
    from fovpathtracing_optixcodelatest_tpu.models.mesh import host_triangles
    from fovpathtracing_optixcodelatest_tpu.ops import bvh_native

    meshes, cam = scenes.box_city_fast(n=20, seed=0)
    tris = host_triangles(meshes)
    assert tris.shape[0] == 20 * 20 * 12 + 12
    assert np.isfinite(tris).all()
    bvh = bvh_native.build(tris)
    assert bvh.num_rows > 100


def test_scaled_schedule_is_hole_free():
    """Progressive-startup warmup schedules (viewer) keep full coverage: the
    ring geometry shrinks with resolution but the stride-block overlap margin
    is absolute (a stride-4 pass still rejects 4x4 blocks at 1/4 res)."""
    base = FoveationSchedule.reference_32_16_8_sealed()
    for s, (w, h) in ((2, (480, 272)), (4, (240, 136))):
        sc = base.scaled(s)
        for gaze in [None, (0, 0), (w - 1, h - 1), (7, h // 2)]:
            holes = sc.validate_coverage(w, h, gaze=gaze)
            assert holes.sum() == 0, f"scale {s} gaze {gaze}: {holes.sum()}"
    assert base.scaled(1) is base


def test_pass_active_bound_is_safe_over_gazes():
    """frame_compaction correctness rests on pass_active_bound being a TRUE
    upper bound for every gaze: an undercount would silently drop active
    rays. Sweep exact ring-active counts over a dense gaze grid."""
    from fovpathtracing_optixcodelatest_tpu.render.raygen import (
        pass_active_bound,
    )

    for sched, (w, h) in (
        (FoveationSchedule.reference_32_16_8(), (960, 540)),
        (FoveationSchedule.reference_32_16_8_sealed(), (960, 540)),
        (FoveationSchedule.reference_32_16_8(37, 120).scaled(1), (480, 272)),
        (FoveationSchedule.reference_32_16_8_sealed().scaled(2), (480, 272)),
        (FoveationSchedule.reference_32_16_8_sealed().scaled(4), (240, 136)),
        (FoveationSchedule.sweep(32, 4, 2), (960, 540)),
    ):
        for p in sched.passes:
            lw = p.launch_w if p.launch_w is not None else w // p.factor
            lh = p.launch_h if p.launch_h is not None else h // p.factor
            bound = pass_active_bound(p, w, h, 1)
            worst = 0
            for gx in list(range(0, w, 61)) + [w - 1]:
                for gy in list(range(0, h, 53)) + [h - 1]:
                    ox = gx - p.center_offset if p.centered else 0
                    oy = gy - p.center_offset if p.centered else 0
                    xs = np.arange(lw) * p.factor + ox
                    ys = np.arange(lh) * p.factor + oy
                    dx = xs[None, :] - gx
                    dy = ys[:, None] - gy
                    r = np.sqrt(dx * dx + dy * dy)
                    n = int(((r >= p.r_inner) & (r <= p.r_outer)).sum())
                    worst = max(worst, n)
            assert worst <= bound, (p, worst, bound)


def test_frame_compaction_bit_identical():
    """frame_compaction=True must render the exact frame of =False (actives
    sorted to a static prefix, zeros for the ring-dead tail)."""
    import dataclasses
    import jax
    import jax.numpy as jnp

    from fovpathtracing_optixcodelatest_tpu.config import RenderConfig
    from fovpathtracing_optixcodelatest_tpu.models import scenes
    from fovpathtracing_optixcodelatest_tpu.models.scene import build_scene
    from fovpathtracing_optixcodelatest_tpu.render import film
    from fovpathtracing_optixcodelatest_tpu.render.renderer import (
        render_frame,
    )

    meshes, cam = scenes.cornell(sphere_subdiv=0)
    scene = build_scene(meshes)
    w, h = 64, 48
    sched = FoveationSchedule.reference_32_16_8(inner=6, outer=14)
    camp = dataclasses.replace(cam, aspect=w / h).device_params()
    pad = film.schedule_padding(sched, w, h)
    key = jax.random.PRNGKey(3)
    frames = {}
    for flag in (True, False):
        config = RenderConfig(width=w, height=h, max_depth=2,
                              frame_compaction=flag)
        canvas = film.new_canvas(w, h, pad)
        # off-center gaze exercises clipped rings
        _, frame, stats = render_frame(
            scene, camp, jnp.asarray(11, jnp.int32),
            jnp.asarray(40, jnp.int32), jnp.asarray(0, jnp.int32),
            canvas, key, config, sched,
        )
        frames[flag] = (np.asarray(frame), int(np.asarray(stats["traces"])))
    np.testing.assert_array_equal(frames[True][0], frames[False][0])
    assert frames[True][1] == frames[False][1]
