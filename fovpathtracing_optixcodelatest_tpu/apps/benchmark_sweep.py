"""Foveation benchmark sweep — reproduces the reference's archived benchmark
suite (SURVEY.md §6: PT_sv4_vmv2/data/*, frame_rate.dat, rendering_time.dat,
sponza_fov_32_{2_1,4_2,8_4,16_8}.tsv): a sweep over spp schedules plus the
uniform baseline, emitting the same TSV/DAT shapes for apples-to-apples
foveated-vs-uniform speedup curves.

Usage:
  python -m fovpathtracing_optixcodelatest_tpu.apps.benchmark_sweep \\
      --scene box_city --width 480 --height 270 --frames 4 --out-dir bench_out
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

import numpy as np


SWEEPS = ["32_2_1", "32_4_2", "32_8_4", "32_16_8"]


def run_config(scene, cam, config, schedule, frames: int, seed: int = 0):
    """Returns (fps, ms_per_frame, traces) with honest chained timing."""
    import jax
    import jax.numpy as jnp

    from fovpathtracing_optixcodelatest_tpu.render import film
    from fovpathtracing_optixcodelatest_tpu.render.renderer import render_frame

    try:  # persistent compile cache (see bench.py)
        jax.config.update("jax_compilation_cache_dir", "/tmp/fovtpu_tpu_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:  # noqa: BLE001
        pass

    w, h = config.width, config.height
    camp = dataclasses.replace(cam, aspect=w / h).device_params()
    pad = film.schedule_padding(schedule, w, h)
    canvas = film.new_canvas(w, h, pad)
    gx = jnp.asarray(w // 2, jnp.int32)
    gy = jnp.asarray(h // 2, jnp.int32)
    key = jax.random.PRNGKey(seed)
    # warmup/compile + one discarded timing window (the first in-process
    # window measures ~25% slow — bench.py discipline)
    for i in range(2):
        canvas, frame, stats = render_frame(
            scene, camp, gx, gy, jnp.asarray(i, jnp.int32), canvas,
            jax.random.fold_in(key, 100 + i), config, schedule,
        )
    _ = np.asarray(frame)
    t0 = time.perf_counter()
    traces = jnp.zeros((), jnp.int32)
    for i in range(frames):
        canvas, frame, stats = render_frame(
            scene, camp, gx, gy, jnp.asarray(i + 1, jnp.int32), canvas,
            jax.random.fold_in(key, i + 1), config, schedule,
        )
        traces = traces + stats["traces"]
    traces = int(traces)  # host sync fence
    dt = time.perf_counter() - t0
    return frames / dt, 1000.0 * dt / frames, traces


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="box_city",
                    choices=["box_city", "cornell"])
    ap.add_argument("--width", type=int, default=480)
    ap.add_argument("--height", type=int, default=270)
    ap.add_argument("--frames", type=int, default=3)
    ap.add_argument("--uniform-spp", type=int, default=32,
                    help="full-resolution baseline spp (reference: 32)")
    ap.add_argument("--skip-uniform", action="store_true",
                    help="skip the (slow) uniform full-spp baseline")
    ap.add_argument("--scale-rings", action="store_true",
                    help="scale the 74/241 ring radii from their 960x540 "
                         "design resolution to --height")
    ap.add_argument("--out-dir", default="bench_out")
    args = ap.parse_args(argv)

    from fovpathtracing_optixcodelatest_tpu.config import (
        FoveationSchedule,
        RenderConfig,
    )
    from fovpathtracing_optixcodelatest_tpu.models import scenes
    from fovpathtracing_optixcodelatest_tpu.models.probe import gradient_sky_probe
    from fovpathtracing_optixcodelatest_tpu.models.scene import build_scene

    os.makedirs(args.out_dir, exist_ok=True)
    meshes, cam = (
        scenes.box_city() if args.scene == "box_city" else scenes.cornell()
    )
    scene = build_scene(meshes, probe=gradient_sky_probe())
    config = RenderConfig(width=args.width, height=args.height)
    print(f"{args.scene}: {scene.num_triangles} tris", file=sys.stderr)

    if args.scale_rings:
        scale = args.height / 540.0
        inner, outer = max(int(74 * scale), 4), max(int(241 * scale), 12)
    else:
        inner, outer = 74, 241
    results = {}
    for name in SWEEPS:
        f, a, p = (int(x) for x in name.split("_"))
        sched = FoveationSchedule.sweep(f, a, p, inner=inner, outer=outer)
        fps, ms, traces = run_config(scene, cam, config, sched, args.frames)
        results[f"fov_{name}"] = (fps, ms, traces)
        print(f"fov {name}: {fps:.2f} fps, {ms:.0f} ms/frame", file=sys.stderr)
        # per-config TSV like sponza_fov_32_*.tsv (tri-count tag first line)
        with open(os.path.join(args.out_dir, f"{args.scene}_fov_{name}.tsv"), "w") as fh:
            fh.write(f"{scene.num_triangles:.0e}\n")
            fh.write("config\tfps\tms_per_frame\ttraces\n")
            fh.write(f"{name}\t{fps:.3f}\t{ms:.1f}\t{traces}\n")

    if not args.skip_uniform:
        sched_u = FoveationSchedule.uniform(args.uniform_spp)
        # the uniform baseline runs at ITS best settings (two-phase staging
        # pays off on incoherent foveated loads but costs ~20% on huge
        # coherent uniform batches) — an honest baseline is a fast baseline
        cfg_u = dataclasses.replace(config, traversal_phase1_cap=0)
        fps, ms, traces = run_config(scene, cam, cfg_u, sched_u, args.frames)
        results["uniform"] = (fps, ms, traces)
        print(f"uniform {args.uniform_spp}spp: {fps:.2f} fps, {ms:.0f} ms",
              file=sys.stderr)

    # frame_rate.dat / rendering_time.dat style summaries
    with open(os.path.join(args.out_dir, "frame_rate.dat"), "w") as fh:
        fh.write("\t".join(results.keys()) + "\n")
        fh.write("\t".join(f"{v[0]:.3f}" for v in results.values()) + "\n")
    with open(os.path.join(args.out_dir, "rendering_time.dat"), "w") as fh:
        fh.write("\t".join(results.keys()) + "\n")
        fh.write("\t".join(f"{v[1]:.1f}" for v in results.values()) + "\n")
    if "uniform" in results:
        base = results["uniform"][1]
        for k, v in results.items():
            if k != "uniform":
                print(f"speedup {k} vs uniform: {base / v[1]:.1f}x",
                      file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
