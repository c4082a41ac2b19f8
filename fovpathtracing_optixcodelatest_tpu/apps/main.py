"""CLI frame-loop driver — the twin of PT_sv5_/main.cpp, with every
compile-time ``#define`` promoted to a flag (SURVEY.md §5.6):

- scene presets / OBJ path  (main.cpp:24-29, :195-205)
- env HDR probe vs solid ambient light (:33-36, :211-233)
- camera presets + motion mode STATIC/PER_FRAME/PER_TIME (:40-42, :373-398)
- gaze: static center or animated orbit (cursor stand-in, :352-368)
- foveation schedule / uniform mode + spp sweep (SimplePathtracer.cpp:20-23)
- per-frame TSV telemetry (SAVE_DATA_ON, sutil.cpp:806-823)
- headless PNG/PFM output (the 02-sample golden path) + checkpoint/resume

Usage examples:
  python -m fovpathtracing_optixcodelatest_tpu.apps.main --scene cornell \\
      --frames 8 --out frame.png
  python -m ... --scene box_city --schedule 32_16_8 --width 960 --height 540 \\
      --tsv run.tsv --gaze-mode orbit
  python -m ... --obj /path/model.obj --hdr /path/env.hdr --frames 64
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import math
import sys

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="TPU foveated path tracer")
    p.add_argument("--scene", default="cornell",
                   choices=["cornell", "box_city", "furnace"],
                   help="procedural scene preset (the reference's scene #defines)")
    p.add_argument("--obj", default=None, help="OBJ file to render instead")
    p.add_argument("--hdr", default=None,
                   help="lat-long HDR/PFM/PNG environment probe (ENV_LIGHT_ON)")
    p.add_argument("--ambient", type=float, default=2.5,
                   help="solid ambient probe radiance (AMBIENT_LIGHT, 5*0.5)")
    p.add_argument("--probe-prefilter", action="store_true",
                   help="3x3 Gaussian-prefiltered env CDF "
                        "(OptixUtils Texture.cpp variant)")
    p.add_argument("--width", type=int, default=480)
    p.add_argument("--height", type=int, default=270)
    p.add_argument("--frames", type=int, default=4)
    p.add_argument("--schedule", default="32_16_8",
                   help="'uniform:N' or foveated sweep 'F_A_P' spp triple")
    p.add_argument("--gaze-mode", default="static", choices=["static", "orbit"],
                   help="static center (STATIC_ON) or animated gaze")
    p.add_argument("--camera-mode", default="static",
                   choices=["static", "per_frame", "per_time"],
                   help="camera motion: PER_FRAME counter orbit or PER_TIME "
                        "wall-clock dolly (main.cpp:373-398)")
    p.add_argument("--no-accumulate", action="store_true")
    p.add_argument("--out", default=None, help="output PNG path (last frame)")
    p.add_argument("--aov-out", default=None,
                   help="NPZ path for accum/normal/albedo AOVs")
    p.add_argument("--denoise", action="store_true",
                   help="apply the atrous denoiser to the final frame")
    p.add_argument("--tsv", default=None, help="per-frame TSV telemetry path")
    p.add_argument("--checkpoint", default=None, help="checkpoint NPZ path")
    p.add_argument("--resume", default=None, help="resume from checkpoint NPZ")
    p.add_argument("--config-json", default=None,
                   help="JSON file overriding RenderConfig fields")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--sampler", default="random",
                   choices=["random", "stratified", "blue_noise"],
                   help="AA sample generator (sample.h's toolbox)")
    p.add_argument("--spectral", action="store_true",
                   help="hero-wavelength spectral path tracing (dispersive "
                        "glass; the reference's spectrum.h never renders)")
    p.add_argument("--dispersion", type=float, default=4200.0,
                   help="Cauchy B coefficient (nm^2) for --spectral")
    p.add_argument("--viewer", action="store_true",
                   help="serve the interactive browser viewer (cursor = "
                        "gaze, drag = orbit, wheel = zoom) instead of the "
                        "batch frame loop")
    p.add_argument("--viewer-port", type=int, default=8000)
    p.add_argument("--viewer-host", default="127.0.0.1",
                   help="viewer bind address (loopback by default; the "
                        "stream/control endpoints are unauthenticated — "
                        "pass 0.0.0.0 to expose them deliberately)")
    p.add_argument("--viewer-schedules", default="",
                   help="comma-separated schedule specs ('F_A_P' or "
                        "'uniform:N') the viewer's 's' key cycles through, "
                        "in addition to the launch schedule")
    p.add_argument("--demand-textures", action="store_true",
                   help="page textures on demand (64-texel tile atlas + "
                        "request feedback; the reference's DemandLoading "
                        "library) instead of fully-resident uploads")
    p.add_argument("--demand-pages", type=int, default=1024,
                   help="demand-texture atlas capacity in 64x64 tiles")
    p.add_argument("--multichip", default=None,
                   choices=["samples", "scene"],
                   help="render across all visible chips: 'samples' splits "
                        "spp per chip (psum assembly, parallel/tiles.py); "
                        "'scene' additionally row-shards the triangle table "
                        "so per-chip scene memory is 1/N "
                        "(parallel/scene_shard.py). Both bit-identical to "
                        "single-chip.")
    p.add_argument("--no-progressive", action="store_true",
                   help="disable the viewer's progressive startup (quarter-"
                        "res warmup frames while the full-res executable "
                        "compiles in the background)")
    return p.parse_args(argv)


def build_schedule(spec: str):
    from fovpathtracing_optixcodelatest_tpu.config import FoveationSchedule

    if spec.startswith("uniform"):
        spp = int(spec.split(":")[1]) if ":" in spec else 4
        return FoveationSchedule.uniform(spp)
    f, a, per = (int(x) for x in spec.split("_"))
    return FoveationSchedule.sweep(f, a, per)


def main(argv=None) -> int:
    args = parse_args(argv)

    import os as _os

    import jax as _jax

    # honor JAX_PLATFORMS even under plugin backends that ignore the env var
    # alone (the axon TPU plugin registers regardless — CLAUDE.md gotcha;
    # `JAX_PLATFORMS=cpu python -m ...apps.main` must really run on CPU)
    if _os.environ.get("JAX_PLATFORMS"):
        try:
            _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
        except Exception:  # noqa: BLE001
            pass

    # persistent compile cache (frame graphs are ~minutes cold; see bench.py)
    try:
        _jax.config.update("jax_compilation_cache_dir", "/tmp/fovtpu_tpu_cache")
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:  # noqa: BLE001 — cache is an optimization only
        pass

    from fovpathtracing_optixcodelatest_tpu.config import RenderConfig
    from fovpathtracing_optixcodelatest_tpu.models import scenes
    from fovpathtracing_optixcodelatest_tpu.models.camera import Camera
    from fovpathtracing_optixcodelatest_tpu.models.obj_loader import load_obj
    from fovpathtracing_optixcodelatest_tpu.models.probe import (
        build_cdf,
        constant_probe,
    )
    from fovpathtracing_optixcodelatest_tpu.models.scene import build_scene
    from fovpathtracing_optixcodelatest_tpu.render.renderer import Renderer
    from fovpathtracing_optixcodelatest_tpu.utils import checkpoint as ckpt
    from fovpathtracing_optixcodelatest_tpu.utils.image import (
        load_hdr_probe,
        save_image,
        save_npz_frame,
        save_png,
    )
    from fovpathtracing_optixcodelatest_tpu.utils.metrics import (
        FrameTimers,
        TsvLogger,
    )

    # ---- scene ----
    textures = []
    if args.obj:
        meshes, textures = load_obj(args.obj)
        lo = min(float(m.vertex.min()) for m in meshes if len(m.vertex))
        hi = max(float(m.vertex.max()) for m in meshes if len(m.vertex))
        span = float(hi - lo) or 1.0
        cam = Camera(eye=(span, span * 0.4, span),
                     lookat=(0.0, 0.0, 0.0), fov_y=45.0,
                     aspect=args.width / args.height)
    elif args.scene == "cornell":
        meshes, cam = scenes.cornell()
    elif args.scene == "box_city":
        meshes, cam = scenes.box_city()
    else:
        meshes, cam = scenes.furnace_sphere()
    cam = dataclasses.replace(cam, aspect=args.width / args.height)

    # ---- lighting (ENV_LIGHT_ON vs AMBIENT_LIGHT) ----
    if args.hdr:
        data = load_hdr_probe(args.hdr)
        if data is None:
            print(f"failed to load probe {args.hdr}", file=sys.stderr)
            return 1
        probe = build_cdf(data, prefilter=args.probe_prefilter)
    else:
        probe = constant_probe((args.ambient,) * 3)

    overrides = {}
    if args.config_json:
        with open(args.config_json) as fh:
            overrides = json.load(fh)
    config = RenderConfig(**{
        "width": args.width, "height": args.height,
        "accumulate": not args.no_accumulate, "sampler": args.sampler,
        "spectral": args.spectral, "dispersion": args.dispersion,
        **overrides,
    })
    schedule = build_schedule(args.schedule)

    demand_loader = None
    if args.demand_textures and textures:
        # route textures through the demand-loading subsystem (lib/
        # DemandLoading twin): tiles page in as frames sample them
        from fovpathtracing_optixcodelatest_tpu.models.demand import (
            DemandLoader,
        )

        demand_loader = DemandLoader(max_pages=args.demand_pages)
        for img in textures:
            demand_loader.create_texture(img)
        textures = []  # no resident TextureArray copies
    scene = build_scene(meshes, probe=probe, texture_images=textures)
    print(
        f"scene: {scene.num_triangles} tris, bvh rows {scene.bvh.num_rows}",
        file=sys.stderr,
    )
    renderer = Renderer(scene=scene, config=config, schedule=schedule,
                        seed=args.seed, demand_loader=demand_loader,
                        multichip=args.multichip)
    renderer.set_camera(cam)
    if args.resume:
        ckpt.resume_renderer(renderer, args.resume)

    if args.viewer:
        from fovpathtracing_optixcodelatest_tpu.apps import viewer as viewer_mod
        from fovpathtracing_optixcodelatest_tpu.models.camera import Trackball

        tb = Trackball(camera=cam)
        tb.reinitialize_from_camera()
        extra = [
            (s, build_schedule(s))
            for s in args.viewer_schedules.split(",") if s
        ]
        viewer_mod.serve(renderer, tb, port=args.viewer_port,
                         host=args.viewer_host,
                         progressive=not args.no_progressive,
                         schedules=extra)
        return 0

    timers = FrameTimers()
    tsv = TsvLogger(args.tsv) if args.tsv else None
    base_eye = np.asarray(cam.eye)
    frame = None
    for i in range(args.frames):
        timers.begin("state_update")
        gaze = None
        if args.gaze_mode == "orbit":
            ang = 2 * math.pi * i / max(args.frames, 1)
            gaze = (
                int(args.width / 2 + 0.25 * args.width * math.cos(ang)),
                int(args.height / 2 + 0.25 * args.height * math.sin(ang)),
            )
        if args.camera_mode == "per_frame":
            ang = 2 * math.pi * i / max(args.frames, 1) * 0.05
            eye = (
                float(base_eye[0] * math.cos(ang) - base_eye[2] * math.sin(ang)),
                float(base_eye[1]),
                float(base_eye[0] * math.sin(ang) + base_eye[2] * math.cos(ang)),
            )
            renderer.set_camera(dataclasses.replace(cam, eye=eye))
        elif args.camera_mode == "per_time":
            # PER_TIME (main.cpp:391-393): eye.z = cos(wall_time) * radius
            import time as _time

            radius = float(
                np.linalg.norm(base_eye - np.asarray(cam.lookat))
            )
            eye = (
                float(base_eye[0]), float(base_eye[1]),
                float(math.cos(_time.perf_counter()) * radius),
            )
            renderer.set_camera(dataclasses.replace(cam, eye=eye))
        timers.end("state_update")

        timers.begin("render")
        frame = renderer.render(gaze=gaze)
        if renderer.demand_loader is not None:
            n_req = renderer.process_demand_requests()
            if n_req:
                print(f"demand: +{n_req} tiles "
                      f"({renderer.demand_loader.num_tiles_loaded} loaded, "
                      f"{renderer.demand_loader.num_tiles_evicted} evicted)",
                      file=sys.stderr)
        timers.end("render")

        timers.begin("display")
        if args.out and i == args.frames - 1:
            # V-up convention: flip for display
            if args.out.lower().endswith((".exr", ".pfm")):
                save_image(args.out, renderer.linear_frame()[::-1])
            else:
                save_image(args.out, frame[::-1])
        timers.end("display")
        timers.frame_done()
        if tsv:
            tsv.log(timers, gaze=gaze or (args.width // 2, args.height // 2),
                    subframe=renderer.subframe)
        print(timers.stats_line(gaze or (0, 0), renderer.subframe),
              file=sys.stderr)
        if args.checkpoint:
            ckpt.checkpoint_renderer(renderer, args.checkpoint, camera=cam)

    if args.aov_out or args.denoise:
        import jax
        import jax.numpy as jnp

        from fovpathtracing_optixcodelatest_tpu.ops.denoise import atrous_denoise
        from fovpathtracing_optixcodelatest_tpu.render import film as film_mod
        from fovpathtracing_optixcodelatest_tpu.render.renderer import (
            render_frame_aov,
        )

        gx = jnp.asarray(args.width // 2, jnp.int32)
        gy = jnp.asarray(args.height // 2, jnp.int32)
        canvas, _f, aovs, _s = render_frame_aov(
            renderer.scene, renderer.camera_params, gx, gy,
            jnp.asarray(renderer.subframe, jnp.int32), renderer.canvas,
            jax.random.PRNGKey(args.seed + 999), config, schedule,
        )
        if args.aov_out:
            save_npz_frame(args.aov_out, **aovs)
        if args.denoise and args.out:
            from fovpathtracing_optixcodelatest_tpu.ops import tonemap

            clean = atrous_denoise(aovs["accum"], aovs["normal"], aovs["albedo"])
            u8 = tonemap.postprocess(
                clean, exposure_stops=config.exposure_stops, white=config.white,
                exposure_on=config.exposure_correction,
                tonemap_on=config.tone_mapping,
            )
            save_png(args.out.replace(".png", "_denoised.png"), np.asarray(u8)[::-1])
    if tsv:
        tsv.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
