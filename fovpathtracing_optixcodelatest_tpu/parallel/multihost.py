"""Multi-host (multi-process) distributed rendering over DCN.

The single-host multi-chip path (parallel/tiles.py) psums per-pixel partial
sums over ICI. Across HOSTS the same SPMD program runs in one process per
host, joined by jax.distributed: the mesh spans every process's devices, the
psum crosses the host boundary (DCN on real pods), and each host ends up
with the fully-assembled replicated frame — the "multi-GPU + network" story
the reference never built (its one distribution artifact is the unused
StaticWorkDistribution tile scheduler, sutil/WorkDistribution.h:34-91).

``RenderJob`` describes WHAT to render (scene preset or OBJ path, probe,
config, schedule, camera gaze/seed) as a picklable spec, so callers spawn
workers for arbitrary renders — round 2's worker hardcoded its demo scene.

``worker()`` is the per-process entry: initialize the coordination service,
build the global mesh, render the job's frames, return the last frame. It
validates on CPU hosts (tests spawn N OS processes with virtual CPU
devices); on a TPU pod the same code path runs once per host with
``local_devices=None`` (jax.distributed auto-detects the TPU topology).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class RenderJob:
    """Picklable description of one distributed render.

    ``scene`` is a preset name from models/scenes.py (or pass ``obj_path``);
    ``schedule`` is either a FoveationSchedule (frozen dataclass — pickles)
    or a spec string ("uniform:N" / "F_A_P"); ``config_overrides`` are
    RenderConfig field overrides beyond width/height.
    """

    width: int = 32
    height: int = 24
    scene: str = "cornell"
    scene_kwargs: tuple = (("sphere_subdiv", 0),)
    obj_path: Optional[str] = None
    probe: str = "gradient"  # "gradient" | "constant"
    probe_kwargs: tuple = (("width", 32), ("height", 16))
    schedule: object = None  # FoveationSchedule | spec string | None=demo
    config_overrides: tuple = (("max_depth", 2),)
    frames: int = 1
    gaze: Optional[Tuple[int, int]] = None
    seed: int = 0


def _build_job(job: RenderJob):
    """Shared (scene, config, schedule, camera_params, canvas, pad) builder
    used by every process AND by the single-process reference twin."""
    import jax.numpy as jnp  # noqa: F401 — jax must already be configured

    from fovpathtracing_optixcodelatest_tpu.config import (
        FoveationPass,
        FoveationSchedule,
        RenderConfig,
    )
    from fovpathtracing_optixcodelatest_tpu.models import scenes
    from fovpathtracing_optixcodelatest_tpu.models.probe import (
        constant_probe,
        gradient_sky_probe,
    )
    from fovpathtracing_optixcodelatest_tpu.models.scene import build_scene
    from fovpathtracing_optixcodelatest_tpu.render import film

    if job.obj_path:
        from fovpathtracing_optixcodelatest_tpu.models.obj_loader import (
            load_obj,
        )

        meshes, textures = load_obj(job.obj_path)
        from fovpathtracing_optixcodelatest_tpu.models.camera import Camera

        cam = Camera(eye=(3.0, 1.5, 3.0), lookat=(0.0, 0.0, 0.0), fov_y=45.0)
    else:
        meshes, cam = getattr(scenes, job.scene)(**dict(job.scene_kwargs))
        textures = None
    probe = (
        gradient_sky_probe(**dict(job.probe_kwargs))
        if job.probe == "gradient"
        else constant_probe((2.0, 2.0, 2.0))
    )
    scene = build_scene(meshes, probe=probe, texture_images=textures)
    config = RenderConfig(
        width=job.width, height=job.height, **dict(job.config_overrides)
    )
    sched = job.schedule
    if sched is None:
        r = 5
        sched = FoveationSchedule(
            passes=(
                FoveationPass(factor=4, spp=2, r_inner=float(r),
                              r_outer=1e9, redraw=False),
                FoveationPass(factor=1, spp=4, r_inner=0.0,
                              r_outer=float(r + 1), redraw=True,
                              launch_w=2 * (r + 1), launch_h=2 * (r + 1),
                              centered=True, center_offset=r + 1),
            )
        )
    elif isinstance(sched, str):
        from fovpathtracing_optixcodelatest_tpu.apps.main import (
            build_schedule,
        )

        sched = build_schedule(sched)
    camp = dataclasses.replace(
        cam, aspect=job.width / job.height
    ).device_params()
    pad = film.schedule_padding(sched, job.width, job.height)
    canvas = film.new_canvas(job.width, job.height, pad)
    return scene, config, sched, camp, canvas


def worker(
    process_id: int,
    num_processes: int,
    coordinator: str = "localhost:9911",
    local_devices: Optional[int] = 4,
    *,
    job: Optional[RenderJob] = None,
    **legacy_dims,
) -> Tuple:
    """Run one render process; returns (frame ndarray, traces int).

    Must be called in a FRESH process before jax initializes a backend.
    ``local_devices`` forces that many virtual CPU devices (the test path);
    None = use the attached accelerators (the real-pod path: one worker per
    host, TPU topology auto-detected by jax.distributed).
    """
    if job is None:
        job = RenderJob(**legacy_dims)

    if local_devices is not None:
        import os

        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags
                + f" --xla_force_host_platform_device_count={local_devices}"
            ).strip()
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    if local_devices is not None:
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )

    import jax.numpy as jnp
    import numpy as np

    from fovpathtracing_optixcodelatest_tpu.parallel import tiles

    if local_devices is not None:
        assert len(jax.devices()) == num_processes * local_devices, (
            jax.devices()
        )
    mesh = tiles.make_mesh()  # global mesh across all processes

    scene, config, schedule, camp, canvas = _build_job(job)
    gaze = job.gaze or (job.width // 2, job.height // 2)

    fn = tiles.make_sharded_renderer(config, schedule, mesh)
    frame = traces = None
    key = jax.random.PRNGKey(job.seed)
    total_traces = 0
    for i in range(job.frames):
        canvas, frame, traces = fn(
            scene, camp,
            jnp.asarray(gaze[0], jnp.int32),
            jnp.asarray(gaze[1], jnp.int32),
            jnp.asarray(i, jnp.int32),
            canvas, jax.random.fold_in(key, i),
        )
        total_traces += int(traces)
    out = np.asarray(frame), total_traces
    jax.distributed.shutdown()
    return out


def reference_frame(
    width: int = 32, height: int = 24, job: Optional[RenderJob] = None
):
    """The single-process twin of worker()'s render (for bit-identity
    checks). Same job spec/seed; any device count."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fovpathtracing_optixcodelatest_tpu.render.renderer import render_frame

    if job is None:
        job = RenderJob(width=width, height=height)
    scene, config, schedule, camp, canvas = _build_job(job)
    gaze = job.gaze or (job.width // 2, job.height // 2)
    key = jax.random.PRNGKey(job.seed)
    frame = None
    for i in range(job.frames):
        canvas, frame, _stats = render_frame(
            scene, camp,
            jnp.asarray(gaze[0], jnp.int32),
            jnp.asarray(gaze[1], jnp.int32),
            jnp.asarray(i, jnp.int32),
            canvas, jax.random.fold_in(key, i), config, schedule,
        )
    return np.asarray(frame)
