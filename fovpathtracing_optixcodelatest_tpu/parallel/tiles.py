"""Multi-chip frame rendering: sample-parallel shard_map + psum assembly.

Design twin: sutil/WorkDistribution.h:34-91 round-robins tile strips across
GPUs for load balance. On TPU we shard the *sample* dimension instead: every
chip renders every pixel of every pass but only spp/D of its samples, then the
per-pixel partial sums are ``psum``ed over ICI. This is perfectly
load-balanced by construction (no fovea/periphery imbalance across chips),
needs exactly one small collective per pass ((P,3)+(P,3) floats), and — because
all randomness is keyed by global ray id (ops/rng.py) — produces BIT-IDENTICAL
images to the single-chip renderer.

Scene data is replicated per chip (Sponza-class scenes fit HBM easily); DCN
would only enter for multi-host frame collection, which is the host's
``jax.device_get`` of an already-replicated frame.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from fovpathtracing_optixcodelatest_tpu.config import FoveationSchedule, RenderConfig
from fovpathtracing_optixcodelatest_tpu.models.camera import CameraParams
from fovpathtracing_optixcodelatest_tpu.models.scene import Scene
from fovpathtracing_optixcodelatest_tpu.render import film
from fovpathtracing_optixcodelatest_tpu.render.renderer import (
    frame_wavefront,
    pass_backplate,
)

AXIS = "samples"


def make_mesh(devices: Optional[Sequence] = None) -> Mesh:
    """1-D device mesh over the sample axis (all visible devices by default)."""
    import numpy as np

    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.asarray(devices), (AXIS,))


def _device_sample_ids(spp: int, n_dev: int, dev_index) -> jnp.ndarray:
    """Contiguous per-device slice of the (padded) sample slots. Slots >= spp
    are generated but masked inactive by raygen."""
    per_dev = -(-spp // n_dev)  # ceil
    return dev_index * per_dev + jnp.arange(per_dev, dtype=jnp.int32)


def render_frame_sharded(
    scene: Scene,
    camera: CameraParams,
    gaze_x: jnp.ndarray,
    gaze_y: jnp.ndarray,
    subframe: jnp.ndarray,
    canvas: jnp.ndarray,
    key: jnp.ndarray,
    config: RenderConfig,
    schedule: FoveationSchedule,
    mesh: Mesh,
):
    """Multi-chip render_frame: same signature + mesh, same outputs (replicated).

    jit-compatible: wrap in jax.jit with static config/schedule or use
    ``make_sharded_renderer`` for a ready-jitted closure.
    """
    n_dev = mesh.shape[AXIS]
    w, h = config.width, config.height
    pad = film.schedule_padding(schedule, w, h)

    def body(scene, camera, gaze_x, gaze_y, subframe, canvas, key):
        dev = jax.lax.axis_index(AXIS)
        # every chip traces ONE merged wavefront holding its sample slice of
        # every pass (same merged structure as the single-chip render_frame;
        # ray ids — and therefore RNG streams and per-ray radiance — are
        # device-count-invariant, so the psum'd sums are bit-identical)
        sample_ids = [
            _device_sample_ids(p.spp, n_dev, dev) for p in schedule.passes
        ]
        rays_list, out, offsets = frame_wavefront(
            scene, camera, gaze_x, gaze_y, key, config, schedule,
            sample_ids_per_pass=sample_ids,
        )
        for p, rays, ofs in zip(schedule.passes, rays_list, offsets):
            lw, lh = rays["launch"]
            k = rays["samples_here"]
            n_pix = lw * lh
            n_i = n_pix * k
            rad_sum = out["radiance"][ofs : ofs + n_i].reshape(n_pix, k, 3).sum(1)
            alpha_sum = out["alpha"][ofs : ofs + n_i].reshape(n_pix, k, 3).sum(1)
            # assemble the full per-pixel sums over ICI
            rad_sum = jax.lax.psum(rad_sum, AXIS)
            alpha_sum = jax.lax.psum(alpha_sum, AXIS)
            backplate = pass_backplate(scene, camera, rays, w, h, p, gaze_x, gaze_y)
            accum_color = film.shade_to_accum_color(
                rad_sum, alpha_sum, backplate, p.spp, rays["launch"]
            )
            canvas = film.composite_pass(
                canvas, accum_color, rays["ring"], p, rays["offset"],
                subframe, pad, config.accumulate,
            )
        total_traces = jax.lax.psum(out["traces"], AXIS)
        frame = film.finalize(canvas, pad, config)
        return canvas, frame, total_traces

    sharded = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(), P()),  # all replicated
        out_specs=(P(), P(), P()),
        # The traversal while_loop mixes device-varying ray state with
        # device-invariant init values; skip the VMA check (outputs are made
        # replicated by the explicit psums above).
        check_vma=False,
    )
    return sharded(scene, camera, gaze_x, gaze_y, subframe, canvas, key)


def make_sharded_renderer(config: RenderConfig, schedule: FoveationSchedule,
                          mesh: Mesh):
    """Jitted closure over the static args."""

    @jax.jit
    def fn(scene, camera, gaze_x, gaze_y, subframe, canvas, key):
        return render_frame_sharded(
            scene, camera, gaze_x, gaze_y, subframe, canvas, key,
            config, schedule, mesh,
        )

    return fn
