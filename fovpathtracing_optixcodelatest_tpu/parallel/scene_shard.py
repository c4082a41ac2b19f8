"""Multi-chip rendering with the TRIANGLE TABLE sharded across the mesh.

The sample-parallel renderer (parallel/tiles.py) replicates the whole scene
per chip; at the San-Miguel scale that replication is the memory wall —
tri_pack alone is 1.9 GB at 10M triangles (~2/3 of the scene footprint,
Scene.memory_report). This mode row-shards tri_pack over the same 1-D
sample mesh: chip d owns global rows [d*R, (d+1)*R), and the integrator's
shading gathers run a ppermute RING over the blocks
(render/integrator.take_tri_pack): D-1 rotations visit every block on
every chip, each chip accumulating (integer-domain, bit-exact) the rows
its own sample slice needs — BIT-IDENTICAL to the replicated render while
per-chip triangle-table memory is 1/D.

Cost model (v5e-class): the whole table transits ICI once per bounce
gather (1.9 GB at 10M tris; ~40 ms at 50 GB/s ICI) — a prototype trade of
bandwidth for 1.9 GB/chip of memory headroom at the 10M scale. The
production refinement is lane-sorting by tri id + all_to_all so only the
requested rows move. The BVH table (686 MB at 10M,
leaf rows embed their triangles) stays replicated; sharding IT needs the
treelet-window serving loop to all-gather row windows instead of rows —
the documented follow-on, not attempted here (the in-loop gather runs
every ~50 us iteration; a per-iteration collective is the wrong shape).

Design twin: sutil/WorkDistribution.h:34-91 distributes WORK across GPUs;
this distributes the SCENE — the axis the reference never had (single-GPU,
CUDAOutputBuffer.h:47-51 multi-GPU modes unused).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from fovpathtracing_optixcodelatest_tpu.config import (
    FoveationSchedule,
    RenderConfig,
)
from fovpathtracing_optixcodelatest_tpu.models.scene import Scene
from fovpathtracing_optixcodelatest_tpu.parallel.tiles import (
    AXIS,
    _device_sample_ids,
    make_mesh,
)
from fovpathtracing_optixcodelatest_tpu.render import film
from fovpathtracing_optixcodelatest_tpu.render.renderer import (
    frame_wavefront,
    pass_backplate,
)

__all__ = ["make_mesh", "pad_scene_rows", "render_frame_scene_sharded"]


def pad_scene_rows(scene: Scene, n_dev: int) -> Scene:
    """Pad tri_pack to a row multiple of ``n_dev`` (shard_map needs equal
    blocks). Padded rows are all-zero and unreachable: traversal tri ids are
    always < num_triangles. Host-side, one re-upload."""
    t = scene.geom.tri_pack.shape[0]
    pad = (-t) % n_dev
    if pad == 0:
        return scene
    tp = np.asarray(scene.geom.tri_pack)
    tp = np.vstack([tp, np.zeros((pad, tp.shape[1]), tp.dtype)])
    return dataclasses.replace(
        scene,
        geom=dataclasses.replace(scene.geom, tri_pack=jnp.asarray(tp)),
    )


def render_frame_scene_sharded(
    scene: Scene,
    camera,
    gaze_x: jnp.ndarray,
    gaze_y: jnp.ndarray,
    subframe: jnp.ndarray,
    canvas: jnp.ndarray,
    key: jnp.ndarray,
    config: RenderConfig,
    schedule: FoveationSchedule,
    mesh,
):
    """render_frame over a mesh with tri_pack ROW-SHARDED (P(AXIS) on its
    leading axis) and samples split per chip — same outputs (replicated),
    bit-identical to the single-chip renderer. Call pad_scene_rows first;
    jit-compatible with static (config, schedule, mesh)."""
    n_dev = mesh.shape[AXIS]
    assert scene.geom.tri_pack.shape[0] % n_dev == 0, (
        "pad_scene_rows(scene, n_dev) first"
    )
    assert scene.demand is None, "demand textures + scene shard: not wired"
    w, h = config.width, config.height
    pad = film.schedule_padding(schedule, w, h)

    def body(scene, camera, gaze_x, gaze_y, subframe, canvas, key):
        # mark the local tri_pack block so the integrator's shading gathers
        # go through the psum path (static flag -> traced once per mesh)
        scene = dataclasses.replace(
            scene,
            geom=dataclasses.replace(
                scene.geom, pack_shard_axis=AXIS, pack_shard_n=n_dev
            ),
        )
        dev = jax.lax.axis_index(AXIS)
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
            rad = out["radiance"][ofs : ofs + n_i].reshape(n_pix, k, 3).sum(1)
            alp = out["alpha"][ofs : ofs + n_i].reshape(n_pix, k, 3).sum(1)
            rad = jax.lax.psum(rad, AXIS)
            alp = jax.lax.psum(alp, AXIS)
            backplate = pass_backplate(
                scene, camera, rays, w, h, p, gaze_x, gaze_y
            )
            accum_color = film.shade_to_accum_color(
                rad, alp, backplate, p.spp, rays["launch"]
            )
            canvas = film.composite_pass(
                canvas, accum_color, rays["ring"], p, rays["offset"],
                subframe, pad, config.accumulate,
            )
        total_traces = jax.lax.psum(out["traces"], AXIS)
        frame = film.finalize(canvas, pad, config)
        return canvas, frame, total_traces

    scene_spec = jax.tree_util.tree_map(lambda _: P(), scene)
    scene_spec = dataclasses.replace(
        scene_spec,
        geom=dataclasses.replace(scene_spec.geom, tri_pack=P(AXIS)),
    )
    sharded = shard_map(
        body,
        mesh=mesh,
        in_specs=(scene_spec, P(), P(), P(), P(), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return sharded(scene, camera, gaze_x, gaze_y, subframe, canvas, key)
