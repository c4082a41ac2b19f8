"""The Renderer front-end: the SampleRenderer twin.

Maps the reference's host renderer API (SimplePathtracer.h:45-189) onto the
TPU stack: construction builds the scene pytree (the ctor's 10-step OptiX
setup collapses into Scene build + one jit), ``render(gaze)`` runs the
foveated multi-pass frame (render(), SimplePathtracer.cpp:77-214),
``resize``/``set_camera``/``set_probe``/``download_pixels`` mirror :228-308.

The whole frame — every pass's raygen, wavefront integration, and film
composite — is ONE jitted function of (scene, camera, gaze, subframe, canvas,
key); passes unroll statically from the FoveationSchedule. Accumulation state
(canvas + subframe index) is functional: render_frame returns the new canvas,
and the class shell carries it between frames (the reference's persistent
accum_buffer + subframe_index, SimplePathtracer.cpp:210-211).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fovpathtracing_optixcodelatest_tpu.config import FoveationSchedule, RenderConfig
from fovpathtracing_optixcodelatest_tpu.models.camera import Camera, CameraParams
from fovpathtracing_optixcodelatest_tpu.models.mesh import HostMesh
from fovpathtracing_optixcodelatest_tpu.models.probe import ProbeParams
from fovpathtracing_optixcodelatest_tpu.models.scene import Scene, build_scene
from fovpathtracing_optixcodelatest_tpu.ops import probe_sampling as probe_ops
from fovpathtracing_optixcodelatest_tpu.render import film, raygen
from dataclasses import replace as dataclasses_replace

from fovpathtracing_optixcodelatest_tpu.render.integrator import trace_paths


def render_pass_partial(
    scene: Scene,
    camera: CameraParams,
    p,
    width: int,
    height: int,
    gaze_x,
    gaze_y,
    pass_key,
    config: RenderConfig,
    sample_ids: Optional[jnp.ndarray] = None,
):
    """One foveation pass over a subset of its sample slots.

    Returns (rad_sum (P,3), alpha_sum (P,3), backplate (P,3), rays dict,
    traces). Summing these across disjoint sample_id slices reproduces the
    full pass exactly (the psum hook for multi-chip rendering).
    """
    rays = raygen.generate_pass_rays(
        camera, p, width, height, gaze_x, gaze_y,
        jax.random.fold_in(pass_key, 0),
        antialias=config.antialias, sample_ids=sample_ids,
        sampler=config.sampler,
    )
    out = trace_paths(
        scene, rays["origin"], rays["direction"], rays["active"],
        jax.random.fold_in(pass_key, 1), config, ray_ids=rays["ray_ids"],
    )
    lw, lh = rays["launch"]
    k = rays["samples_here"]
    n_pix = lw * lh
    rad_sum = out["radiance"].reshape(n_pix, k, 3).sum(axis=1)
    alpha_sum = out["alpha"].reshape(n_pix, k, 3).sum(axis=1)
    # primary-hit AOV sums (denoiser guide layers, SimplePathtracer.cpp:246-260)
    aovs = {
        "normal": out["normal"].reshape(n_pix, k, 3).sum(axis=1),
        "albedo": out["albedo"].reshape(n_pix, k, 3).sum(axis=1),
    }
    return rad_sum, alpha_sum, rays, out["traces"], aovs


def pass_backplate(scene, camera, rays, width, height, p, gaze_x, gaze_y):
    """Pixel-center probe radiance for the pass grid (backplate compositing,
    deviceProgram.cu:495,558)."""
    lw, lh = rays["launch"]
    ox, oy = rays["offset"]
    lx = jnp.arange(lw, dtype=jnp.int32)
    ly = jnp.arange(lh, dtype=jnp.int32)
    gx, gy = jnp.meshgrid(lx, ly)
    idx_x = gx * p.factor + ox
    idx_y = gy * p.factor + oy
    dirs = raygen.pixel_center_directions(camera, idx_x, idx_y, width, height)
    return probe_ops.probe_eval(scene.probe, probe_ops.dir_to_uv(dirs))


def frame_wavefront(
    scene: Scene,
    camera: CameraParams,
    gaze_x,
    gaze_y,
    key: jnp.ndarray,
    config: RenderConfig,
    schedule: FoveationSchedule,
    sample_ids_per_pass=None,
):
    """Generate + trace ALL foveation passes as ONE merged wavefront.

    The reference renders its three ring regions as three sequential
    optixLaunch calls (SimplePathtracer.cpp:137-209); on TPU that split is
    pure fragmentation — a single ray batch keeps the traversal chunks full
    and pays the per-bounce compaction once. Ray ids carry a static per-pass
    base so every ray's RNG stream is a pure function of (frame key, pass,
    pixel, sample) — independent of batch layout or device sharding.

    ``sample_ids_per_pass`` optionally narrows each pass to a subset of its
    sample slots (sample-parallel multi-chip sharding, parallel/tiles.py).
    Returns (per-pass ray dicts, merged trace_paths output dict, per-pass
    slice offsets).
    """
    w, h = config.width, config.height
    jitter_key = jax.random.fold_in(key, 0)
    path_key = jax.random.fold_in(key, 1)
    rays_list = []
    base = 0
    for i, p in enumerate(schedule.passes):
        sids = None if sample_ids_per_pass is None else sample_ids_per_pass[i]
        rays_list.append(
            raygen.generate_pass_rays(
                camera, p, w, h, gaze_x, gaze_y, jitter_key,
                antialias=config.antialias, sample_ids=sids, ray_id_base=base,
                sampler=config.sampler,
            )
        )
        base += raygen.pass_ray_count(p, w, h)
    merged = {
        k: jnp.concatenate([r[k] for r in rays_list], axis=0)
        for k in ("origin", "direction", "active", "ray_ids")
    }
    n_total = merged["origin"].shape[0]
    budget = sum(
        raygen.pass_active_bound(p, w, h, r["samples_here"])
        for p, r in zip(schedule.passes, rays_list)
    )
    if config.frame_compaction and budget < n_total:
        # ring-budget compaction: actives-first sort, trace only the static
        # any-gaze bound prefix (pass_active_bound — rigorous, so no active
        # lane can land past it), unsort results into the original layout.
        # Dead lanes produce exactly the zeros trace_paths would have
        # produced for them: bit-identical output, ~20% less of every
        # per-lane cost at the reference schedule.
        assert n_total < (1 << 30)
        o, d = merged["origin"], merged["direction"]
        ikey = jnp.where(
            merged["active"], 0, jnp.int32(1) << 30
        ) | jnp.arange(n_total, dtype=jnp.int32)
        s = jax.lax.sort(
            [ikey, o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
             merged["ray_ids"]],
            num_keys=1,
        )
        out_sub = trace_paths(
            scene,
            jnp.stack(s[1:4], axis=1)[:budget],
            jnp.stack(s[4:7], axis=1)[:budget],
            (s[0] < (1 << 30))[:budget],
            path_key, config, ray_ids=s[7][:budget],
            rays_packed=True,  # this sort just packed actives to a prefix
        )
        tail = jnp.zeros((n_total - budget, 3), jnp.float32)
        # AOVs ride the unsort only when a consumer exists (config.need_aov)
        fields = ("radiance", "alpha") + (
            ("normal", "albedo") if config.need_aov else ()
        )
        ops = [s[0] & ((1 << 30) - 1)]
        for f in fields:
            full = jnp.concatenate([out_sub[f], tail], axis=0)
            ops += [full[:, 0], full[:, 1], full[:, 2]]
        u = jax.lax.sort(ops, num_keys=1)
        out = {"traces": out_sub["traces"]}
        if "demand_requests" in out_sub:  # global bitmap — no unsort needed
            out["demand_requests"] = out_sub["demand_requests"]
        for j, f in enumerate(fields):
            out[f] = jnp.stack(u[1 + 3 * j : 4 + 3 * j], axis=1)
        for f in ("normal", "albedo"):
            if f not in out:
                out[f] = jnp.zeros((n_total, 3), jnp.float32)
    else:
        out = trace_paths(
            scene, merged["origin"], merged["direction"], merged["active"],
            path_key, config, ray_ids=merged["ray_ids"],
        )
    offsets = []
    ofs = 0
    for r in rays_list:
        offsets.append(ofs)
        lw, lh = r["launch"]
        ofs += lw * lh * r["samples_here"]
    return rays_list, out, offsets


@functools.partial(jax.jit, static_argnames=("config", "schedule"))
def render_frame(
    scene: Scene,
    camera: CameraParams,
    gaze_x: jnp.ndarray,
    gaze_y: jnp.ndarray,
    subframe: jnp.ndarray,
    canvas: jnp.ndarray,
    key: jnp.ndarray,
    config: RenderConfig,
    schedule: FoveationSchedule,
):
    """One full frame: all foveation passes traced as one merged wavefront.

    Returns (new_canvas, frame_u8 (H,W,3), stats dict). Pass composite order
    matters: later (inner) passes overwrite ring overlap, exactly like the
    reference's three sequential optixLaunch calls
    (SimplePathtracer.cpp:137-209).
    """
    w, h = config.width, config.height
    pad = film.schedule_padding(schedule, w, h)
    rays_list, out, offsets = frame_wavefront(
        scene, camera, gaze_x, gaze_y, key, config, schedule
    )
    total_rays = 0
    for p, rays, ofs in zip(schedule.passes, rays_list, offsets):
        lw, lh = rays["launch"]
        k = rays["samples_here"]
        n_pix = lw * lh
        n_i = n_pix * k
        rad_sum = out["radiance"][ofs : ofs + n_i].reshape(n_pix, k, 3).sum(1)
        alpha_sum = out["alpha"][ofs : ofs + n_i].reshape(n_pix, k, 3).sum(1)
        backplate = pass_backplate(scene, camera, rays, w, h, p, gaze_x, gaze_y)
        accum_color = film.shade_to_accum_color(
            rad_sum, alpha_sum, backplate, p.spp, rays["launch"]
        )
        canvas = film.composite_pass(
            canvas, accum_color, rays["ring"], p, rays["offset"],
            subframe, pad, config.accumulate,
        )
        total_rays += n_pix * p.spp

    frame = film.finalize(canvas, pad, config)
    stats = {"traces": out["traces"], "rays": jnp.asarray(total_rays)}
    if "demand_requests" in out:
        stats["demand_requests"] = out["demand_requests"]
    return canvas, frame, stats


@functools.partial(jax.jit, static_argnames=("config", "schedule"))
def render_frame_aov(
    scene: Scene,
    camera: CameraParams,
    gaze_x: jnp.ndarray,
    gaze_y: jnp.ndarray,
    subframe: jnp.ndarray,
    canvas: jnp.ndarray,
    key: jnp.ndarray,
    config: RenderConfig,
    schedule: FoveationSchedule,
):
    """render_frame + full-frame normal/albedo AOV images (the denoiser guide
    layers the reference allocates, SimplePathtracer.cpp:246-260). AOVs are
    composited per pass with the same block replication as color, always
    overwriting (no accumulation — matching the per-frame AOV writes,
    deviceProgram.cu:611-614)."""
    import dataclasses as _dc

    config = _dc.replace(config, need_aov=True)
    w, h = config.width, config.height
    pad = film.schedule_padding(schedule, w, h)
    normal_canvas = film.new_canvas(w, h, pad)
    albedo_canvas = film.new_canvas(w, h, pad)
    rays_list, out, offsets = frame_wavefront(
        scene, camera, gaze_x, gaze_y, key, config, schedule
    )

    for p, rays, ofs in zip(schedule.passes, rays_list, offsets):
        lw, lh = rays["launch"]
        k = rays["samples_here"]
        n_pix = lw * lh
        n_i = n_pix * k
        rad_sum = out["radiance"][ofs : ofs + n_i].reshape(n_pix, k, 3).sum(1)
        alpha_sum = out["alpha"][ofs : ofs + n_i].reshape(n_pix, k, 3).sum(1)
        aovs = {
            name: out[name][ofs : ofs + n_i].reshape(n_pix, k, 3).sum(1)
            for name in ("normal", "albedo")
        }
        backplate = pass_backplate(scene, camera, rays, w, h, p, gaze_x, gaze_y)
        accum_color = film.shade_to_accum_color(
            rad_sum, alpha_sum, backplate, p.spp, rays["launch"]
        )
        canvas = film.composite_pass(
            canvas, accum_color, rays["ring"], p, rays["offset"],
            subframe, pad, config.accumulate,
        )
        p_overwrite = _dc.replace(p, redraw=True)
        for target, key_name in ((0, "normal"), (1, "albedo")):
            img = (aovs[key_name] / p.spp).reshape(lh, lw, 3)
            if target == 0:
                normal_canvas = film.composite_pass(
                    normal_canvas, img, rays["ring"], p_overwrite,
                    rays["offset"], subframe, pad, False,
                )
            else:
                albedo_canvas = film.composite_pass(
                    albedo_canvas, img, rays["ring"], p_overwrite,
                    rays["offset"], subframe, pad, False,
                )

    frame = film.finalize(canvas, pad, config)
    crop = lambda c: jax.lax.dynamic_slice(c, (pad, pad, 0), (h, w, 3))  # noqa: E731
    aov_out = {
        "accum": crop(canvas),
        "normal": crop(normal_canvas),
        "albedo": crop(albedo_canvas),
    }
    return canvas, frame, aov_out, {"traces": out["traces"]}


class Renderer:
    """Stateful shell over the functional core (SampleRenderer twin)."""

    def __init__(
        self,
        meshes: Optional[Sequence[HostMesh]] = None,
        scene: Optional[Scene] = None,
        config: RenderConfig = RenderConfig(),
        schedule: Optional[FoveationSchedule] = None,
        probe: Optional[ProbeParams] = None,
        texture_images=None,
        seed: int = 0,
        demand_loader=None,
        multichip: Optional[str] = None,
    ):
        if scene is None:
            if meshes is None:
                raise ValueError("provide meshes or a prebuilt scene")
            scene = build_scene(meshes, probe=probe, texture_images=texture_images)
        elif probe is not None:
            scene = dataclasses_replace(scene, probe=probe)
        self.demand_loader = demand_loader
        if demand_loader is not None:
            scene = scene.with_demand(demand_loader.launch_prepare())
        self.scene = scene
        self.multichip = multichip
        self._mc_fn = None
        if multichip:
            # "samples": every chip renders its sample slice, psum assembly
            # (parallel/tiles.py). "scene": additionally row-shards tri_pack
            # across the mesh — per-chip triangle-table memory 1/D
            # (parallel/scene_shard.py). Both bit-identical to single-chip.
            assert multichip in ("samples", "scene"), multichip
            assert demand_loader is None, "demand textures + multichip: no"
            from fovpathtracing_optixcodelatest_tpu.parallel import tiles

            self._mesh = tiles.make_mesh()
            if multichip == "scene":
                from fovpathtracing_optixcodelatest_tpu.parallel import (
                    scene_shard,
                )

                self.scene = scene_shard.pad_scene_rows(
                    self.scene, self._mesh.shape[tiles.AXIS]
                )
        self.config = config
        self.schedule = schedule or FoveationSchedule.reference_32_16_8()
        self.camera_params: Optional[CameraParams] = None
        self.subframe = 0
        self._key = jax.random.PRNGKey(seed)
        self._pad = film.schedule_padding(self.schedule, config.width, config.height)
        self.canvas = film.new_canvas(config.width, config.height, self._pad)
        self.last_frame: Optional[np.ndarray] = None

    # ---- SampleRenderer API twins ----
    def set_camera(self, camera: Camera) -> None:
        """setCamera (SimplePathtracer.cpp:282-289); resets accumulation like
        the camera_changed path (main.cpp:402-407)."""
        cam = camera
        if cam.aspect == 1.0 and self.config.width != self.config.height:
            # the reference passes explicit aspect; keep caller's value
            pass
        self.camera_params = cam.device_params()
        self.subframe = 0

    def set_probe(self, probe: ProbeParams) -> None:
        """setProbe (SimplePathtracer.cpp:292-308)."""
        self.scene = dataclasses_replace(self.scene, probe=probe)
        self.subframe = 0

    def set_schedule(self, schedule: FoveationSchedule) -> None:
        """Swap the foveation schedule (the reference rebuilds its three
        LaunchParams between configs, SimplePathtracer.cpp:137-209): re-pad
        the canvas, reset accumulation. A new schedule is a new jit static
        arg — first frame recompiles (persistent cache absorbs repeats)."""
        self.schedule = schedule
        self._mc_fn = None  # closure captures (config, schedule, mesh)
        self._pad = film.schedule_padding(
            schedule, self.config.width, self.config.height
        )
        self.canvas = film.new_canvas(
            self.config.width, self.config.height, self._pad
        )
        self.subframe = 0

    def resize(self, size: Tuple[int, int]) -> None:
        """resize (SimplePathtracer.cpp:228-274): realloc canvas, reset."""
        import dataclasses

        self.config = dataclasses.replace(
            self.config, width=size[0], height=size[1]
        )
        self._mc_fn = None  # closure captures (config, schedule, mesh)
        self._pad = film.schedule_padding(
            self.schedule, self.config.width, self.config.height
        )
        self.canvas = film.new_canvas(
            self.config.width, self.config.height, self._pad
        )
        self.subframe = 0

    def render(self, gaze: Optional[Tuple[int, int]] = None) -> np.ndarray:
        """Render one frame; gaze defaults to the frame center (the STATIC_ON
        gaze mode, main.cpp:352-368). Returns (H, W, 3) uint8."""
        if self.camera_params is None:
            raise RuntimeError("set_camera() first")
        w, h = self.config.width, self.config.height
        if gaze is None:
            gaze = (w // 2, h // 2)
        gx = jnp.clip(jnp.asarray(gaze[0], dtype=jnp.int32), 0, w - 1)
        gy = jnp.clip(jnp.asarray(gaze[1], dtype=jnp.int32), 0, h - 1)
        frame_key = jax.random.fold_in(self._key, self.subframe)
        if self.multichip:
            if self._mc_fn is None:
                if self.multichip == "scene":
                    from fovpathtracing_optixcodelatest_tpu.parallel import (
                        scene_shard,
                    )

                    fr = scene_shard.render_frame_scene_sharded
                else:
                    from fovpathtracing_optixcodelatest_tpu.parallel import (
                        tiles,
                    )

                    fr = tiles.render_frame_sharded
                cfg, sched, mesh = self.config, self.schedule, self._mesh
                self._mc_fn = jax.jit(
                    lambda sc, ca, x, y, su, cv, k: fr(
                        sc, ca, x, y, su, cv, k, cfg, sched, mesh
                    )
                )
            self.canvas, frame, traces = self._mc_fn(
                self.scene, self.camera_params, gx, gy,
                jnp.asarray(self.subframe, dtype=jnp.int32),
                self.canvas, frame_key,
            )
            self._stats = {"traces": traces}
        else:
            self.canvas, frame, self._stats = render_frame(
                self.scene, self.camera_params, gx, gy,
                jnp.asarray(self.subframe, dtype=jnp.int32),
                self.canvas, frame_key, self.config, self.schedule,
            )
        self.subframe += 1
        self.last_frame = frame
        return np.asarray(frame)

    def render_aov(self, gaze: Optional[Tuple[int, int]] = None):
        """One frame through the AOV pipeline: returns (frame_u8, aovs) where
        aovs carries the linear 'accum'/'normal'/'albedo' full-frame images
        (the denoiser guide layers, SimplePathtracer.cpp:246-260). Same
        accumulation semantics as render() — compiles a separate executable
        from the plain path (used by the viewer's AOV views)."""
        if self.camera_params is None:
            raise RuntimeError("set_camera() first")
        w, h = self.config.width, self.config.height
        if gaze is None:
            gaze = (w // 2, h // 2)
        gx = jnp.clip(jnp.asarray(gaze[0], dtype=jnp.int32), 0, w - 1)
        gy = jnp.clip(jnp.asarray(gaze[1], dtype=jnp.int32), 0, h - 1)
        frame_key = jax.random.fold_in(self._key, self.subframe)
        self.canvas, frame, aovs, self._stats = render_frame_aov(
            self.scene, self.camera_params, gx, gy,
            jnp.asarray(self.subframe, dtype=jnp.int32),
            self.canvas, frame_key, self.config, self.schedule,
        )
        self.subframe += 1
        self.last_frame = frame
        return np.asarray(frame), aovs

    def download_pixels(self) -> np.ndarray:
        """downloadPixels (SimplePathtracer.cpp:276-280)."""
        if self.last_frame is None:
            raise RuntimeError("render() first")
        return np.asarray(self.last_frame)

    def linear_frame(self) -> np.ndarray:
        """Cropped linear-radiance accumulation (H, W, 3) float32 — the
        pre-tonemap payload for EXR/PFM float output (the reference's EXR
        path writes the float accum, sutil.cpp:571+)."""
        p = self._pad
        c = np.asarray(self.canvas)
        return c[p : p + self.config.height, p : p + self.config.width, :3]

    def process_demand_requests(self) -> int:
        """Demand-texture maintenance between frames: fetch the last frame's
        page-request bitmap, fill tiles (DemandLoader worker pool), swap the
        refreshed context into the scene. Returns the number of pages
        requested. No-op without a demand loader."""
        if self.demand_loader is None:
            return 0
        req = getattr(self, "_stats", {}).get("demand_requests")
        if req is None:
            return 0
        req = np.asarray(req)
        n = int(req.sum())
        if n:
            self.demand_loader.process_requests(req).wait()
        self.scene = self.scene.with_demand(self.demand_loader.launch_prepare())
        return n

    @property
    def stats(self):
        return {
            k: int(v)
            for k, v in getattr(self, "_stats", {}).items()
            if getattr(v, "ndim", 0) == 0
        }
