"""Typed configuration for the renderer.

The reference scatters its configuration across compile-time ``#define``s and
hardcoded constants (scene choice PT_sv5_/main.cpp:24-29, FOV_ON/radii
SimplePathtracer.cpp:20-23, per-pass spp :142,170,193, bounce cap literal 4
deviceProgram.cu:515, exposure/tone-map toggles :583-600). Here all of that is a
single frozen dataclass tree that hashes, so configs can be static arguments to
``jax.jit`` — every field that changes the traced program shape lives here.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class FoveationPass:
    """One foveated launch region.

    Twin of the per-pass LaunchParams fields the reference host code rewrites
    between its three ``optixLaunch`` calls (SimplePathtracer.cpp:137-209):
    ``factor`` (pixel stride), ``fill_size`` (replication block, == factor),
    ``spp`` (samples_per_launch), ``r_inner``/``r_outer`` (ring radii in pixels
    around the gaze point), ``redraw`` (1 disables progressive accumulation for
    the region), plus the launch grid size in *launch* (strided) coordinates.
    """

    factor: int
    spp: int
    r_inner: float
    r_outer: float
    redraw: bool
    # Launch grid in strided coords; None = cover the whole frame at this stride.
    launch_w: int | None = None
    launch_h: int | None = None
    # Offset is gaze-relative when centered=True (offset = c - center_offset),
    # absolute (0,0) otherwise — mirrors the reference's offset arithmetic.
    centered: bool = False
    center_offset: int = 0

    @property
    def fill_size(self) -> int:
        return self.factor


# Reference radii: inner=74, outer=241 (SimplePathtracer.cpp:20-21). Pass structure:
#   periphery: factor 4, spp 8,  ring [241, inf),  launch (W/4, H/4), offset (0,0)
#   annulus:   factor 2, spp 16, ring [74, 243),   launch (243,243), offset c-243
#   fovea:     factor 1, spp 32, ring [0, 75),     launch (150,150), offset c-75
INNER_RADIUS = 74
OUTER_RADIUS = 241


@dataclasses.dataclass(frozen=True)
class FoveationSchedule:
    """The full foveation schedule — the framework's core tunable."""

    passes: Tuple[FoveationPass, ...]

    @staticmethod
    def reference_32_16_8(
        inner: int = INNER_RADIUS, outer: int = OUTER_RADIUS
    ) -> "FoveationSchedule":
        """The PT_sv5_ schedule (SimplePathtracer.cpp:137-209)."""
        return FoveationSchedule(
            passes=(
                FoveationPass(
                    factor=4, spp=8, r_inner=float(outer), r_outer=1e9, redraw=False
                ),
                FoveationPass(
                    factor=2,
                    spp=16,
                    r_inner=float(inner),
                    r_outer=float(outer + 2),
                    redraw=True,
                    launch_w=outer + 2,
                    launch_h=outer + 2,
                    centered=True,
                    center_offset=outer + 2,
                ),
                FoveationPass(
                    factor=1,
                    spp=32,
                    r_inner=0.0,
                    r_outer=float(inner + 1),
                    redraw=True,
                    launch_w=2 * (inner + 1),
                    launch_h=2 * (inner + 1),
                    centered=True,
                    center_offset=inner + 1,
                ),
            )
        )

    @staticmethod
    def reference_32_16_8_sealed(
        inner: int = INNER_RADIUS, outer: int = OUTER_RADIUS
    ) -> "FoveationSchedule":
        """The reference schedule with ring bounds padded so every pixel is
        covered. The verbatim reference schedule leaves ~173 boundary pixels
        per frame unwritten at 960×540 (validate_coverage finds them: a
        stride-f pass rejects a whole block when its top-left pixel exits the
        ring, so the finer pass must overlap by f·√2; the reference's +2
        margin at stride 2 is not quite enough at its stride-4 boundary —
        SimplePathtracer.cpp:174). Padding: annulus reaches outer+7
        (covers the periphery's 4·√2 block diagonal), fovea reaches inner+4
        (covers the annulus's 2·√2)."""
        ao = outer + 7
        fo = inner + 4
        return FoveationSchedule(
            passes=(
                FoveationPass(
                    factor=4, spp=8, r_inner=float(outer), r_outer=1e9,
                    redraw=False,
                ),
                FoveationPass(
                    factor=2, spp=16, r_inner=float(inner), r_outer=float(ao),
                    redraw=True, launch_w=ao, launch_h=ao,
                    centered=True, center_offset=ao,
                ),
                FoveationPass(
                    factor=1, spp=32, r_inner=0.0, r_outer=float(fo),
                    redraw=True, launch_w=2 * fo, launch_h=2 * fo,
                    centered=True, center_offset=fo,
                ),
            )
        )

    @staticmethod
    def sweep(fovea_spp: int, annulus_spp: int, periphery_spp: int,
              inner: int = INNER_RADIUS,
              outer: int = OUTER_RADIUS) -> "FoveationSchedule":
        """Build an spp-sweep schedule like the PT_sv4_vmv2 benchmark suite
        (e.g. 32_2_1 ... 32_16_8, see BASELINE.md). The reference radii are
        tuned for 960x540 (BASELINE.md); pass scaled ``inner``/``outer`` for
        other resolutions or the fovea swallows the frame."""
        base = FoveationSchedule.reference_32_16_8(inner, outer).passes
        return FoveationSchedule(
            passes=(
                dataclasses.replace(base[0], spp=periphery_spp),
                dataclasses.replace(base[1], spp=annulus_spp),
                dataclasses.replace(base[2], spp=fovea_spp),
            )
        )

    def validate_coverage(self, width: int, height: int,
                          gaze=None) -> "np.ndarray":
        """Static coverage check: returns the boolean (H, W) map of pixels NOT
        written by any pass for the given gaze (default frame center).

        Ring passes reject a whole stride-f block when the block's top-left
        pixel falls outside [r_inner, r_outer], so an inner pass must overlap
        the next-coarser pass by that pass's block diagonal (f·√2) or a ring
        of pixels goes unwritten — the reason the reference pads its ring
        bounds (SimplePathtracer.cpp:174). Call this when building custom
        schedules; tests assert the shipped schedules are hole-free.
        """
        import numpy as np

        if gaze is None:
            gaze = (width // 2, height // 2)
        gx, gy = gaze
        covered = np.zeros((height, width), dtype=bool)
        for p in self.passes:
            lw = p.launch_w if p.launch_w is not None else width // p.factor
            lh = p.launch_h if p.launch_h is not None else height // p.factor
            ox = gx - p.center_offset if p.centered else 0
            oy = gy - p.center_offset if p.centered else 0
            lx, ly = np.meshgrid(np.arange(lw), np.arange(lh))
            idx_x = lx * p.factor + ox
            idx_y = ly * p.factor + oy
            rng = np.sqrt((idx_x - gx) ** 2.0 + (idx_y - gy) ** 2.0)
            ring = (rng >= p.r_inner) & (rng <= p.r_outer)
            for dy in range(p.fill_size):
                for dx in range(p.fill_size):
                    px = idx_x + dx
                    py = idx_y + dy
                    ok = ring & (px >= 0) & (px < width) & (py >= 0) & (py < height)
                    covered[py[ok], px[ok]] = True
        return ~covered

    @staticmethod
    def uniform(spp: int = 4) -> "FoveationSchedule":
        """The FOV_OFF single full-frame launch (SimplePathtracer.cpp:85-131)."""
        return FoveationSchedule(
            passes=(
                FoveationPass(
                    factor=1, spp=spp, r_inner=0.0, r_outer=1e9, redraw=False
                ),
            )
        )

    def scaled(self, s: int) -> "FoveationSchedule":
        """The same schedule at 1/s resolution: ring radii, launch grids and
        gaze offsets shrink by s, strides/spp stay. Used by the viewer's
        progressive startup (quarter-res warmup frames while the full-res
        executable compiles) and by benchmark_sweep at non-960x540 sizes —
        the reference's radii are resolution-absolute and tuned for 960x540
        (SimplePathtracer.cpp:20-21)."""
        if s <= 1:
            return self
        import math

        passes = []
        for i, p in enumerate(self.passes):
            # ring GEOMETRY scales with resolution, but the coverage margin is
            # stride-absolute: a stride-f outer pass rejects whole f-blocks, so
            # this pass must still overlap it by f*sqrt(2) pixels (see
            # validate_coverage). Re-add the coarser pass's block diagonal.
            pad = 0.0
            if i > 0 and p.r_outer < 1e8:
                pad = math.ceil(self.passes[i - 1].factor * math.sqrt(2)) + 1
            r_out = p.r_outer if p.r_outer >= 1e8 else p.r_outer / s + pad
            grow = int(math.ceil(pad / max(p.factor, 1)))
            passes.append(dataclasses.replace(
                p,
                r_inner=p.r_inner / s,
                r_outer=r_out,
                launch_w=None if p.launch_w is None
                else max(1, p.launch_w // s) + 2 * grow,
                launch_h=None if p.launch_h is None
                else max(1, p.launch_h // s) + 2 * grow,
                center_offset=(p.center_offset // s + grow * p.factor)
                if p.centered else 0,
            ))
        return FoveationSchedule(passes=tuple(passes))


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Global render settings (twin of the device-side #defines,
    deviceProgram.cu:481,515,583-600 and tmin/tmax globals :41-42)."""

    width: int = 960
    height: int = 540
    max_depth: int = 4  # bounce cap (deviceProgram.cu:515)
    tmin: float = 0.01  # deviceProgram.cu:41
    tmax: float = 1e16  # deviceProgram.cu:42
    antialias: bool = True  # USE_ANTIALIASING (deviceProgram.cu:481)
    exposure_stops: float = 4.0  # pow(2, 4) exposure (deviceProgram.cu:586)
    tone_mapping: bool = True  # TONE_MAPPING__ENABLE (deviceProgram.cu:595)
    exposure_correction: bool = True  # EXPOSURE_CORR_ON (deviceProgram.cu:583)
    white: float = 1.0  # Reinhard white point (deviceProgram.cu:597)
    accumulate: bool = True  # progressive accumulation (PT_original semantics)
    # Sort rays alive-first before each traversal so chunks of dead rays exit
    # their while_loop immediately (pairs with traverse8's chunked lax.map).
    compact_bounces: bool = True
    # Trace only a static active-lane budget per frame: ring-rejected launch
    # lanes (~27% of the reference schedule at 960x540) are sorted to the
    # tail and never enter trace_paths. The budget is a rigorous any-gaze
    # bound (raygen.pass_active_bound) so results are bit-identical.
    frame_compaction: bool = True
    # AA-jitter sample generator: "random" (the reference's shipped path,
    # sample.h USE_RANDOM :253), "stratified" or "blue_noise" (its inactive
    # generators, sample.h:6-214) — see ops/samplers.py.
    sampler: str = "random"
    # Bounded rounds of the shadow-catcher secondary-ray pass-through
    # (deviceProgram.cu:646-651 re-traces with --depth, unbounded there);
    # 0 disables. Only compiled in when the scene has a catcher material.
    catcher_passthrough: int = 2
    # Intersection backend: "bvh" (ops/traverse8, the fast path) or "oracle"
    # (ops/intersect brute force — the independent ground-truth intersector
    # for the SSIM north-star harness; O(rays x tris), small scenes only).
    traversal: str = "bvh"
    # Two-phase closest-hit (traverse8.closest_hit_staged): cap phase-1
    # chunks at this many lockstep iterations, then re-trace the straggler
    # rays packed together (measured +51% on bounce rays; 0 disables).
    # 14 is the measured frame-scale optimum for the L6/A16 tree (sweep
    # 10/12/14/16/18 -> 568/539/515/516/522 ms on the bench config).
    traversal_phase1_cap: int = 14
    # Scale the phase-1 cap with the (static) BVH row count: deeper trees
    # have a larger p90 pop count, and the bench-tuned cap 14 starves them
    # into the full-depth phase-2 re-trace. Measured (round 5): 1,469 rows
    # -> 14 optimal; 97,721 rows -> 26 optimal (3.33 -> 3.97 Mrays/s; 32/40
    # regress) — ~+2 per row-count doubling. When True the cap used is
    # max(traversal_phase1_cap, 14 + 2*log2(rows/1469)) clamped to 34;
    # bit-identical by construction (the cap only moves work between
    # phases).
    traversal_cap_auto: bool = True
    # Separate phase-1 cap for PRIMARY rays (bounce 0): coherent primaries
    # need fewer pops (measured mean 5.3 vs 7.4 on box_city) so a tighter
    # cap sheds their lockstep tail sooner. 0 = use traversal_phase1_cap.
    # Only meaningful when staging is active (traversal_phase1_cap > 0 and
    # the BVH exceeds the small-table gate) — otherwise there is no phase-2
    # retrace to catch capped rays, so the cap is ignored.
    traversal_phase1_cap_primary: int = 0
    # Carry the normal/albedo AOVs through the frame-compaction unsort
    # (render_frame_aov sets this; plain render_frame never reads them, and
    # the two (N, 3) payloads cost ~6 ms of sort operands per frame at
    # 1.92M lanes).
    need_aov: bool = False
    # Hero-wavelength spectral path tracing (the reference's spectrum.h is
    # dead code — this framework renders it): the integrator carries a
    # NUM_HERO-wavelength spectral throughput and CIE-integrates per bounce.
    spectral: bool = False
    # Cauchy B coefficient (nm^2) for dispersive transmission in spectral
    # mode; 0 = achromatic refraction (render/spectral.py cauchy_eta).
    dispersion: float = 4200.0

    @property
    def resolution(self) -> Tuple[int, int]:
        return (self.width, self.height)
