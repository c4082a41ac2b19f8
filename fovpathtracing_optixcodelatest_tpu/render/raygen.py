"""Camera ray generation for uniform and foveated launches.

Twin of the raygen front half (deviceProgram.cu:392-495): pixel index =
launch_index * factor + offset, ring rejection against the gaze center
(:433-440), AA-jittered NDC (:479-489), direction = normalize(d.x·U + d.y·V +
W) (:491). One call produces the full (pixels × spp) SoA ray batch for one
foveation pass; the ring mask becomes the integrator's ``active`` mask instead
of an early return.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from fovpathtracing_optixcodelatest_tpu.config import FoveationPass
from fovpathtracing_optixcodelatest_tpu.models.camera import CameraParams
from fovpathtracing_optixcodelatest_tpu.ops.samplers import aa_jitter
from fovpathtracing_optixcodelatest_tpu.ops.sampling import normalize


def pass_launch_dims(p: FoveationPass, width: int, height: int) -> Tuple[int, int]:
    """Launch grid (LW, LH) in strided coords (SimplePathtracer.cpp:153-208:
    full frame / factor for the periphery, explicit sizes for rings)."""
    lw = p.launch_w if p.launch_w is not None else width // p.factor
    lh = p.launch_h if p.launch_h is not None else height // p.factor
    return lw, lh


def pass_offset(p: FoveationPass, gaze_x, gaze_y):
    """Frame-space offset of the launch grid; int32 (may go negative near the
    frame edge — the reference's uint2 would wrap, SimplePathtracer.cpp:181)."""
    if p.centered:
        return (
            gaze_x.astype(jnp.int32) - p.center_offset,
            gaze_y.astype(jnp.int32) - p.center_offset,
        )
    z = jnp.zeros((), dtype=jnp.int32)
    return z, z


def pass_ray_count(p: FoveationPass, width: int, height: int) -> int:
    """Static ray count of one pass (pixels × spp)."""
    lw, lh = pass_launch_dims(p, width, height)
    return lw * lh * p.spp


# RNG-stream stride per pixel: ray id = global_pixel * RNG_STRIDE + slot.
# Keying streams by FRAME pixel (the reference's tea<4>(y*w+x, subframe),
# deviceProgram.cu:411) — not by pass-local index — makes every pass that
# touches a pixel draw the SAME samples: the foveated fovea at spp k is
# bit-identical to a uniform spp-k render (the SSIM north-star harness
# exploits this), and multi-chip sample sharding stays layout-invariant.
RNG_STRIDE = 64  # max spp any schedule may use (reference max is 32)


def pass_active_bound(p: FoveationPass, width: int, height: int,
                      k: int | None = None) -> int:
    """Static upper bound on the RING-ACTIVE lanes of one pass, valid for
    EVERY gaze position inside the frame.

    The merged wavefront launches every lattice position of every pass and
    marks ring-rejected ones inactive (~27% of the reference schedule's
    lanes at 960x540) — renderer.frame_wavefront sorts actives first and
    traces only this static prefix, so dead launch lanes cost nothing.
    Bounds are rigorous lattice-geometry facts, not estimates:

    - ring pass [ri, ro]: every stride-f cell whose corner lies in the ring
      fits inside the ring dilated by the cell diagonal d = f*sqrt(2), so
      count <= area(pi((ro+d)^2 - max(ri-d,0)^2)) / f^2.
    - periphery (ro = inf): excluded corners are those inside disc(ri); the
      quarter-disc of radius ri_eff = min(ri - 2d, W/2 - d, H/2 - d) points
      into the frame from any in-frame gaze, and cells covering its erosion
      lie fully inside disc(ri), so excluded >= pi*ri_eff^2 / 4 / f^2.
    """
    import math

    lw, lh = pass_launch_dims(p, width, height)
    k = p.spp if k is None else k
    total = lw * lh
    f = float(p.factor)
    d = f * math.sqrt(2.0)
    if p.centered:
        # position - gaze = i*factor - center_offset is gaze-INDEPENDENT, so
        # the ring-active count is a constant — compute it exactly
        import numpy as np

        xs = np.arange(lw) * p.factor - p.center_offset
        ys = np.arange(lh) * p.factor - p.center_offset
        r = np.sqrt(
            xs[None, :].astype(np.float64) ** 2
            + ys[:, None].astype(np.float64) ** 2
        )
        return int(((r >= p.r_inner) & (r <= p.r_outer)).sum()) * k
    if p.r_outer < 1e8:  # finite ring, grid not gaze-locked: dilated bound
        ro = p.r_outer + d
        ri = max(p.r_inner - d, 0.0)
        ring = math.pi * (ro * ro - ri * ri) / (f * f)
        return min(total, int(math.ceil(ring))) * k
    if p.r_inner <= 0.0:  # uniform pass — no ring rejection
        return total * k
    # periphery: full grid minus a guaranteed-excluded quarter disc
    ri_eff = min(p.r_inner - 2.0 * d, width / 2.0 - d, height / 2.0 - d)
    if ri_eff <= 0.0:
        return total * k
    excluded = int(math.pi * ri_eff * ri_eff / 4.0 / (f * f))
    return max(total - excluded, 0) * k


def generate_pass_rays(
    camera: CameraParams,
    p: FoveationPass,
    width: int,
    height: int,
    gaze_x: jnp.ndarray,
    gaze_y: jnp.ndarray,
    key: jnp.ndarray,
    antialias: bool = True,
    sample_ids: jnp.ndarray | None = None,
    ray_id_base: int = 0,
    sampler: str = "random",
):
    """Build the ray batch for one foveation pass.

    ``sample_ids`` (k,) selects which of the pass's spp sample slots this call
    generates (default all) — the hook for sample-parallel sharding: devices
    pass disjoint slices and get bit-identical rays to the unsharded call
    because jitter is keyed by the global ray id.

    Ray ids are ``frame_pixel * RNG_STRIDE + sample_slot`` (see RNG_STRIDE:
    the reference's pixel-keyed tea<4> seeding) — a pure function of the
    pixel the ray shades, independent of pass, batch layout, or sharding.
    ``ray_id_base`` is accepted for API stability but unused (pixel keying
    makes merged-wavefront ids consistent by construction).

    Returns dict with origins (N,3), directions (N,3), active (N,), ray_ids
    (N,) int32, pixel ring mask (LH, LW), launch dims and offsets. Ray layout
    is pixel-major: ray = pixel * k + sample_slot.
    """
    lw, lh = pass_launch_dims(p, width, height)
    ox, oy = pass_offset(p, gaze_x, gaze_y)
    spp = p.spp
    if sample_ids is None:
        sample_ids = jnp.arange(spp, dtype=jnp.int32)
    k = sample_ids.shape[0]
    n_pix = lw * lh

    lx = jnp.arange(lw, dtype=jnp.int32)
    ly = jnp.arange(lh, dtype=jnp.int32)
    gx, gy = jnp.meshgrid(lx, ly)  # (LH, LW)
    idx_x = gx * p.factor + ox
    idx_y = gy * p.factor + oy

    # ring rejection on integer pixel coords (deviceProgram.cu:433-440)
    dx = idx_x.astype(jnp.float32) - gaze_x.astype(jnp.float32)
    dy = idx_y.astype(jnp.float32) - gaze_y.astype(jnp.float32)
    rng = jnp.sqrt(dx * dx + dy * dy)
    ring = (rng >= p.r_inner) & (rng <= p.r_outer)

    fx = jnp.repeat(idx_x.reshape(-1).astype(jnp.float32), k)
    fy = jnp.repeat(idx_y.reshape(-1).astype(jnp.float32), k)

    assert spp <= RNG_STRIDE, f"spp {spp} exceeds RNG_STRIDE {RNG_STRIDE}"
    # int32 headroom: in-frame ids live in [0, W*H*RNG_STRIDE); off-frame
    # launch coords (centered passes near the border) get a RESERVED id range
    # above that so they can never alias an in-frame pixel's RNG stream
    # (idx_y*width+idx_x wraps rows for negative/overflowing coords).
    off_band = 512  # reference-class schedules stay within +-(r_outer+2)
    virt_w = width + 2 * off_band
    id_limit = (
        width * height + (height + 2 * off_band) * virt_w
    ) * RNG_STRIDE
    if id_limit >= 2**31:
        raise ValueError(
            f"{width}x{height} at RNG_STRIDE {RNG_STRIDE} overflows int32 "
            "ray ids — RNG streams would alias between distant pixels"
        )
    in_frame = (
        (idx_x >= 0) & (idx_x < width) & (idx_y >= 0) & (idx_y < height)
    )
    cx = jnp.clip(idx_x, -off_band, width + off_band - 1)
    cy = jnp.clip(idx_y, -off_band, height + off_band - 1)
    off_pix = width * height + (cy + off_band) * virt_w + (cx + off_band)
    frame_pix = jnp.where(
        in_frame, idx_y * width + idx_x, off_pix
    ).reshape(-1)  # (n_pix,) collision-free pixel id
    ray_ids = (
        jnp.repeat(frame_pix, k) * RNG_STRIDE + jnp.tile(sample_ids, n_pix)
    ).astype(jnp.int32)

    if antialias:
        jitter = aa_jitter(
            key, ray_ids, jnp.tile(sample_ids, n_pix), spp, sampler
        )
    else:
        jitter = jnp.full((n_pix * k, 2), 0.0)
    ndc_x = 2.0 * (fx + jitter[:, 0]) / width - 1.0
    ndc_y = 2.0 * (fy + jitter[:, 1]) / height - 1.0

    direction = normalize(
        ndc_x[:, None] * camera.u[None, :]
        + ndc_y[:, None] * camera.v[None, :]
        + camera.w[None, :]
    )
    origin = jnp.broadcast_to(camera.eye[None, :], direction.shape)
    # padded sample slots (id >= spp) stay inactive
    active = jnp.repeat(ring.reshape(-1), k) & (
        jnp.tile(sample_ids, n_pix) < spp
    )
    return {
        "origin": origin,
        "direction": direction,
        "active": active,
        "ray_ids": ray_ids,
        "ring": ring,
        "launch": (lw, lh),
        "offset": (ox, oy),
        "spp": spp,
        "samples_here": k,
    }


def pixel_center_directions(
    camera: CameraParams, idx_x: jnp.ndarray, idx_y: jnp.ndarray,
    width: int, height: int
):
    """Unjittered pixel-center primary directions — used for the backplate
    probe lookup. (Deviation from the reference, which reuses the *last*
    sample's jittered direction, deviceProgram.cu:495; pixel centers are
    deterministic and sharding-invariant.)"""
    ndc_x = 2.0 * (idx_x.astype(jnp.float32) + 0.5) / width - 1.0
    ndc_y = 2.0 * (idx_y.astype(jnp.float32) + 0.5) / height - 1.0
    return normalize(
        ndc_x.reshape(-1)[:, None] * camera.u[None, :]
        + ndc_y.reshape(-1)[:, None] * camera.v[None, :]
        + camera.w[None, :]
    )
