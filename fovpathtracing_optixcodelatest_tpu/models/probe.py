"""Environment probe: host-side 2-level CDF build + device pytree.

Twin of Probe.h ProbeData::BuildCDF (:29-77): per-row conditional pdf/cdf over
luminance (X) and a column marginal over row sums (Y), both normalized; and of
CUDAProbeData::createBuffer (:102-124) which uploads the five buffers. Here the
build is vectorized numpy (cumsum instead of the reference's scalar loops) and
the device side is a ``ProbeParams`` pytree consumed by ops/probe_sampling.py.

``constant_probe`` is the loadColor path (main.cpp:175-187): a solid-color
environment still built through the same CDF machinery.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from fovpathtracing_optixcodelatest_tpu.ops.sampling import luminance as _lum_weights


@dataclasses.dataclass(frozen=True)
class ProbeParams:
    """Device probe: the LaunchParams ``Probe`` struct (Probe.cuh:6-21).

    Carries BOTH the reference's 2-level CDF (kept for parity/tests) and a
    Walker alias table over the flattened texel distribution — the TPU-fast
    sampling path: O(1) per sample (two (N,)-gathers + a compare) instead of
    a log(W)-step binary search whose per-step gathers dominated frame
    profiles. Both sample the identical texel distribution.
    """

    data: jnp.ndarray  # (H, W, 3) float32 radiance
    pdf_x: jnp.ndarray  # (H, W) row-conditional pdf
    cdf_x: jnp.ndarray  # (H, W) row-conditional cdf (inclusive)
    pdf_y: jnp.ndarray  # (H,) row marginal pdf
    cdf_y: jnp.ndarray  # (H,) row marginal cdf (inclusive)
    alias_prob: jnp.ndarray  # (H*W,) acceptance probability
    alias_idx: jnp.ndarray  # (H*W,) alias texel index (int32)
    pdf_flat: jnp.ndarray  # (H*W,) joint texel pdf = pdf_x * pdf_y[row]
    # ONE-gather sampling rows (H*W, 13): both alias outcomes of candidate c
    # pre-resolved — [prob, uA, vA, pdfA, colA rgb, uB, vB, pdfB, colB rgb]
    # where A = texel c, B = texel alias_idx[c]. probe_sample fetches one row
    # and selects by the accept test; the dependent second gather (and the
    # separate prob/idx/color/pdf fetches — 4 element-rate gathers, ~47 ms
    # per bounce at 1.9M rays, 20% of the round-2 frame) disappears.
    # None above SAMPLE_ROWS_MAX_TEXELS (the rows are a ~4x copy of the probe
    # payload — a 4k HDR envmap would pay ~437 MB); probe_sample then falls
    # back to the per-field gathers.
    sample_rows: jnp.ndarray | None  # (H*W, 13) f32 | None

    @property
    def width(self) -> int:
        return self.data.shape[1]

    @property
    def height(self) -> int:
        return self.data.shape[0]


jax.tree_util.register_dataclass(
    ProbeParams,
    data_fields=[
        "data", "pdf_x", "cdf_x", "pdf_y", "cdf_y",
        "alias_prob", "alias_idx", "pdf_flat", "sample_rows",
    ],
    meta_fields=[],
)


def _build_alias(weights: np.ndarray):
    """Walker/Vose alias table for a discrete distribution (numpy host build;
    O(K) two-pointer sweep)."""
    k = len(weights)
    total = weights.sum()
    if total <= 0:
        return np.ones(k, np.float32), np.arange(k, dtype=np.int32)
    p = weights.astype(np.float64) * (k / total)
    prob = np.ones(k, dtype=np.float64)
    alias = np.arange(k, dtype=np.int32)
    order = np.argsort(p)  # small first
    small_list = [i for i in order if p[i] < 1.0]
    large_list = [i for i in order[::-1] if p[i] >= 1.0]
    si = li = 0
    while si < len(small_list) and li < len(large_list):
        s = small_list[si]
        lg = large_list[li]
        prob[s] = p[s]
        alias[s] = lg
        p[lg] = (p[lg] + p[s]) - 1.0
        si += 1
        if p[lg] < 1.0:
            small_list.append(lg)
            li += 1
    return prob.astype(np.float32), alias.astype(np.int32)


# sample_rows (13 f32/texel) quadruples the probe's device payload; above
# this texel count (2048x1024) skip it and keep the per-field gather path
SAMPLE_ROWS_MAX_TEXELS = 1 << 21


def gaussian_prefilter_3x3(intensity: np.ndarray) -> np.ndarray:
    """3x3 Gaussian (sigma=0.5) prefilter of a lat-long intensity image —
    the OptixUtils env-CDF variant (Texture.cpp:7-44): x wraps (repeat),
    y clamps to edge; weights center 0.619347, edges 0.0838195, corners
    0.0113437 (sum 1). Its purpose upstream: keep the piecewise-linear
    sampling function nonzero next to bright texels so continuous CDF
    inversion can land on them (Texture.cpp:75 comment)."""
    c = intensity
    left = np.roll(c, 1, axis=1)      # x-1 with repeat
    right = np.roll(c, -1, axis=1)    # x+1 with repeat
    up = np.concatenate([c[:1], c[:-1]], axis=0)      # y-1 clamped
    down = np.concatenate([c[1:], c[-1:]], axis=0)    # y+1 clamped
    ul = np.roll(up, 1, axis=1)
    ur = np.roll(up, -1, axis=1)
    dl = np.roll(down, 1, axis=1)
    dr = np.roll(down, -1, axis=1)
    return (
        0.619347 * c
        + 0.0838195 * (left + right + up + down)
        + 0.0113437 * (ul + ur + dl + dr)
    ).astype(np.float32)


def build_cdf(data: np.ndarray, prefilter: bool = False) -> ProbeParams:
    """Build the 2-level luminance CDF (Probe.h BuildCDF semantics).

    pdf_x[j,i] = L[j,i] / sum_i L[j,:]     cdf_x[j,i] = cumsum_i / sum_i (inclusive)
    pdf_y[j]   = sum_i L[j,:] / sum L      cdf_y[j]   = cumsum_j / sum (inclusive)

    ``prefilter`` selects the OptixUtils Texture.cpp variant (linked but
    never called upstream): the sampling weight is the 3x3
    Gaussian-prefiltered mean intensity (r+g+b)/3 (Texture.cpp:7-44,76)
    instead of raw 0.3/0.6/0.1 luminance — texels adjacent to bright ones
    get nonzero sampling probability. (The reference folds sin(theta) into
    its function; here the sin-theta Jacobian stays in ProbePdf/probe_pdf,
    identical estimator either way.)
    """
    data = np.asarray(data, dtype=np.float32)
    assert data.ndim == 3 and data.shape[2] >= 3
    rgb = data[..., :3]
    if prefilter:
        weight = gaussian_prefilter_3x3(rgb.mean(axis=2))
    else:
        weight = 0.3 * rgb[..., 0] + 0.6 * rgb[..., 1] + 0.1 * rgb[..., 2]
    weight = np.maximum(weight, 0.0)
    row_sum = weight.sum(axis=1)  # (H,)
    safe_row = np.where(row_sum > 0, row_sum, 1.0)
    pdf_x = weight / safe_row[:, None]
    cdf_x = np.cumsum(weight, axis=1) / safe_row[:, None]
    total = row_sum.sum()
    safe_total = total if total > 0 else 1.0
    pdf_y = row_sum / safe_total
    cdf_y = np.cumsum(row_sum) / safe_total
    alias_prob, alias_idx = _build_alias(weight.reshape(-1))
    pdf_flat = (pdf_x * pdf_y[:, None]).reshape(-1).astype(np.float32)
    # one-gather sampling rows: u/v are the texel-corner coords in the SAME
    # f32 ops the device formerly used (col/w, row/h) — bit-identical
    h, w = weight.shape
    sample_rows = None
    if h * w <= SAMPLE_ROWS_MAX_TEXELS:
        lin = np.arange(h * w, dtype=np.int64)
        rgb_flat = rgb.reshape(-1, 3).astype(np.float32)

        def _uv(ids):
            r = (ids // w).astype(np.int32)
            c = (ids - r * w).astype(np.int32)
            return (c.astype(np.float32) / np.float32(w),
                    r.astype(np.float32) / np.float32(h))

        u_a, v_a = _uv(lin)
        u_b, v_b = _uv(alias_idx.astype(np.int64))
        sample_rows = np.concatenate([
            alias_prob[:, None], u_a[:, None], v_a[:, None],
            pdf_flat[:, None], rgb_flat,
            u_b[:, None], v_b[:, None],
            pdf_flat[alias_idx][:, None], rgb_flat[alias_idx],
        ], axis=1).astype(np.float32)
    return ProbeParams(**jax.device_put(dict(  # one batched upload
        data=rgb.astype(np.float32),
        pdf_x=pdf_x.astype(np.float32),
        cdf_x=cdf_x.astype(np.float32),
        pdf_y=pdf_y.astype(np.float32),
        cdf_y=cdf_y.astype(np.float32),
        alias_prob=alias_prob,
        alias_idx=alias_idx,
        pdf_flat=pdf_flat,
        sample_rows=sample_rows,
    )))


def constant_probe(color, width: int = 64, height: int = 32) -> ProbeParams:
    """Solid ambient-color probe (loadColor twin, main.cpp:175-187). The
    reference allocates it at framebuffer resolution; a small probe is
    mathematically identical for a constant field and saves HBM."""
    data = np.tile(np.asarray(color, dtype=np.float32), (height, width, 1))
    return build_cdf(data)


def gradient_sky_probe(width: int = 256, height: int = 128,
                       zenith=(0.35, 0.55, 1.0), horizon=(1.0, 0.95, 0.85),
                       sun_dir=(0.3, 0.8, 0.5), sun_power: float = 200.0,
                       sun_sharpness: float = 400.0) -> ProbeParams:
    """Procedural HDR sky with a bright sun disc — a stand-in for the 4k HDRIs
    the reference loads from disk (main.cpp:211-224), and a proper stress test
    for importance sampling (high-contrast peak)."""
    v = (np.arange(height) + 0.5) / height
    u = (np.arange(width) + 0.5) / width
    theta = v * np.pi
    phi = u * 2.0 * np.pi
    # Lat-long mapping matching ProbeUVToDir (Probe.cuh:47-58)
    x = -np.sin(theta)[:, None] * np.cos(phi)[None, :]
    y = np.cos(theta)[:, None] * np.ones_like(phi)[None, :]
    z = -np.sin(theta)[:, None] * np.sin(phi)[None, :]
    t = np.clip(0.5 * (y + 1.0), 0.0, 1.0)[..., None]
    sky = np.asarray(horizon) * (1 - t) + np.asarray(zenith) * t
    sd = np.asarray(sun_dir, dtype=np.float64)
    sd /= np.linalg.norm(sd)
    cosang = x * sd[0] + y * sd[1] + z * sd[2]
    sun = np.exp(sun_sharpness * (np.clip(cosang, -1, 1) - 1.0))[..., None]
    data = sky + sun_power * sun
    return build_cdf(data.astype(np.float32))


def luminance(rgb: jnp.ndarray) -> jnp.ndarray:
    return _lum_weights(rgb)
