"""BSDF visualization harness.

Twin of the commented-out BSDFTest in the reference (Disney.cuh:431-504):
renders f(ωo, ωi) and pdf(ωo, ωi) over the lat-long sphere to an image, and
overlays importance-sampled directions, so importance-sampling correctness can
be eyeballed — except here it's vectorized (one call evaluates every texel and
sample at once) and feeds the automated chi-square-style tests too.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fovpathtracing_optixcodelatest_tpu.models.material import Material, MaterialTable
from fovpathtracing_optixcodelatest_tpu.ops import bsdf as bsdf_ops
from fovpathtracing_optixcodelatest_tpu.ops.probe_sampling import dir_to_uv, uv_to_dir
from fovpathtracing_optixcodelatest_tpu.ops.sampling import basis_from_vector


def bsdf_test_image(
    material: Material,
    wo_theta: float = np.pi / 2.05,
    width: int = 512,
    height: int = 256,
    num_samples: int = 1000,
    eta_i: float = 1.0,
    eta_o: float = 1.4,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (image (H, W, 3) float32, sampled_uv (S, 2)).

    Channel layout matches the reference harness: R = f value (x channel),
    G = pdf, B = 0.5 background; sampled directions marked red
    (Disney.cuh:457-498).
    """
    n = jnp.asarray([1.0, 0.0, 0.0], dtype=jnp.float32)
    u_axis, v_axis = basis_from_vector(n[None, :])
    u_axis, v_axis = u_axis[0], v_axis[0]
    wo = (
        -np.sin(wo_theta) * np.asarray(v_axis)
        + np.cos(wo_theta) * np.asarray(n)
    ).astype(np.float32)

    table = MaterialTable.from_materials([material])
    npix = width * height
    mat = table.gather(jnp.zeros((npix,), dtype=jnp.int32))

    xs = (jnp.arange(width) + 0.0) / width
    ys = (jnp.arange(height) + 0.0) / height
    gu, gv = jnp.meshgrid(xs, ys)
    wi = uv_to_dir(jnp.stack([gu.reshape(-1), gv.reshape(-1)], axis=-1))

    nrm = jnp.broadcast_to(n, (npix, 3))
    wo_b = jnp.broadcast_to(jnp.asarray(wo), (npix, 3))
    albedo = jnp.broadcast_to(jnp.asarray(material.color, jnp.float32), (npix, 3))
    ei = jnp.full((npix,), eta_i)
    eo = jnp.full((npix,), eta_o)
    f = bsdf_ops.bsdf_eval(mat, albedo, ei, eo, nrm, wo_b, wi)
    pdf = bsdf_ops.bsdf_pdf(mat, ei, eo, nrm, wo_b, wi)
    img = jnp.stack(
        [f[:, 0], pdf, jnp.full((npix,), 0.5)], axis=-1
    ).reshape(height, width, 3)

    # importance samples
    mat_s = table.gather(jnp.zeros((num_samples,), dtype=jnp.int32))
    us = jax.random.uniform(jax.random.PRNGKey(seed), (num_samples, 6))
    nrm_s = jnp.broadcast_to(n, (num_samples, 3))
    u_s = jnp.broadcast_to(u_axis, (num_samples, 3))
    v_s = jnp.broadcast_to(v_axis, (num_samples, 3))
    wo_s = jnp.broadcast_to(jnp.asarray(wo), (num_samples, 3))
    light, _pdf, _t = bsdf_ops.bsdf_sample(
        mat_s, jnp.full((num_samples,), eta_i), jnp.full((num_samples,), eta_o),
        u_s, v_s, nrm_s, wo_s, us,
    )
    uv = np.asarray(dir_to_uv(light))

    image = np.asarray(img).copy()
    px = np.clip((uv[:, 0] * width).astype(int), 0, width - 1)
    py = np.clip((uv[:, 1] * height).astype(int), 0, height - 1)
    image[py, px] = [1.0, 0.0, 0.0]
    return image, uv
