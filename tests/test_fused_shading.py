"""Parity pins for the fused-shading dead end (ops/fused_shading.py — the
Pallas kernel measured SLOWER than the integrator's stacked XLA path at
frame scale; see its docstring and PLAN.md rule 32).

Two pins keep the documented negative result honest:
  1. the Pallas kernel (interpret mode on CPU) matches shade_core exactly —
     the kernel really computes the math it claims to fuse;
  2. shade_core's plane-wise math matches the stacked reference
     implementations the integrator actually uses (ops/bsdf.py,
     ops/probe_sampling.py) on identical inputs — no silent drift.
"""

import jax
import jax.numpy as jnp
import numpy as np

from fovpathtracing_optixcodelatest_tpu.models import scenes
from fovpathtracing_optixcodelatest_tpu.models.material import (
    MATERIAL_FLAG_SHADOW_CATCHER,
    Material,
    MaterialTable,
)
from fovpathtracing_optixcodelatest_tpu.models.probe import gradient_sky_probe
from fovpathtracing_optixcodelatest_tpu.models.scene import build_scene
from fovpathtracing_optixcodelatest_tpu.ops import bsdf as bsdf_ops
from fovpathtracing_optixcodelatest_tpu.ops import probe_sampling as probe_ops
from fovpathtracing_optixcodelatest_tpu.ops import shading_core as sc
from fovpathtracing_optixcodelatest_tpu.ops.fused_shading import shade_fused
from fovpathtracing_optixcodelatest_tpu.ops.rng import ray_uniforms
from fovpathtracing_optixcodelatest_tpu.ops.sampling import (
    basis_from_vector,
    dot,
    face_forward,
)

N = 2048


def _inputs():
    meshes, _cam = scenes.cornell()
    scene = build_scene(meshes, probe=gradient_sky_probe())
    rng = np.random.default_rng(11)
    tri = rng.integers(0, scene.geom.num_triangles, N)
    attr = np.asarray(scene.geom.tri_pack)[tri].copy()  # (N, 48)
    # Replace the embedded material rows (cols 12:36) with RANDOMIZED
    # materials that exercise every BSDF corner the Cornell set misses:
    # transmission (specTrans>0, eta spread), clearcoat, subsurface,
    # full-metallic, rough/smooth extremes, and the shadow-catcher flag —
    # VERDICT r3 item 8's drift guard: shade_core must track ops/bsdf.py on
    # the whole parameter domain, not just the bench scene's corner.
    mats = [
        Material(
            color=tuple(rng.uniform(0.05, 1.0, 3)),
            emission=(0.0, 0.0, 0.0),
            eta=float(rng.uniform(1.0, 2.0)),
            metallic=float(rng.choice([0.0, 1.0, rng.uniform()])),
            subsurface=float(rng.choice([0.0, 1.0, rng.uniform()])),
            specular=float(rng.uniform()),
            roughness=float(rng.choice([0.01, 1.0, rng.uniform()])),
            specular_tint=float(rng.uniform()),
            anisotropic=0.0,
            sheen=float(rng.uniform()),
            sheen_tint=float(rng.uniform()),
            clearcoat=float(rng.choice([0.0, 1.0, rng.uniform()])),
            clearcoat_gloss=float(rng.uniform()),
            transmission=float(rng.choice([0.0, 1.0, rng.uniform()])),
            flags=(MATERIAL_FLAG_SHADOW_CATCHER if i % 7 == 0 else 0),
        )
        for i in range(16)
    ]
    rows = MaterialTable.packed_rows_numpy(mats)  # (16, 24)
    attr[:, 12:36] = rows[rng.integers(0, len(mats), N)]
    attr = jnp.asarray(attr)
    o = jnp.asarray(rng.uniform(-2.0, 2.0, (N, 3)), jnp.float32)
    d = rng.normal(size=(N, 3))
    d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True), jnp.float32)
    thru = jnp.asarray(rng.uniform(0.2, 1.0, (N, 3)), jnp.float32)
    eta_in = jnp.where(
        jnp.asarray(rng.random(N) < 0.5), 1.0, 1.45
    ).astype(jnp.float32)
    hit_mask = jnp.asarray(rng.random(N) < 0.9)
    uni = ray_uniforms(jax.random.PRNGKey(3), jnp.arange(N, dtype=jnp.int32), 8)
    probe = scene.probe
    k = probe.width * probe.height
    cand = jnp.minimum((uni[:, 0] * k).astype(jnp.int32), k - 1)
    probe_g = jnp.take(probe.sample_rows, cand, axis=0)  # (N, 13)
    return scene, o, d, thru, eta_in, hit_mask, uni, probe_g, attr


def _core(scene, o, d, thru, eta_in, hit_mask, uni, probe_g, attr):
    cols = lambda a: tuple(a[:, i] for i in range(a.shape[1]))  # noqa: E731
    return sc.shade_core(
        cols(o), cols(d), cols(attr), cols(probe_g), cols(uni), cols(thru),
        eta_in, hit_mask, scene.probe.width, scene.probe.height,
        1e-3, 1e16, need_aov=True,
    )


def test_pallas_kernel_matches_shade_core():
    scene, o, d, thru, eta_in, hit_mask, uni, probe_g, attr = _inputs()
    core = _core(scene, o, d, thru, eta_in, hit_mask, uni, probe_g, attr)
    cols = lambda a: tuple(a[:, i] for i in range(a.shape[1]))  # noqa: E731
    fused = shade_fused(
        cols(o), cols(d), cols(thru), eta_in, cols(uni), cols(probe_g),
        cols(attr), hit_mask, scene.probe.width, scene.probe.height,
        1e-3, 1e16, need_aov=True, interpret=True,
    )
    for key in ("occl_query", "sample_ok", "is_catcher", "transmitted"):
        np.testing.assert_array_equal(
            np.asarray(fused[key]), np.asarray(core[key]), err_msg=key
        )
    # interpret mode and XLA CPU differ by fma/reassociation noise only
    for key in ("t", "eta_out"):
        np.testing.assert_allclose(
            np.asarray(fused[key]), np.asarray(core[key]),
            rtol=2e-4, atol=1e-5, err_msg=key,
        )
    for key in ("p", "wi", "l_dir", "tl", "emission", "new_thru", "normal",
                "albedo"):
        got = np.stack([np.asarray(c) for c in fused[key]], axis=1)
        want = np.stack([np.asarray(c) for c in core[key]], axis=1)
        np.testing.assert_allclose(
            got, want, rtol=2e-4, atol=1e-5, err_msg=key
        )


def test_shade_core_matches_stacked_reference_ops():
    scene, o, d, thru, eta_in, hit_mask, uni, probe_g, attr = _inputs()
    core = _core(scene, o, d, thru, eta_in, hit_mask, uni, probe_g, attr)

    # the integrator's stacked math on the same inputs (render/integrator.py
    # bounce body, untextured scene)
    ng = attr[:, 0:3]
    nrm = face_forward(ng, -d)
    m = scene.materials.view_rows(attr[:, 12:36])
    albedo = m.color
    entering = eta_in == 1.0
    out_eta = jnp.where(entering, m.eta, 1.0)
    view = -d
    wi, sky_col, sky_pdf = probe_ops.probe_sample(
        scene.probe, uni[:, 0], uni[:, 1]
    )
    nee_pdf = bsdf_ops.bsdf_pdf(m, eta_in, out_eta, nrm, view, wi)
    nee_f = bsdf_ops.bsdf_eval(m, albedo, eta_in, out_eta, nrm, view, wi)
    denom = 0.5 * nee_pdf + 0.5 * sky_pdf
    weight = jnp.where(
        denom > 0, 0.5 * sky_pdf / jnp.maximum(denom, 1e-20), 0.0
    )
    valid = (nee_pdf > 0.0) & (weight > 0.0) & (sky_pdf > 0.0)
    light_val = jnp.where(
        valid[:, None],
        weight[:, None] * sky_col * nee_f
        * jnp.abs(dot(wi, nrm))[:, None]
        / jnp.maximum(sky_pdf, 1e-20)[:, None],
        0.0,
    )
    occl_query = hit_mask & (jnp.max(light_val, axis=1) > 0.0)
    u_frame, v_frame = basis_from_vector(nrm)
    l_dir, pdf, _stype = bsdf_ops.bsdf_sample(
        m, eta_in, out_eta, u_frame, v_frame, nrm, view, uni[:, 2:8]
    )
    sample_ok = pdf > 0.0
    f_b = bsdf_ops.bsdf_eval(m, albedo, eta_in, out_eta, nrm, view, l_dir)
    thr_scale = (
        f_b * jnp.abs(dot(nrm, l_dir))[:, None]
        / jnp.maximum(pdf, 1e-20)[:, None]
    )
    new_thru = jnp.where(
        (hit_mask & sample_ok)[:, None], thru * thr_scale, thru
    )

    np.testing.assert_array_equal(
        np.asarray(core["occl_query"]), np.asarray(occl_query)
    )
    np.testing.assert_array_equal(
        np.asarray(core["sample_ok"]), np.asarray(sample_ok)
    )
    for key, want in (
        ("wi", wi), ("l_dir", l_dir),
        ("tl", thru * light_val), ("new_thru", new_thru),
    ):
        got = np.stack([np.asarray(c) for c in core[key]], axis=1)
        np.testing.assert_allclose(
            got, np.asarray(want), rtol=1e-5, atol=1e-6, err_msg=key
        )
