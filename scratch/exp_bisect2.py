"""Bisect the real integrator by disabling parts; fetch ALL outputs."""
import dataclasses, sys, time
import numpy as np
import jax, jax.numpy as jnp
from fovpathtracing_optixcodelatest_tpu.config import FoveationSchedule, RenderConfig
from fovpathtracing_optixcodelatest_tpu.models import scenes
from fovpathtracing_optixcodelatest_tpu.models.probe import gradient_sky_probe
from fovpathtracing_optixcodelatest_tpu.models.scene import build_scene
from fovpathtracing_optixcodelatest_tpu.models.material import MATERIAL_FLAG_SHADOW_CATCHER
from fovpathtracing_optixcodelatest_tpu.models.texture import sample_bilinear_wrap
from fovpathtracing_optixcodelatest_tpu.ops import bsdf as bsdf_ops
from fovpathtracing_optixcodelatest_tpu.ops import probe_sampling as probe_ops
from fovpathtracing_optixcodelatest_tpu.ops import traverse8
from fovpathtracing_optixcodelatest_tpu.ops.rng import ray_uniforms
from fovpathtracing_optixcodelatest_tpu.ops.sampling import basis_from_vector, dot, face_forward
from fovpathtracing_optixcodelatest_tpu.render import raygen

width, height = 960, 540
meshes, cam = scenes.box_city(n=24, seed=0)
scene = build_scene(meshes, probe=gradient_sky_probe())
config = RenderConfig(width=width, height=height)
schedule = FoveationSchedule.reference_32_16_8()
camp = dataclasses.replace(cam, aspect=width / height).device_params()
gxq = jnp.asarray(width // 2, jnp.int32); gyq = jnp.asarray(height // 2, jnp.int32)
key = jax.random.PRNGKey(0)
p = schedule.passes[1]
rays = raygen.generate_pass_rays(camp, p, width, height, gxq, gyq, key, antialias=True)
o0, d0, act0, rid = jax.device_put((rays["origin"], rays["direction"], rays["active"], rays["ray_ids"]))

def paths(scene, origin, direction, active, key, ray_ids, parts):
    n = origin.shape[0]
    f3 = lambda v: jnp.full((n, 3), v, dtype=jnp.float32)
    def _closest(o, d, act):
        order = jnp.argsort(~act); inv = jnp.argsort(order)
        out = traverse8.closest_hit(scene.bvh, o[order], d[order], config.tmin, config.tmax, active=act[order])
        return {k: (v if k == "steps" else v[inv]) for k, v in out.items()}
    def _occluded(o, d, act):
        order = jnp.argsort(~act); inv = jnp.argsort(order)
        return traverse8.occluded(scene.bvh, o[order], d[order], config.tmin, config.tmax, active=act[order])[inv]
    carry = dict(origin=origin, direction=direction, throughput=f3(1.0),
                 eta=jnp.ones((n,), jnp.float32), radiance=f3(0.0), alpha=f3(0.0),
                 alive=active, traces=jnp.zeros((), jnp.int32))
    def bounce(carry, depth):
        o = carry["origin"]; d = carry["direction"]; alive = carry["alive"]; eta_in = carry["eta"]
        hit = _closest(o, d, alive) if "sort" in parts else traverse8.closest_hit(scene.bvh, o, d, config.tmin, config.tmax, active=alive)
        hit_mask = alive & hit["hit"]
        tri = jnp.maximum(hit["tri_id"], 0)
        pos = jnp.where(hit_mask[:, None], o + hit["t"][:, None] * d, o)
        attr = jnp.take(scene.geom.tri_pack, tri, axis=0)
        ng = attr[:, 0:3]
        nrm = face_forward(ng, -d)
        mat_id = jax.lax.bitcast_convert_type(attr[:, 9], jnp.int32)
        tex_id = jax.lax.bitcast_convert_type(attr[:, 10], jnp.int32)
        mat = scene.materials.gather(mat_id)
        if "tex" in parts:
            bu = hit["u"][:, None]; bv = hit["v"][:, None]
            uv = (1.0-bu-bv)*attr[:,3:5] + bu*attr[:,5:7] + bv*attr[:,7:9]
            tex_col = sample_bilinear_wrap(scene.textures, tex_id, uv)
            albedo = jnp.where((tex_id >= 0)[:, None], tex_col, mat.color)
        else:
            albedo = mat.color
        entering = eta_in == 1.0
        out_eta = jnp.where(entering, mat.eta, 1.0)
        u_all = ray_uniforms(jax.random.fold_in(key, depth), ray_ids, 8)
        if "nee" in parts:
            wi, sky_col, sky_pdf = probe_ops.probe_sample(scene.probe, u_all[:, 0], u_all[:, 1])
            occl = _occluded(pos, wi, hit_mask) if "sort" in parts else traverse8.occluded(scene.bvh, pos, wi, config.tmin, config.tmax, active=hit_mask)
            view = -d
            nee_pdf = bsdf_ops.bsdf_pdf(mat, eta_in, out_eta, nrm, view, wi)
            nee_f = bsdf_ops.bsdf_eval(mat, albedo, eta_in, out_eta, nrm, view, wi)
            denom = 0.5*nee_pdf + 0.5*sky_pdf
            weight = jnp.where(denom > 0, 0.5*sky_pdf/jnp.maximum(denom,1e-20), 0.0)
            valid = (nee_pdf > 0.0) & (weight > 0.0) & (sky_pdf > 0.0)
            light_val = jnp.where(valid[:,None], weight[:,None]*sky_col*nee_f*jnp.abs(dot(wi,nrm))[:,None]/jnp.maximum(sky_pdf,1e-20)[:,None], 0.0)
            nee_contrib = jnp.where((~occl)[:,None], light_val, 0.0)
        else:
            nee_contrib = f3(0.01)
        vert_radiance = carry["throughput"] * nee_contrib + jnp.where((depth==0)&hit_mask,1.0,0.0)[:,None]*mat.emission
        if "bsdf" in parts:
            view = -d
            u_frame, v_frame = basis_from_vector(nrm)
            l_dir, pdf, _st = bsdf_ops.bsdf_sample(mat, eta_in, out_eta, u_frame, v_frame, nrm, view, u_all[:, 2:8])
            sample_ok = pdf > 0.0
            f_b = bsdf_ops.bsdf_eval(mat, albedo, eta_in, out_eta, nrm, view, l_dir)
            transmitted = dot(l_dir, nrm) <= 0.0
            eta_out = jnp.where(hit_mask & transmitted, out_eta, eta_in)
            throughput = jnp.where((hit_mask & sample_ok)[:,None],
                carry["throughput"]*f_b*jnp.abs(dot(nrm,l_dir))[:,None]/jnp.maximum(pdf,1e-20)[:,None], carry["throughput"])
        else:
            u_frame, v_frame = basis_from_vector(nrm)
            l_dir = nrm; pdf = jnp.ones((n,)); sample_ok = pdf > 0
            eta_out = eta_in; throughput = carry["throughput"] * 0.9
        contrib = jnp.where((hit_mask & sample_ok)[:,None], vert_radiance, 0.0)
        new_carry = dict(origin=jnp.where(hit_mask[:,None], pos, o),
                         direction=jnp.where(hit_mask[:,None], l_dir, d),
                         throughput=throughput, eta=eta_out,
                         radiance=carry["radiance"]+contrib,
                         alpha=carry["alpha"]+0.1*contrib,
                         alive=hit_mask & sample_ok,
                         traces=carry["traces"]+jnp.sum(alive.astype(jnp.int32))+jnp.sum(hit_mask.astype(jnp.int32)))
        return new_carry, None
    carry, _ = jax.lax.scan(bounce, carry, jnp.arange(config.max_depth, dtype=jnp.int32))
    return carry["radiance"], carry["alpha"], carry["traces"]

import functools
def timeit(name, parts):
    fn = jax.jit(functools.partial(paths, parts=parts))
    out = fn(scene, o0, d0, act0, key, rid)
    _ = [np.asarray(x).ravel()[:2] for x in out]
    ts = []
    for _i in range(2):
        t0 = time.perf_counter(); out = fn(scene, o0, d0, act0, key, rid)
        _ = [np.asarray(x).ravel()[:2] for x in out]
        ts.append(time.perf_counter()-t0)
    print(f"{name:34s}: {min(ts)*1e3:7.0f} ms", file=sys.stderr)

timeit("full (sort+tex+nee+bsdf)", frozenset({"sort","tex","nee","bsdf"}))
timeit("no sort", frozenset({"tex","nee","bsdf"}))
timeit("no nee (also no occl)", frozenset({"sort","tex","bsdf"}))
timeit("no bsdf", frozenset({"sort","tex","nee"}))
timeit("no tex", frozenset({"sort","nee","bsdf"}))
timeit("traversal+carry only", frozenset({"sort"}))
