"""Mean vs max pops per ray: how much lockstep tail waste is there?
Variant of closest_hit accumulating sum(fresh pops) over all rays."""
import sys
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
jax.config.update("jax_compilation_cache_dir", "/tmp/fovtpu_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
from fovpathtracing_optixcodelatest_tpu.models import scenes
from fovpathtracing_optixcodelatest_tpu.models.scene import build_scene
from fovpathtracing_optixcodelatest_tpu.ops import traverse8 as tv
from fovpathtracing_optixcodelatest_tpu.ops.bvh8 import WideBVH

meshes, cam = scenes.box_city(n=24, seed=0)
scene = build_scene(meshes)
bvh = scene.bvh

def closest_stats(bvh, origin, direction, tmin, tmax):
    origin, direction, active, n0 = tv._pad_rays(
        origin, direction, jnp.ones((origin.shape[0],), bool))
    n = origin.shape[0]; l = n // tv.SUB
    o_r, d_r, inv_r = tv._ray_tiles(origin, direction, l)
    state = (
        jnp.zeros((bvh.stack_depth, tv.SUB, l), jnp.int32),
        jnp.full((bvh.stack_depth, tv.SUB, l), -jnp.inf, jnp.float32),
        active.reshape(tv.SUB, l).astype(jnp.int32),
        jnp.full((tv.SUB, l), jnp.inf, jnp.float32),
        jnp.zeros((tv.SUB, l), jnp.float32),
        jnp.zeros((tv.SUB, l), jnp.float32),
        jnp.full((tv.SUB, l), -1, jnp.int32),
        jnp.zeros((), jnp.int32),  # iters
        jnp.zeros((), jnp.int64),  # total fresh pops
        jnp.zeros((), jnp.int64),  # total drained (consumed-1 extra)
    )
    def cond(s):
        return jnp.any(s[2] > 0) & (s[7] < 100000)
    def body(s):
        stack, tns, sp, t, u, v, best, it, pops, drained = s
        tlimit = jnp.minimum(t, tmax)
        consumed_before = jnp.sum(sp)
        entry, sp, fresh = tv._pop_fresh(stack, tns, sp, tlimit, drains=2)
        is_node = fresh & (entry >= 0)
        is_leaf = fresh & (entry < 0)
        gt = tv._gather_row(bvh.table, entry, is_leaf)
        hits, tns_c, entries = tv._expand(gt, is_node, o_r, inv_r, tmin, tlimit, bvh.arity)
        keys = [jnp.where(h, tn, -jnp.inf) for h, tn in zip(hits, tns_c)]
        keys_c, entries_c, tns_cc = tv._sort_desc(keys, entries, tns_c)
        cnt = hits[0].astype(jnp.int32)
        for h in hits[1:]:
            cnt = cnt + h.astype(jnp.int32)
        stack, tns, sp2 = tv._push2(stack, tns, sp, entries_c, tns_cc, cnt)
        leaf = jnp.where(is_leaf, -entry - 1, 0)
        for k, (hk, tk, uk, vk) in enumerate(
            tv._leaf_hits(gt, is_leaf, o_r, d_r, tmin, tmax, False, bvh.leaf_size)):
            better = hk & (tk < t)
            t = jnp.where(better, tk, t)
            u = jnp.where(better, uk, u)
            v = jnp.where(better, vk, v)
            best = jnp.where(better, leaf * bvh.leaf_size + k, best)
        pops = pops + jnp.sum(fresh.astype(jnp.int64))
        drained = drained + (consumed_before - jnp.sum(sp)).astype(jnp.int64)
        return (stack, tns, sp2, t, u, v, best, it + 1, pops, drained)
    out = lax.while_loop(cond, body, state)
    return out[7], out[8], out[9]

rng = np.random.default_rng(0)
M = 1 << 20
ob = np.stack([rng.uniform(-40, 40, M), rng.uniform(0, 10, M),
               rng.uniform(-40, 40, M)], 1).astype(np.float32)
db = rng.normal(size=(M, 3)).astype(np.float32)
db /= np.linalg.norm(db, axis=1, keepdims=True)
# coherent too
oc = np.tile(np.array([0.0, 6.0, 45.0], np.float32), (M, 1))
dc = np.stack([rng.uniform(-0.4, 0.4, M), rng.uniform(-0.35, 0.05, M),
               -np.ones(M)], 1).astype(np.float32)
dc /= np.linalg.norm(dc, axis=1, keepdims=True)

for tag, o, d in (("incoh", ob, db), ("coh", oc, dc)):
    o_d, d_d = jax.device_put((o, d))
    CH = 1 << 14
    its = pops = cons = 0
    f = jax.jit(lambda b, o, d: closest_stats(b, o, d, 1e-3, 1e8))
    for c in range(0, M, CH * 16):  # sample 1/16 of chunks
        it, p, dr = f(bvh, o_d[c : c + CH], d_d[c : c + CH])
        its += int(it); pops += int(p); cons += int(dr)
    n_rays = CH * len(range(0, M, CH * 16))
    print(f"{tag}: iters/chunk={its/ (n_rays//CH):.1f} "
          f"mean fresh pops/ray={pops/n_rays:.1f} "
          f"mean consumed/ray={cons/n_rays:.1f}", file=sys.stderr)
