"""Ceiling test: sort rays by their TRUE pop count (oracle predictor) so
chunks are pop-homogeneous; measure step/time reduction of closest_hit."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/fovtpu_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
from fovpathtracing_optixcodelatest_tpu.models import scenes
from fovpathtracing_optixcodelatest_tpu.models.scene import build_scene
from fovpathtracing_optixcodelatest_tpu.ops import traverse8 as tv

meshes, cam = scenes.box_city(n=24, seed=0)
scene = build_scene(meshes)
bvh = scene.bvh
rng = np.random.default_rng(0)
M = 1 << 20
ob = np.stack([rng.uniform(-40, 40, M), rng.uniform(0, 10, M),
               rng.uniform(-40, 40, M)], 1).astype(np.float32)
db = rng.normal(size=(M, 3)).astype(np.float32)
db /= np.linalg.norm(db, axis=1, keepdims=True)
o_d, d_d = jax.device_put((ob, db))

# per-ray pops via the instrumented loop from exp_popstats (chunked manually)
exec(open("scratch/exp_popstats.py").read().split("rng = np.random")[0].split("meshes, cam")[0])
# ^ imports only; define a per-ray pop closest variant here instead:

def closest_pops(bvh, origin, direction):
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
        jnp.zeros((), jnp.int32),
        jnp.zeros((tv.SUB, l), jnp.int32),  # per-ray fresh pops
    )
    def cond(s):
        return jnp.any(s[2] > 0) & (s[7] < 100000)
    def body(s):
        stack, tns, sp, t, u, v, best, it, rpops = s
        tlimit = jnp.minimum(t, 1e8)
        entry, sp, fresh = tv._pop_fresh(stack, tns, sp, tlimit, drains=2)
        is_node = fresh & (entry >= 0)
        is_leaf = fresh & (entry < 0)
        gt = tv._gather_row(bvh.table, entry, is_leaf)
        hits, tns_c, entries = tv._expand(gt, is_node, o_r, inv_r, 1e-3, tlimit, bvh.arity)
        keys = [jnp.where(h, tn, -jnp.inf) for h, tn in zip(hits, tns_c)]
        keys_c, entries_c, tns_cc = tv._sort_desc(keys, entries, tns_c)
        cnt = hits[0].astype(jnp.int32)
        for h in hits[1:]:
            cnt = cnt + h.astype(jnp.int32)
        stack, tns, sp = tv._push2(stack, tns, sp, entries_c, tns_cc, cnt)
        leaf = jnp.where(is_leaf, -entry - 1, 0)
        for k, (hk, tk, uk, vk) in enumerate(
            tv._leaf_hits(gt, is_leaf, o_r, d_r, 1e-3, 1e8, False, bvh.leaf_size)):
            better = hk & (tk < t)
            t = jnp.where(better, tk, t)
            u = jnp.where(better, uk, u); v = jnp.where(better, vk, v)
            best = jnp.where(better, leaf * bvh.leaf_size + k, best)
        return (stack, tns, sp, t, u, v, best, it + 1,
                rpops + fresh.astype(jnp.int32))
    out = jax.lax.while_loop(cond, body, state)
    return out[8].reshape(-1)[:n0]

CH = 1 << 14
pops = []
f = jax.jit(closest_pops)
for c in range(0, M, CH):
    pops.append(np.asarray(f(bvh, o_d[c:c+CH], d_d[c:c+CH])))
pops = np.concatenate(pops)
print(f"pops: mean {pops.mean():.1f} p50 {np.percentile(pops,50):.0f} "
      f"p90 {np.percentile(pops,90):.0f} p99 {np.percentile(pops,99):.0f} "
      f"max {pops.max()}", file=sys.stderr)

order = np.argsort(pops)
o_s, d_s = jax.device_put((ob[order], db[order]))

def base(b, o, d):
    acc = jnp.zeros((), jnp.float32); st = jnp.zeros((), jnp.int32)
    for i in range(2):
        out = tv.closest_hit(b, o + acc, d, 1e-3, 1e8)
        acc = acc + out["t"][0] * 0.0
        st = st + out["steps"]
    return acc, st

for tag, oo, dd in (("unsorted", o_d, d_d), ("pop-sorted", o_s, d_s)):
    fb = jax.jit(base)
    out = fb(bvh, oo, dd); _ = np.asarray(out[0])
    t0 = time.perf_counter(); out = fb(bvh, oo, dd); _ = np.asarray(out[0])
    dt = (time.perf_counter() - t0) / 2
    print(f"{tag}: {dt*1e3:.1f} ms, steps={int(out[1])//2}, "
          f"{M/dt/1e6:.1f} Mrays/s", file=sys.stderr)
