"""Exact per-ray pop statistics for tree-design decisions (host numpy,
mimics traverse8.closest_hit semantics incl. push-time t-culling + LIFO)."""
import numpy as np, sys
from fovpathtracing_optixcodelatest_tpu.models import scenes
from fovpathtracing_optixcodelatest_tpu.models.mesh import host_triangles
from fovpathtracing_optixcodelatest_tpu.ops.bvh_native import build as build_native
from fovpathtracing_optixcodelatest_tpu.ops import bvh8

def analyze(bvh, o, d, tmin=1e-3, tmax=1e8):
    tab = np.asarray(bvh.table); A = bvh.arity; m_leafstart = None
    perm = np.asarray(bvh.leaf_perm)
    EMPTY = -(2**31)
    stats = []
    for ri in range(o.shape[0]):
        oo, dd = o[ri], d[ri]
        inv = 1.0 / np.where(np.abs(dd) < 1e-12, np.where(dd < 0, -1e-12, 1e-12), dd)
        stack = [0]; t_best = np.inf
        node_pops = leaf_pops = 0
        while stack:
            e = stack.pop()
            if e >= 0:
                node_pops += 1
                row = tab[e]
                u = row[:3*A].view(np.uint32)
                lo = (u & 0xFFFF0000).view(np.float32).reshape(A,3)
                hi = (u << 16).view(np.float32).reshape(A,3)
                code = row[3*A:4*A].view(np.int32)
                t0 = (lo - oo) * inv; t1 = (hi - oo) * inv
                tn = np.minimum(t0,t1).max(axis=1); tf = np.maximum(t0,t1).min(axis=1)
                tlimit = min(t_best, tmax)
                hit = (tn <= tf) & (tf >= tmin) & (tn <= tlimit) & (code != EMPTY)
                order = np.argsort(-np.where(hit, tn, -np.inf))  # far first
                for c in order:
                    if hit[c]:
                        stack.append(int(code[c]))
            else:
                leaf_pops += 1
                r = -e - 1
                row = tab[r]
                for k in range(bvh.leaf_size):
                    b = k*9
                    v0 = row[b:b+3]; e1 = row[b+3:b+6]; e2 = row[b+6:b+9]
                    p = np.cross(dd, e2); det = e1 @ p
                    if abs(det) < 1e-9: continue
                    inv_det = 1.0/det
                    tv = oo - v0
                    uu = (tv @ p) * inv_det
                    q = np.cross(tv, e1)
                    vv = (dd @ q) * inv_det
                    t = (e2 @ q) * inv_det
                    if uu>=0 and vv>=0 and uu+vv<=1 and tmin<=t<=min(t_best,tmax):
                        t_best = t
        stats.append((node_pops, leaf_pops))
    s = np.asarray(stats)
    tot = s.sum(axis=1)
    return dict(mean=tot.mean(), p95=np.percentile(tot,95), max=tot.max(),
                node=s[:,0].mean(), leaf=s[:,1].mean())

meshes, _ = scenes.box_city(n=24, seed=0)
tris = host_triangles(meshes)
n = 1024
rng = np.random.default_rng(0)
o = np.tile(np.array([0.0, 6.0, 45.0], np.float32), (n,1))
d = np.stack([rng.uniform(-0.4,0.4,n), rng.uniform(-0.35,0.05,n), -np.ones(n)],1).astype(np.float32)
d /= np.linalg.norm(d,axis=1,keepdims=True)
o2 = rng.uniform(-35,35,(n,3)).astype(np.float32); o2[:,1] = rng.uniform(0,6,n)
d2 = rng.normal(size=(n,3)).astype(np.float32); d2 /= np.linalg.norm(d2,axis=1,keepdims=True)

import itertools
for arity, leaf in [(8,4),(8,7),(16,7),(16,14),(32,7)]:
    try:
        bvh = build_native(tris, leaf_size=min(leaf,15), arity=arity)
    except Exception as ex:
        print(arity, leaf, "FAIL", ex); continue
    r1 = analyze(bvh, o, d)
    r2 = analyze(bvh, o2, d2)
    print(f"A={arity:2d} leaf={leaf:2d} rows={bvh.num_rows:5d} W={bvh.table.shape[1]:3d} "
          f"coh mean={r1['mean']:5.1f} p95={r1['p95']:5.1f} max={r1['max']:3.0f} (n{r1['node']:4.1f}/l{r1['leaf']:4.1f}) | "
          f"inc mean={r2['mean']:5.1f} p95={r2['p95']:5.1f} max={r2['max']:3.0f} (n{r2['node']:4.1f}/l{r2['leaf']:4.1f})")
