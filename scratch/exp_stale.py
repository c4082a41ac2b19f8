"""How many pops are stale (tn_at_push >= t_best_now)? Upper bound on the
win from pop-time culling / drains."""
import numpy as np, sys
from fovpathtracing_optixcodelatest_tpu.models import scenes
from fovpathtracing_optixcodelatest_tpu.models.mesh import host_triangles
from fovpathtracing_optixcodelatest_tpu.ops.bvh_native import build as build_native

def analyze(bvh, o, d, tmin=1e-3, tmax=1e8):
    tab = np.asarray(bvh.table); A = bvh.arity
    EMPTY = -(2**31)
    useful_l, stale_l = [], []
    for ri in range(o.shape[0]):
        oo, dd = o[ri], d[ri]
        inv = 1.0/np.where(np.abs(dd)<1e-12, np.where(dd<0,-1e-12,1e-12), dd)
        stack = [(0, -np.inf)]; t_best = np.inf
        useful = stale = 0
        while stack:
            e, tn_push = stack.pop()
            if tn_push > t_best:
                stale += 1
                continue
            useful += 1
            if e >= 0:
                row = tab[e]
                u = row[:3*A].view(np.uint32)
                lo = (u & 0xFFFF0000).view(np.float32).reshape(A,3)
                hi = (u << 16).view(np.float32).reshape(A,3)
                code = row[3*A:4*A].view(np.int32)
                t0 = (lo - oo)*inv; t1 = (hi - oo)*inv
                tn = np.minimum(t0,t1).max(axis=1); tf = np.maximum(t0,t1).min(axis=1)
                hit = (tn<=tf)&(tf>=tmin)&(tn<=min(t_best,tmax))&(code!=EMPTY)
                order = np.argsort(-np.where(hit, tn, -np.inf))
                for c in order:
                    if hit[c]: stack.append((int(code[c]), float(tn[c])))
            else:
                r = -e-1; row = tab[r]
                for k in range(bvh.leaf_size):
                    b = k*9
                    v0=row[b:b+3]; e1=row[b+3:b+6]; e2=row[b+6:b+9]
                    p=np.cross(dd,e2); det=e1@p
                    if abs(det)<1e-9: continue
                    idet=1.0/det; tv=oo-v0
                    uu=(tv@p)*idet; q=np.cross(tv,e1); vv=(dd@q)*idet; t=(e2@q)*idet
                    if uu>=0 and vv>=0 and uu+vv<=1 and tmin<=t<=min(t_best,tmax):
                        t_best=t
        useful_l.append(useful); stale_l.append(stale)
    u=np.asarray(useful_l); s=np.asarray(stale_l)
    tot=u+s
    return (f"total mean={tot.mean():5.1f} max={tot.max():3d}  "
            f"useful mean={u.mean():5.1f} max={u.max():3d}  stale={s.mean():4.1f} ({100*s.sum()/tot.sum():.0f}%)")

meshes,_ = scenes.box_city(n=24, seed=0)
tris = host_triangles(meshes)
n=1024
rng=np.random.default_rng(0)
o=np.tile(np.array([0.0,6.0,45.0],np.float32),(n,1))
d=np.stack([rng.uniform(-0.4,0.4,n),rng.uniform(-0.35,0.05,n),-np.ones(n)],1).astype(np.float32)
d/=np.linalg.norm(d,axis=1,keepdims=True)
o2=rng.uniform(-35,35,(n,3)).astype(np.float32); o2[:,1]=rng.uniform(0,6,n)
d2=rng.normal(size=(n,3)).astype(np.float32); d2/=np.linalg.norm(d2,axis=1,keepdims=True)

for arity,leaf in [(16,14),(8,7)]:
    bvh=build_native(tris,leaf_size=leaf,arity=arity)
    print(f"A{arity}/L{leaf} coh: {analyze(bvh,o,d)}")
    print(f"A{arity}/L{leaf} inc: {analyze(bvh,o2,d2)}")
