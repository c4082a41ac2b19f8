"""Phase-level diagnosis of the treelet traversal at 1.9M tris.
Measures: plain, treelet whole, top pass alone, live fractions per round.
Two ray sets: coherent camera-like primaries and random rays.
"""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/fovtpu_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
from fovpathtracing_optixcodelatest_tpu.models import scenes
from fovpathtracing_optixcodelatest_tpu.models.scene import build_scene
from fovpathtracing_optixcodelatest_tpu.ops import traverse8 as tv

t0 = time.perf_counter()
meshes, cam = scenes.box_city_fast(n=400, seed=0)
scene = build_scene(meshes)
bvh = scene.bvh
print(f"build {time.perf_counter()-t0:.1f}s rows={bvh.num_rows} "
      f"top={bvh.top_rows}", file=sys.stderr)

M = 1 << 20
rng = np.random.default_rng(0)
# coherent: camera-like primaries through a grid
eye = np.array([-48.0, 18.0, 48.0], np.float32)
gx, gy = np.meshgrid(np.linspace(-0.5, 0.5, 1024),
                     np.linspace(-0.3, 0.3, 1024))
fwd = -eye / np.linalg.norm(eye)
right = np.cross(fwd, [0, 1, 0]); right /= np.linalg.norm(right)
up = np.cross(right, fwd)
dirs = (fwd[None, :] + gx.ravel()[:, None] * right[None, :]
        + gy.ravel()[:, None] * up[None, :]).astype(np.float32)
dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
o_coh = np.broadcast_to(eye, (M, 3)).astype(np.float32)
# random
lo = min(float(m.vertex.min()) for m in meshes)
hi = max(float(m.vertex.max()) for m in meshes)
o_rnd = np.stack([rng.uniform(lo, hi, M), rng.uniform(0, 20, M),
                  rng.uniform(lo, hi, M)], 1).astype(np.float32)
d_rnd = rng.normal(size=(M, 3)).astype(np.float32)
d_rnd /= np.linalg.norm(d_rnd, axis=1, keepdims=True)

sets = {
    "coh": jax.device_put((o_coh, dirs)),
    "rnd": jax.device_put((o_rnd, d_rnd)),
}


def timeit(tag, fn, *args):
    f = jax.jit(fn)
    out = f(*args); _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    out = f(*args); r = jax.tree_util.tree_map(np.asarray, out)
    dt = time.perf_counter() - t0
    print(f"{tag}: {dt*1e3:7.1f} ms  {M/dt/1e6:6.2f} Mrays/s", file=sys.stderr)
    return r


for name, (o_d, d_d) in sets.items():
    print(f"--- {name} ---", file=sys.stderr)
    timeit(f"{name} plain  ",
           lambda o, d: tv.closest_hit(bvh, o, d, 1e-3, 1e8,
                                       no_window=True)["t"], o_d, d_d)
    timeit(f"{name} staged ",
           lambda o, d: tv.closest_hit_staged(bvh, o, d, 1e-3, 1e8)["t"],
           o_d, d_d)
    timeit(f"{name} treelet",
           lambda o, d: tv.closest_hit_treelet(bvh, o, d, 1e-3, 1e8)["t"],
           o_d, d_d)

    # top pass alone + live fractions through the repeats
    def phases(o, d):
        n = o.shape[0]
        t_cur = jnp.full((n,), jnp.inf, jnp.float32)
        live = jnp.ones((n,), bool)
        outs = []
        done = []
        chunk = tv.DEFAULT_CHUNK
        for r in range(3):
            pt = tv._top_pass(bvh, o, d, 1e-3, 1e8, live, t_cur,
                              tuple(done), 100000, chunk)
            better = live & (pt["tri_id"] >= 0) & (pt["t"] < t_cur)
            t_cur = jnp.where(better, pt["t"], t_cur)
            nearest = jnp.where(live, pt["nearest"], tv._ESENT)
            live = live & (nearest != tv._ESENT)
            outs.append(jnp.sum(live.astype(jnp.int32)))
            done.append(jnp.where(live, nearest, tv._ESENT))
            # serve the nearest treelet (unsorted! just to advance t) —
            # NOT a timing-faithful round; we only want live fractions
            cb = tv.codebits(bvh.num_rows)
            low = jnp.uint32((1 << cb) - 1)
            idx = jnp.arange(n, dtype=jnp.int32)
            rk = jnp.where(live, ((nearest & low) >> 2).astype(jnp.int32),
                           jnp.int32(0x7FFFFFFF))
            s = jax.lax.sort([rk, idx, o[:, 0], o[:, 1], o[:, 2],
                              d[:, 0], d[:, 1], d[:, 2], t_cur, nearest],
                             num_keys=2)
            p = tv.closest_hit(bvh, jnp.stack(s[2:5], 1), jnp.stack(s[5:8], 1),
                               1e-3, 1e8, active=s[0] < jnp.int32(0x7FFFFFFF),
                               chunk=chunk, t_seed=s[8], entry0=s[9])
            fin = jax.lax.sort(
                [s[1], jnp.where(p["hit"], p["tri_id"], -1), p["t"]],
                num_keys=1)
            closer = fin[1] >= 0
            t_cur = jnp.where(closer, fin[2], t_cur)
        return tuple(outs)

    f = jax.jit(phases)
    r = f(o_d, d_d); _ = np.asarray(r[0])
    print(f"{name} live after rounds 1/2/3: "
          f"{[int(np.asarray(x)) for x in r]} of {M}", file=sys.stderr)

    # time ONE top pass and ONE row-sorted round separately
    def top_only(o, d):
        n = o.shape[0]
        pt = tv._top_pass(bvh, o, d, 1e-3, 1e8,
                          jnp.ones((n,), bool),
                          jnp.full((n,), jnp.inf, jnp.float32),
                          (), 100000, tv.DEFAULT_CHUNK)
        return pt["nearest"], pt["t"]
    near, t_top = timeit(f"{name} top1   ", top_only, o_d, d_d)
    near_d, t_d = jax.device_put((near, t_top))

    def round_only(o, d, nearest, t_cur):
        n = o.shape[0]
        cb = tv.codebits(bvh.num_rows)
        low = jnp.uint32((1 << cb) - 1)
        live = nearest != tv._ESENT
        idx = jnp.arange(n, dtype=jnp.int32)
        rk = jnp.where(live, ((nearest & low) >> 2).astype(jnp.int32),
                       jnp.int32(0x7FFFFFFF))
        s = jax.lax.sort([rk, idx, o[:, 0], o[:, 1], o[:, 2],
                          d[:, 0], d[:, 1], d[:, 2], t_cur, nearest],
                         num_keys=2)
        p = tv.closest_hit(bvh, jnp.stack(s[2:5], 1), jnp.stack(s[5:8], 1),
                           1e-3, 1e8, active=s[0] < jnp.int32(0x7FFFFFFF),
                           chunk=tv.DEFAULT_CHUNK, t_seed=s[8], entry0=s[9])
        return p["t"][0]
    timeit(f"{name} round1 ", round_only, o_d, d_d, near_d, t_d)
