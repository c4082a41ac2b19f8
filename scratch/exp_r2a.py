"""Round-2 decision data on TPU:
A. lax.sort cost vs operand count at frame scale (N=1.92M).
B. stack one-hot cost vs stack depth (47 vs 16 vs 8) at (8,2048).
C. closest_hit chunk-size sweep on frame-realistic coherent + bounce rays.
Honest timing: chained in one jit, one scalar fetch, first-run discarded.
"""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/fovtpu_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

N = 1923984
REPS = 4


def timeit(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args); _ = np.asarray(out)
    t0 = time.perf_counter(); out = f(*args); _ = np.asarray(out)
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name}: {dt*1e3:.2f} ms", file=sys.stderr)
    return dt


# ---------- A: sort cost ----------
rng = np.random.default_rng(0)
key_b = jax.device_put(jnp.asarray(rng.random(N) < 0.5))
cols8 = jax.device_put([jnp.asarray(rng.random(N, dtype=np.float32)) for _ in range(25)])

def sort_k(k, stable):
    def fn(kb, cs):
        acc = jnp.zeros((), jnp.float32)
        for i in range(REPS):
            out = lax.sort([kb ^ (acc > 0)] + [c + acc for c in cs[: k - 1]],
                           num_keys=1, is_stable=stable)
            acc = acc + out[1][0] * 0.0
        return acc
    return fn

for k in (2, 6, 8, 26):
    timeit(f"sort{k}", sort_k(k, False), key_b, cols8)
timeit("sort26 stable", sort_k(26, True), key_b, cols8)

# ---------- B: stack one-hot push+pop cost vs depth ----------
from fovpathtracing_optixcodelatest_tpu.ops import traverse8 as tv

L = 2048
def stack_iters(D, iters=64):
    def fn(seed):
        stack = jnp.zeros((D, 8, L), jnp.int32) + seed
        tns = jnp.zeros((D, 8, L), jnp.float32)
        sp = jnp.full((8, L), D // 2, jnp.int32)
        tl = jnp.full((8, L), 1e9, jnp.float32)
        acc = jnp.zeros((), jnp.int32)
        def body(i, s):
            stack, tns, sp, acc = s
            e, sp2, fresh = tv._pop_fresh(stack, tns, sp, tl, drains=2)
            ent = [e + j for j in range(4)]
            tn = [tns[0] + j for j in range(4)]
            cnt = jnp.where(fresh, 3, 1)
            stack, tns, sp3 = tv._push2(stack, tns, sp2, ent, tn, cnt)
            sp3 = jnp.where(sp3 >= D - 4, D // 2, sp3)
            return (stack, tns, sp3, acc + e[0, 0])
        out = lax.fori_loop(0, iters, body, (stack, tns, sp, acc))
        return out[3]
    return fn

for D in (47, 16, 8):
    dt = timeit(f"stack D={D} 64 iters (8x{L})", stack_iters(D), jnp.ones((), jnp.int32))
    print(f"   -> {dt/64*1e6:.1f} us/iter", file=sys.stderr)

# ---------- C: chunk sweep on frame-realistic rays ----------
from fovpathtracing_optixcodelatest_tpu.models import scenes
from fovpathtracing_optixcodelatest_tpu.models.scene import build_scene

meshes, cam = scenes.box_city(n=24, seed=0)
scene = build_scene(meshes)
bvh = scene.bvh
print(f"bvh rows={bvh.num_rows} depth={bvh.stack_depth}", file=sys.stderr)

M = 1 << 20
o = np.tile(np.array([0.0, 6.0, 45.0], np.float32), (M, 1))
d = np.stack([rng.uniform(-0.4, 0.4, M), rng.uniform(-0.35, 0.05, M),
              -np.ones(M)], 1).astype(np.float32)
d /= np.linalg.norm(d, axis=1, keepdims=True)
o_d, d_d = jax.device_put((o, d))

# incoherent bounce-like set: random origins in the city, random directions
ob = np.stack([rng.uniform(-40, 40, M), rng.uniform(0, 10, M),
               rng.uniform(-40, 40, M)], 1).astype(np.float32)
db = rng.normal(size=(M, 3)).astype(np.float32)
db /= np.linalg.norm(db, axis=1, keepdims=True)
ob_d, db_d = jax.device_put((ob, db))

def ch(chunk):
    def fn(bvh, o, d):
        acc = jnp.zeros((), jnp.float32)
        st = jnp.zeros((), jnp.int32)
        for i in range(2):
            out = tv.closest_hit(bvh, o + acc, d, 1e-3, 1e8, chunk=chunk)
            acc = acc + out["t"][0] * 0.0
            st = st + out["steps"]
        return acc, st
    return lambda b, o, d: fn(b, o, d)

for chunk in (1 << 13, 1 << 14, 1 << 15):
    f = jax.jit(ch(chunk))
    out = f(bvh, o_d, d_d); _ = np.asarray(out[0])
    t0 = time.perf_counter(); out = f(bvh, o_d, d_d); _ = np.asarray(out[0])
    dt = (time.perf_counter() - t0) / 2
    print(f"coherent chunk={chunk}: {dt*1e3:.1f} ms, steps={int(out[1])//2}, "
          f"{M/dt/1e6:.1f} Mrays/s", file=sys.stderr)
    f2 = jax.jit(ch(chunk))
    out = f2(bvh, ob_d, db_d); _ = np.asarray(out[0])
    t0 = time.perf_counter(); out = f2(bvh, ob_d, db_d); _ = np.asarray(out[0])
    dt = (time.perf_counter() - t0) / 2
    print(f"incoherent chunk={chunk}: {dt*1e3:.1f} ms, steps={int(out[1])//2}, "
          f"{M/dt/1e6:.1f} Mrays/s", file=sys.stderr)
