"""Ceiling test for t-seeded closest-hit culling: seed with the TRUE closest
t (perfect oracle seed) and measure the step/time reduction. If pops don't
crater, the seeded-prepass design is dead; if they do, build a cheap
first-hit prepass."""
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
# incoherent bounce-like rays
ob = np.stack([rng.uniform(-40, 40, M), rng.uniform(0, 10, M),
               rng.uniform(-40, 40, M)], 1).astype(np.float32)
db = rng.normal(size=(M, 3)).astype(np.float32)
db /= np.linalg.norm(db, axis=1, keepdims=True)
o_d, d_d = jax.device_put((ob, db))

# true t (the perfect seed)
f0 = jax.jit(lambda b, o, d: tv.closest_hit(b, o, d, 1e-3, 1e8))
out0 = f0(bvh, o_d, d_d)
t_true = out0["t"]
_ = np.asarray(t_true[:4])
print("baseline steps (cold):", int(out0["steps"]), file=sys.stderr)


def run(tag, fn, *args):
    f = jax.jit(fn)
    out = f(*args); _ = np.asarray(out[0])
    t0 = time.perf_counter(); out = f(*args); _ = np.asarray(out[0])
    dt = (time.perf_counter() - t0) / 2
    print(f"{tag}: {dt*1e3:.1f} ms, steps={int(out[1])//2}, "
          f"{M/dt/1e6:.1f} Mrays/s", file=sys.stderr)


def base(b, o, d):
    acc = jnp.zeros((), jnp.float32); st = jnp.zeros((), jnp.int32)
    for i in range(2):
        out = tv.closest_hit(b, o + acc, d, 1e-3, 1e8)
        acc = acc + out["t"][0] * 0.0
        st = st + out["steps"]
    return acc, st


def seeded(b, o, d, ts):
    acc = jnp.zeros((), jnp.float32); st = jnp.zeros((), jnp.int32)
    for i in range(2):
        out = tv.closest_hit(b, o + acc, d, 1e-3, 1e8,
                             t_seed=ts * (1.0 + 1e-4) + acc)
        acc = acc + out["t"][0] * 0.0
        st = st + out["steps"]
    return acc, st


run("baseline ", base, bvh, o_d, d_d)
run("oracle-seeded", seeded, bvh, o_d, d_d, t_true)
