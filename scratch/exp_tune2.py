"""Fine tuning sweep: drains (stale-pop drain count) x phase1_cap on the
staged traversal, raw incoherent rays. drains is monkeypatched by rebinding
_pop_fresh's default through a wrapper."""
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

orig_pop_fresh = tv._pop_fresh


def run(tag, fn):
    def g(b, o, d):
        acc = jnp.zeros((), jnp.float32); st = jnp.zeros((), jnp.int32)
        for i in range(2):
            out = fn(b, o + acc, d)
            acc = acc + out["t"][0] * 0.0
            st = st + out["steps"]
        return acc, st
    f = jax.jit(g)
    out = f(bvh, o_d, d_d); _ = np.asarray(out[0])
    t0 = time.perf_counter(); out = f(bvh, o_d, d_d); _ = np.asarray(out[0])
    dt = (time.perf_counter() - t0) / 2
    print(f"{tag}: {dt*1e3:.1f} ms, steps={int(out[1])//2}, "
          f"{M/dt/1e6:.1f} Mrays/s", file=sys.stderr)


for dr in (1, 2, 3, 4):
    tv._pop_fresh = lambda s, t, p, tl, drains, _d=dr: orig_pop_fresh(
        s, t, p, tl, _d
    )
    run(f"drains={dr} cap=12",
        lambda b, o, d: tv.closest_hit_staged(b, o, d, 1e-3, 1e8))
tv._pop_fresh = orig_pop_fresh

for cap in (10, 11, 13):
    run(f"drains=2 cap={cap}",
        lambda b, o, d, c=cap: tv.closest_hit_staged(
            b, o, d, 1e-3, 1e8, phase1_cap=c))
