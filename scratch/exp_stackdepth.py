"""Is closest_hit cost dominated by stack depth D? Measure D=47/24/12 by
clamping bvh.stack_depth (may drop pushes at overflow — perf probe only,
verify steps to see if traversal degenerates)."""
import dataclasses, sys, time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/fovtpu_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
from fovpathtracing_optixcodelatest_tpu.models import scenes
from fovpathtracing_optixcodelatest_tpu.models.scene import build_scene
from fovpathtracing_optixcodelatest_tpu.ops import traverse8 as tv

meshes, cam = scenes.box_city(n=24, seed=0)
scene = build_scene(meshes)
rng = np.random.default_rng(0)
M = 1 << 20
ob = np.stack([rng.uniform(-40, 40, M), rng.uniform(0, 10, M),
               rng.uniform(-40, 40, M)], 1).astype(np.float32)
db = rng.normal(size=(M, 3)).astype(np.float32)
db /= np.linalg.norm(db, axis=1, keepdims=True)
o_d, d_d = jax.device_put((ob, db))

for D in (47, 24, 12):
    bvh = dataclasses.replace(scene.bvh, stack_depth=D)
    def fn(bvh, o, d):
        acc = jnp.zeros((), jnp.float32)
        st = jnp.zeros((), jnp.int32)
        for i in range(2):
            out = tv.closest_hit(bvh, o + acc, d, 1e-3, 1e8)
            acc = acc + out["t"][0] * 0.0
            st = st + out["steps"]
        return acc, st
    f = jax.jit(fn)
    out = f(bvh, o_d, d_d); _ = np.asarray(out[0])
    t0 = time.perf_counter(); out = f(bvh, o_d, d_d); _ = np.asarray(out[0])
    dt = (time.perf_counter() - t0) / 2
    print(f"D={D}: {dt*1e3:.1f} ms, steps={int(out[1])//2}, "
          f"{M/dt/1e6:.1f} Mrays/s", file=sys.stderr)
