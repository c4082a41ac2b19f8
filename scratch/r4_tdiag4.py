"""Device-honest treelet component timing: every jit reduces to ONE scalar
(no fat host fetches). Times: whole treelet rounds=2/3, fallback-alone at
7%/17% scattered actives, one windowed round alone."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/fovtpu_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
from fovpathtracing_optixcodelatest_tpu.models import scenes
from fovpathtracing_optixcodelatest_tpu.models.scene import build_scene
from fovpathtracing_optixcodelatest_tpu.ops import traverse8 as tv

meshes, cam = scenes.box_city_fast(n=400, seed=0)
scene = build_scene(meshes)
bvh = scene.bvh
print(f"rows={bvh.num_rows} top={bvh.top_rows}", file=sys.stderr)
M = 1 << 20
rng = np.random.default_rng(0)
eye = np.array([-48.0, 18.0, 48.0], np.float32)
gx, gy = np.meshgrid(np.linspace(-0.5, 0.5, 1024),
                     np.linspace(-0.3, 0.3, 1024))
fwd = -eye / np.linalg.norm(eye)
right = np.cross(fwd, [0, 1, 0]); right /= np.linalg.norm(right)
up = np.cross(right, fwd)
dirs = (fwd[None, :] + gx.ravel()[:, None] * right[None, :]
        + gy.ravel()[:, None] * up[None, :]).astype(np.float32)
dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
o_d, d_d = jax.device_put(
    (np.broadcast_to(eye, (M, 3)).astype(np.float32), dirs))


def timeit(tag, fn, *args):
    f = jax.jit(fn)
    out = f(*args); _ = np.asarray(out)
    best = np.inf
    for _r in range(2):
        t0 = time.perf_counter()
        out = f(*args); _ = np.asarray(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{tag}: {best*1e3:7.1f} ms  {M/best/1e6:6.2f} Mrays/s",
          file=sys.stderr)


timeit("plain      ",
       lambda o, d: jnp.sum(tv.closest_hit(bvh, o, d, 1e-3, 1e8)["t"]
                            * 0 + 1), o_d, d_d)
for r in (2, 3):
    timeit(f"treelet r={r}",
           lambda o, d, r=r: jnp.sum(
               tv.closest_hit_treelet(bvh, o, d, 1e-3, 1e8, rounds=r)["t"]
               * 0 + 1), o_d, d_d)

# fallback-alone: scattered actives with a realistic t seed
t_seed = np.asarray(jax.jit(
    lambda o, d: tv.closest_hit(bvh, o, d, 1e-3, 1e8)["t"])(o_d, d_d))
t_seed_d = jax.device_put(t_seed * (1.0 + 1e-6))
for frac in (0.07, 0.17):
    mask = jax.device_put(rng.random(M) < frac)
    timeit(f"fallback {frac:.2f}",
           lambda o, d, m=mask: jnp.sum(
               tv.closest_hit(bvh, o, d, 1e-3, 1e8, active=m,
                              t_seed=t_seed_d)["t"] * 0 + 1), o_d, d_d)
