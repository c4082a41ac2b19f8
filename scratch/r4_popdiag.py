"""Does pop-sorting actually cut lockstep iterations on bench geometry?
Primary rays, closest_hit: (a) natural order, (b) sorted by measured pops,
(c) staged cap14 natural, (d) staged cap14 pop-sorted. Also prints the pop
histogram. Run: python -c "exec(open('scratch/r4_popdiag.py').read())"
"""
import dataclasses, sys, time
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/fovtpu_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from fovpathtracing_optixcodelatest_tpu.config import FoveationSchedule, RenderConfig
from fovpathtracing_optixcodelatest_tpu.models import scenes
from fovpathtracing_optixcodelatest_tpu.models.probe import gradient_sky_probe
from fovpathtracing_optixcodelatest_tpu.models.scene import build_scene
from fovpathtracing_optixcodelatest_tpu.render import raygen
from fovpathtracing_optixcodelatest_tpu.ops import traverse8

width, height = 960, 540
meshes, cam = scenes.box_city(n=24, seed=0)
scene = build_scene(meshes, probe=gradient_sky_probe())
camp = dataclasses.replace(cam, aspect=width / height).device_params()
schedule = FoveationSchedule.reference_32_16_8()
p0 = schedule.passes[0]
rays = raygen.generate_pass_rays(
    camp, p0, width, height,
    jnp.asarray(width // 2, jnp.int32), jnp.asarray(height // 2, jnp.int32),
    jax.random.PRNGKey(0), antialias=True)
o, d, act = rays["origin"], rays["direction"], rays["active"]
print(f"rays {o.shape[0]}, active {int(act.sum())}", file=sys.stderr)


@jax.jit
def get_pops(o, d, act):
    out = traverse8.closest_hit(scene.bvh, o, d, 1e-3, 1e16, active=act)
    return out["pops"], out["steps"]


pops, steps0 = get_pops(o, d, act)
pops_h = np.asarray(pops)
print(f"pops: mean {pops_h[np.asarray(act)].mean():.1f}, "
      f"p50 {np.percentile(pops_h, 50):.0f}, p90 {np.percentile(pops_h, 90):.0f}, "
      f"p99 {np.percentile(pops_h, 99):.0f}, max {pops_h.max()}",
      file=sys.stderr)


def run(tag, o2, d2, a2, staged, n=8):
    if staged:
        f = jax.jit(lambda o, d, a: (
            traverse8.closest_hit_staged(scene.bvh, o, d, 1e-3, 1e16,
                                         active=a, phase1_cap=14)["steps"]))
    else:
        f = jax.jit(lambda o, d, a: (
            traverse8.closest_hit(scene.bvh, o, d, 1e-3, 1e16,
                                  active=a)["steps"]))
    s = int(f(o2, d2, a2))
    _ = np.asarray(f(o2, d2, a2))
    best = np.inf
    for r in range(3):
        t0 = time.perf_counter()
        x = f(o2, d2, a2)
        for i in range(n - 1):
            x = f(o2, d2, a2)
        _ = np.asarray(x)
        best = min(best, (time.perf_counter() - t0) / n)
    print(f"{tag}: steps {s}, {best*1e3:.1f} ms", file=sys.stderr)


# natural order
run("plain natural  ", o, d, act, False)
run("staged natural ", o, d, act, True)
# pop-sorted order
key = jnp.where(act, 0, jnp.int32(1 << 30)) | (jnp.clip(pops, 0, 511) << 21) \
    | jnp.arange(o.shape[0], dtype=jnp.int32)
s = jax.lax.sort([key, o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2]],
                 num_keys=1)
o_s = jnp.stack(s[1:4], axis=1)
d_s = jnp.stack(s[4:7], axis=1)
a_s = s[0] < (1 << 30)
run("plain popsort  ", o_s, d_s, a_s, False)
run("staged popsort ", o_s, d_s, a_s, True)
