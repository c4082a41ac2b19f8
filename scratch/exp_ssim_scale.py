"""At-scale SSIM harness numbers for PARITY.md (run on the v5e):
1. BVH pipeline vs brute-force oracle, uniform 32 spp @ 160x90 (oracle is
   O(rays x tris) — this is the largest practical oracle frame).
2. Fovea SSIM @ 960x540: foveated 32_16_8 vs uniform 32 spp (equal spp in
   the fovea, independent RNG streams), SSIM over the r<74 gaze disc.
"""
import dataclasses, sys
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/fovtpu_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
from fovpathtracing_optixcodelatest_tpu.config import FoveationSchedule, RenderConfig
from fovpathtracing_optixcodelatest_tpu.models import scenes
from fovpathtracing_optixcodelatest_tpu.models.probe import gradient_sky_probe
from fovpathtracing_optixcodelatest_tpu.models.scene import build_scene
from fovpathtracing_optixcodelatest_tpu.render import film
from fovpathtracing_optixcodelatest_tpu.render.renderer import render_frame
from fovpathtracing_optixcodelatest_tpu.utils.metrics import ssim

meshes, cam = scenes.box_city(n=24, seed=0)
scene = build_scene(meshes, probe=gradient_sky_probe())


def render(config, schedule, seed=0):
    camp = dataclasses.replace(cam, aspect=config.width / config.height).device_params()
    pad = film.schedule_padding(schedule, config.width, config.height)
    canvas = film.new_canvas(config.width, config.height, pad)
    gx = jnp.asarray(config.width // 2, jnp.int32)
    gy = jnp.asarray(config.height // 2, jnp.int32)
    _c, frame, _s = render_frame(
        scene, camp, gx, gy, jnp.asarray(0, jnp.int32), canvas,
        jax.random.PRNGKey(seed), config, schedule)
    return np.asarray(frame).astype(np.float32) / 255.0

# 1. oracle vs pipeline @ 160x90 uniform 32
cfg_small = RenderConfig(width=160, height=90)
u32 = FoveationSchedule.uniform(32)
img_bvh = render(cfg_small, u32)
print("bvh 160x90 done", file=sys.stderr)
img_orc = render(dataclasses.replace(cfg_small, traversal="oracle"), u32)
print("oracle 160x90 done", file=sys.stderr)
s1 = ssim(img_bvh, img_orc)
d1 = float(np.abs(img_bvh - img_orc).mean())
print(f"oracle-vs-bvh uniform32 @160x90: SSIM={s1:.5f} meanAbsDiff={d1:.2e}",
      file=sys.stderr)

# 2. fovea SSIM @ 960x540
cfg = RenderConfig(width=960, height=540)
img_fov = render(cfg, FoveationSchedule.reference_32_16_8())
print("fov 960x540 done", file=sys.stderr)
img_uni = render(cfg, u32)
print("uni 960x540 done", file=sys.stderr)
h, w = 540, 960
yy, xx = np.mgrid[0:h, 0:w]
disc = (xx - w // 2) ** 2 + (yy - h // 2) ** 2 < 74**2
y0, y1 = h // 2 - 74, h // 2 + 74
x0, x1 = w // 2 - 74, w // 2 + 74
s2 = ssim(img_fov[y0:y1, x0:x1], img_uni[y0:y1, x0:x1])
d2 = float(np.abs(img_fov - img_uni)[disc].mean())
print(f"fovea SSIM @960x540 (fov 32_16_8 vs uniform 32, equal-spp fovea): "
      f"SSIM={s2:.4f} meanAbsDiff={d2:.3e}", file=sys.stderr)
