"""10M-tri scene: native BVH build time + table stats (host-only)."""
import time, sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
from fovpathtracing_optixcodelatest_tpu.models import scenes
from fovpathtracing_optixcodelatest_tpu.models.scene import build_scene
from fovpathtracing_optixcodelatest_tpu.models.probe import gradient_sky_probe

t0 = time.perf_counter()
meshes, cam = scenes.box_city_fast(n=913, seed=0)
ntri = sum(m.index.shape[0] for m in meshes)
print(f"scene gen {time.perf_counter()-t0:.1f}s, {ntri} tris", file=sys.stderr)
t0 = time.perf_counter()
scene = build_scene(meshes, probe=gradient_sky_probe())
print(f"build_scene {time.perf_counter()-t0:.1f}s; rows {scene.bvh.num_rows} "
      f"({scene.bvh.table.size*4/1e6:.0f} MB), arity {scene.bvh.arity}, "
      f"leaf {scene.bvh.leaf_size}, stack {scene.bvh.stack_depth}",
      file=sys.stderr)
