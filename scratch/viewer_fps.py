"""Measure interactive viewer fps at 480x270 on the real chip (VERDICT r2
item 6: target >=5 fps; the reference's UX anchor is 30.9 fps at 960x540 on
its GPU). Runs serve() with a deadline thread polling /stats.
"""
import json
import sys
import threading
import time
import urllib.request

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/fovtpu_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import dataclasses

from fovpathtracing_optixcodelatest_tpu.apps import viewer as viewer_mod
from fovpathtracing_optixcodelatest_tpu.config import (
    FoveationSchedule, RenderConfig,
)
from fovpathtracing_optixcodelatest_tpu.models import scenes
from fovpathtracing_optixcodelatest_tpu.models.camera import Trackball
from fovpathtracing_optixcodelatest_tpu.models.probe import gradient_sky_probe
from fovpathtracing_optixcodelatest_tpu.models.scene import build_scene
from fovpathtracing_optixcodelatest_tpu.render.renderer import Renderer

W, H = 480, 272  # multiple of 4 (stride-4 periphery launch)
meshes, cam = scenes.box_city(n=24, seed=0)
scene = build_scene(meshes, probe=gradient_sky_probe())
config = RenderConfig(width=W, height=H)
schedule = FoveationSchedule.reference_32_16_8().scaled(2)
cam = dataclasses.replace(cam, aspect=W / H)
r = Renderer(scene=scene, config=config, schedule=schedule)
r.set_camera(cam)
tb = Trackball(camera=cam)
tb.reinitialize_from_camera()

stop = threading.Event()
PORT = 8799
samples = []


def poll():
    t_end = time.time() + 420
    while time.time() < t_end:
        try:
            s = json.loads(urllib.request.urlopen(
                f"http://127.0.0.1:{PORT}/stats", timeout=10).read())
            samples.append(s)
            print(f"stats: {s}", file=sys.stderr)
        except OSError:
            pass
        time.sleep(5)
    stop.set()


threading.Thread(target=poll, daemon=True).start()
frames = viewer_mod.serve(r, tb, port=PORT, stop_event=stop,
                          progressive=True, warmup_scale=2)
full = [s for s in samples if not s.get("warmup", True)]
if full:
    # rolling fps includes the warmup window; steady-state = median of the
    # last few per-frame render_ms readings instead
    tail = full[-5:]
    ms = sorted(x["render_ms"] for x in tail)[len(tail) // 2]
    print(f"steady-state render_ms={ms:.0f} -> {1000.0/ms:.2f} fps "
          f"({frames} frames total)", file=sys.stderr)
else:
    print("never reached full-res", file=sys.stderr)
