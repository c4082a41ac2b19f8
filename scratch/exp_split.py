"""One-jit frame vs per-pass jits."""
import dataclasses, sys, time, functools
import numpy as np
import jax, jax.numpy as jnp
from fovpathtracing_optixcodelatest_tpu.config import FoveationSchedule, RenderConfig
from fovpathtracing_optixcodelatest_tpu.models import scenes
from fovpathtracing_optixcodelatest_tpu.models.probe import gradient_sky_probe
from fovpathtracing_optixcodelatest_tpu.models.scene import build_scene
from fovpathtracing_optixcodelatest_tpu.render import film, raygen
from fovpathtracing_optixcodelatest_tpu.render.renderer import render_frame, render_pass_partial, pass_backplate

width, height = 960, 540
meshes, cam = scenes.box_city(n=24, seed=0)
scene = build_scene(meshes, probe=gradient_sky_probe())
config = RenderConfig(width=width, height=height)
schedule = FoveationSchedule.reference_32_16_8()
camp = dataclasses.replace(cam, aspect=width / height).device_params()
pad = film.schedule_padding(schedule, width, height)
gx = jnp.asarray(width // 2, jnp.int32); gy = jnp.asarray(height // 2, jnp.int32)
key = jax.random.PRNGKey(0)

@functools.partial(jax.jit, static_argnames=("pi",))
def pass_jit(scene, camera, gaze_x, gaze_y, subframe, canvas, key, pi):
    p = schedule.passes[pi]
    pass_key = jax.random.fold_in(key, pi)
    rad_sum, alpha_sum, rays, traces, _a = render_pass_partial(
        scene, camera, p, width, height, gaze_x, gaze_y, pass_key, config)
    backplate = pass_backplate(scene, camera, rays, width, height, p, gaze_x, gaze_y)
    accum_color = film.shade_to_accum_color(rad_sum, alpha_sum, backplate, p.spp, rays["launch"])
    canvas = film.composite_pass(canvas, accum_color, rays["ring"], p, rays["offset"], subframe, pad, config.accumulate)
    return canvas, traces

@jax.jit
def fin(canvas):
    return film.finalize(canvas, pad, config)

def frame_split(canvas, subframe, key):
    tot = jnp.zeros((), jnp.int32)
    for pi in range(len(schedule.passes)):
        canvas, traces = pass_jit(scene, camp, gx, gy, subframe, canvas, key, pi)
        tot = tot + traces
    return canvas, fin(canvas), tot

canvas = film.new_canvas(width, height, pad)
c2, frame, tot = frame_split(canvas, jnp.asarray(0, jnp.int32), key)
_ = np.asarray(frame)
ts = []
for i in (1, 2, 3):
    t0 = time.perf_counter()
    c2, frame, tot = frame_split(canvas, jnp.asarray(i, jnp.int32), jax.random.fold_in(key, i))
    _ = np.asarray(frame)
    ts.append(time.perf_counter()-t0)
print(f"split-jit frame: {min(ts):.2f}s  traces={int(tot)}  {int(tot)/min(ts)/1e6:.1f} Mrays/s", file=sys.stderr)

# also the one-jit frame for comparison in the same process
canvas = film.new_canvas(width, height, pad)
c2, frame, stats = render_frame(scene, camp, gx, gy, jnp.asarray(0, jnp.int32), canvas, key, config, schedule)
_ = np.asarray(frame)
ts = []
for i in (1, 2):
    t0 = time.perf_counter()
    c2, frame, stats = render_frame(scene, camp, gx, gy, jnp.asarray(i, jnp.int32), canvas, key, config, schedule)
    _ = np.asarray(frame)
    ts.append(time.perf_counter()-t0)
print(f"one-jit frame:  {min(ts):.2f}s  {int(stats['traces'])/min(ts)/1e6:.1f} Mrays/s", file=sys.stderr)

# per-pass timing
canvas = film.new_canvas(width, height, pad)
for pi in range(len(schedule.passes)):
    c2, traces = pass_jit(scene, camp, gx, gy, jnp.asarray(1, jnp.int32), canvas, key, pi)
    _ = np.asarray(traces)
    ts = []
    for i in (1,2):
        t0 = time.perf_counter()
        c2, traces = pass_jit(scene, camp, gx, gy, jnp.asarray(i, jnp.int32), canvas, jax.random.fold_in(key,i), pi)
        _ = np.asarray(traces)
        ts.append(time.perf_counter()-t0)
    print(f"pass {pi}: {min(ts)*1e3:6.0f} ms  traces={int(traces)}", file=sys.stderr)
t0 = time.perf_counter(); f = fin(c2); _ = np.asarray(f); print(f"finalize: {(time.perf_counter()-t0)*1e3:.0f} ms", file=sys.stderr)
