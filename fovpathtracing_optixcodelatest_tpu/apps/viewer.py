"""Interactive web viewer: live gaze-contingent rendering in a browser.

The reference is an interactive GLFW application — cursor position is the
gaze point (main.cpp:352-368), mouse drag orbits the trackball camera
(main.cpp:56-130), and the render/display/stats loop runs per frame
(main.cpp:347-481) with the frame blitted by GLDisplay. A TPU host has no
GL stack or window system, so the display path is a built-in HTTP server:

- ``/``        an HTML canvas page; JS forwards cursor moves (gaze), drags
               (orbit), and wheel (zoom) back to the host.
- ``/stream``  MJPEG (multipart/x-mixed-replace) of the progressive frames —
               the GLDisplay-equivalent blit, one JPEG per rendered frame.
- ``/input``   input events, applied to the render loop's shared state.
- ``/stats``   the ImGui overlay twin (sutil::displayStats, sutil.cpp:763-
               801) as JSON: fps, per-phase ms, gaze, subframe index.

The render loop (serve()) runs in the main thread exactly like the
reference's: state update (gaze/camera), render, display (JPEG encode),
accumulation reset on camera change (main.cpp:402-407 via
Renderer.set_camera).

Run: python -m fovpathtracing_optixcodelatest_tpu.apps.main --viewer
     [--viewer-port 8000] --scene cornell --width 240 --height 136
"""

from __future__ import annotations

import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

_PAGE = """<!DOCTYPE html>
<html><head><title>fovPathTracing TPU viewer</title><style>
 body { background:#111; color:#ddd; font-family:monospace; margin:1em }
 #view { image-rendering:pixelated; cursor:crosshair; border:1px solid #444 }
 #stats { margin-top:0.5em; white-space:pre }
</style></head><body>
<div>gaze follows the cursor &middot; drag = orbit &middot; wheel = zoom &middot;
 keys: <b>1</b> color <b>2</b> normal <b>3</b> albedo <b>4</b> denoised
 &middot; <b>s</b> cycle schedule</div>
<img id="view" src="/stream">
<div id="stats"></div>
<script>
const img = document.getElementById('view');
let drag = false, lx = 0, ly = 0, scale = () => img.width / %WIDTH%;
function send(q) { fetch('/input?' + q).catch(() => {}); }
img.onmousemove = (e) => {
  const r = img.getBoundingClientRect();
  const x = Math.round((e.clientX - r.left) / scale());
  const y = Math.round((e.clientY - r.top) / scale());
  if (drag) { send(`dx=${e.clientX - lx}&dy=${e.clientY - ly}`); }
  else { send(`gx=${x}&gy=${y}`); }
  lx = e.clientX; ly = e.clientY;
};
img.onmousedown = (e) => { drag = true; lx = e.clientX; ly = e.clientY;
                           e.preventDefault(); };
window.onmouseup = () => { drag = false; };
img.onwheel = (e) => { send('zoom=' + (e.deltaY > 0 ? 1 : -1));
                       e.preventDefault(); };
img.ondragstart = () => false;
window.onkeydown = (e) => {
  const views = {'1':'color','2':'normal','3':'albedo','4':'denoised'};
  if (views[e.key]) send('view=' + views[e.key]);
  if (e.key === 's') send('sched=next');
};
setInterval(async () => {
  try { const s = await (await fetch('/stats')).json();
        document.getElementById('stats').textContent =
          `fps: ${s.fps.toFixed(2)}  render: ${s.render_ms.toFixed(0)} ms  ` +
          `gaze: ${s.gaze[0]},${s.gaze[1]}  subframe: ${s.subframe}`;
  } catch (e) {}
}, 500);
</script></body></html>"""


class ViewerState:
    """Input/output shared between the HTTP threads and the render loop."""

    def __init__(self, width: int, height: int):
        self.lock = threading.Lock()
        self.gaze = (width // 2, height // 2)
        self.orbit_dx = 0.0
        self.orbit_dy = 0.0
        self.zoom_ticks = 0
        self.frame_jpeg: bytes | None = None
        self.frame_event = threading.Event()
        self.stats = {"fps": 0.0, "render_ms": 0.0, "gaze": self.gaze,
                      "subframe": 0}
        self.view = "color"  # color | normal | albedo | denoised
        self.sched_ticks = 0  # 'cycle schedule' requests (coalesced)
        self.running = True
        self.width = width
        self.height = height

    def take_input(self):
        with self.lock:
            dx, dy, z = self.orbit_dx, self.orbit_dy, self.zoom_ticks
            st = self.sched_ticks
            self.orbit_dx = self.orbit_dy = 0.0
            self.zoom_ticks = 0
            self.sched_ticks = 0
            return self.gaze, dx, dy, z, self.view, st

    def put_frame(self, rgb_u8: np.ndarray):
        from PIL import Image

        buf = io.BytesIO()
        Image.fromarray(rgb_u8).save(buf, "JPEG", quality=88)
        with self.lock:
            self.frame_jpeg = buf.getvalue()
        self.frame_event.set()
        self.frame_event.clear()


def _make_handler(state: ViewerState):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # silent server
            pass

        def do_GET(self):  # noqa: N802 (stdlib API)
            url = urlparse(self.path)
            if url.path == "/":
                body = _PAGE.replace("%WIDTH%", str(state.width)).encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif url.path == "/input":
                q = parse_qs(url.query)
                with state.lock:
                    if "gx" in q and "gy" in q:
                        gx = max(0, min(state.width - 1, int(q["gx"][0])))
                        gy = max(0, min(state.height - 1, int(q["gy"][0])))
                        # browser y is top-down; film is bottom-up (V-up)
                        state.gaze = (gx, state.height - 1 - gy)
                    if "dx" in q:
                        state.orbit_dx += float(q["dx"][0])
                    if "dy" in q:
                        state.orbit_dy += float(q["dy"][0])
                    if "zoom" in q:
                        state.zoom_ticks += int(q["zoom"][0])
                    if "view" in q and q["view"][0] in (
                        "color", "normal", "albedo", "denoised"
                    ):
                        state.view = q["view"][0]
                    if "sched" in q:
                        state.sched_ticks += 1
                self.send_response(204)
                self.end_headers()
            elif url.path == "/stats":
                with state.lock:
                    body = json.dumps(state.stats).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif url.path == "/stream":
                self.send_response(200)
                self.send_header(
                    "Content-Type",
                    "multipart/x-mixed-replace; boundary=frame",
                )
                self.end_headers()
                try:
                    while state.running:
                        state.frame_event.wait(timeout=2.0)
                        with state.lock:
                            jpeg = state.frame_jpeg
                        if jpeg is None:
                            continue
                        self.wfile.write(b"--frame\r\n")
                        self.wfile.write(b"Content-Type: image/jpeg\r\n")
                        self.wfile.write(
                            f"Content-Length: {len(jpeg)}\r\n\r\n".encode()
                        )
                        self.wfile.write(jpeg)
                        self.wfile.write(b"\r\n")
                except (BrokenPipeError, ConnectionResetError):
                    pass
            else:
                self.send_response(404)
                self.end_headers()

    return Handler


def _view_frame(view: str, aovs, config) -> np.ndarray:
    """Map an AOV dict to a displayable (H, W, 3) uint8 image.

    normal: [-1,1] -> [0,1]; albedo: clamp; denoised: cross-bilateral
    a-trous over the accumulated radiance with normal/albedo guides (the
    OptixDenoiser slot, ops/denoise.py) followed by the standard tone map.
    """
    if view == "normal":
        img = np.asarray(aovs["normal"]) * 0.5 + 0.5
        return (np.clip(img, 0.0, 1.0) * 255).astype(np.uint8)
    if view == "albedo":
        img = np.asarray(aovs["albedo"])
        return (np.clip(img, 0.0, 1.0) * 255).astype(np.uint8)
    from fovpathtracing_optixcodelatest_tpu.ops import tonemap
    from fovpathtracing_optixcodelatest_tpu.ops.denoise import atrous_denoise

    clean = atrous_denoise(aovs["accum"], aovs["normal"], aovs["albedo"])
    u8 = tonemap.postprocess(
        clean, exposure_stops=config.exposure_stops, white=config.white,
        exposure_on=config.exposure_correction, tonemap_on=config.tone_mapping,
    )
    return np.asarray(u8)


def _warmup_renderer(renderer, scale: int):
    """Quarter-res (1/scale) clone sharing the scene — first frames while the
    full-res executable compiles. The schedule shrinks via
    FoveationSchedule.scaled (ring radii are resolution-absolute)."""
    import dataclasses
    import math

    from fovpathtracing_optixcodelatest_tpu.render.renderer import Renderer

    # low-res dims round UP to a multiple of the coarsest pass stride — a
    # stride-4 pass launches floor(H/4) rows, so a non-multiple height leaves
    # unwritten bottom rows (true of the reference at such sizes too)
    f = max(p.factor for p in renderer.schedule.passes)
    cfg = dataclasses.replace(
        renderer.config,
        width=max(32, math.ceil(renderer.config.width / scale / f) * f),
        height=max(32, math.ceil(renderer.config.height / scale / f) * f),
    )
    low = Renderer(
        scene=renderer.scene, config=cfg,
        schedule=renderer.schedule.scaled(scale),
    )
    low.camera_params = renderer.camera_params
    return low


def serve(renderer, trackball, port: int = 8000, max_frames: int | None = None,
          host: str = "127.0.0.1", progressive: bool = False,
          warmup_scale: int = 4, stop_event: threading.Event | None = None,
          on_swap=None, schedules=None):
    """The interactive render loop (main.cpp:347-481 twin). Blocks; renders
    continuously, gaze from the cursor, orbit/zoom from drags. ``max_frames``
    bounds the loop for tests. Binds loopback by default — the stream and the
    gaze/orbit control endpoints are unauthenticated; pass host="0.0.0.0"
    explicitly (--viewer-host) to expose them.

    ``progressive=True``: XLA compiles the full-res frame executable once per
    (resolution, schedule) — ~85 s warm-cache / minutes cold on the v5e — so
    the first full frame is minutes away. Progressive startup renders
    1/``warmup_scale``-res frames (their own much smaller compile) and
    upscales them to the canvas while a background thread runs the first
    full-res render; when it lands, the loop swaps over seamlessly."""
    # 's' cycles through [the renderer's own schedule] + any extra
    # (name, FoveationSchedule) pairs; each new one jit-compiles on first
    # use (the persistent cache absorbs repeats across runs)
    sched_names = ["initial"] + [n for n, _ in (schedules or [])]
    schedules = [renderer.schedule] + [s for _, s in (schedules or [])]
    sched_i = 0
    state = ViewerState(renderer.config.width, renderer.config.height)
    server = ThreadingHTTPServer((host, port), _make_handler(state))
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    print(f"viewer: http://{host}:{port}/  (ctrl-c to stop)")

    active = renderer
    scale = 1
    full_ready = threading.Event()
    if progressive and min(renderer.config.width, renderer.config.height) >= (
        32 * warmup_scale
    ):
        active = _warmup_renderer(renderer, warmup_scale)
        scale = warmup_scale

        def _compile_full():
            # one throwaway full-res render = the XLA compile + first frame;
            # device work interleaves with the low-res frames' dispatches
            try:
                renderer.render()
            finally:
                full_ready.set()

        threading.Thread(target=_compile_full, daemon=True).start()
    else:
        full_ready.set()

    frames = 0
    t_fps = time.perf_counter()
    try:
        while state.running and (max_frames is None or frames < max_frames):
            if stop_event is not None and stop_event.is_set():
                break
            if scale > 1 and full_ready.is_set():
                renderer.camera_params = active.camera_params
                renderer.subframe = 0  # fresh accumulation at full res
                active, scale = renderer, 1
                if on_swap is not None:
                    on_swap()
            gaze, dx, dy, zoom, view, sched_ticks = state.take_input()
            if sched_ticks and len(schedules) > 1:
                if scale > 1 or not full_ready.is_set():
                    # deferred during warmup: the background thread may be
                    # inside renderer.render() — set_schedule would race on
                    # canvas/_pad (and the warmup dims were rounded for the
                    # INITIAL schedule's stride only)
                    with state.lock:
                        state.sched_ticks += sched_ticks
                else:
                    sched_i = (sched_i + sched_ticks) % len(schedules)
                    renderer.set_schedule(schedules[sched_i])
                    print(f"viewer: schedule -> {sched_names[sched_i]}")
            if dx or dy:
                active.set_camera(trackball.orbit(dx, dy))
            for _ in range(abs(zoom)):
                active.set_camera(trackball.zoom(1 if zoom > 0 else -1))
            t0 = time.perf_counter()
            g = (gaze[0] // scale, gaze[1] // scale) if scale > 1 else gaze
            if view == "color":
                frame = active.render(gaze=g)
            else:  # AOV views (the denoiser guide layers + a-trous output)
                frame, aovs = active.render_aov(gaze=g)
                frame = _view_frame(view, aovs, active.config)
            if getattr(active, "demand_loader", None) is not None:
                active.process_demand_requests()
            render_ms = (time.perf_counter() - t0) * 1e3
            if scale > 1:  # nearest-neighbor upscale to the display canvas
                frame = np.repeat(np.repeat(frame, scale, 0), scale, 1)
                py = max(0, state.height - frame.shape[0])
                px = max(0, state.width - frame.shape[1])
                if py or px:
                    frame = np.pad(frame, ((0, py), (0, px), (0, 0)), "edge")
                frame = frame[: state.height, : state.width]
            state.put_frame(frame[::-1])  # V-up film -> display orientation
            frames += 1
            dt = time.perf_counter() - t_fps
            with state.lock:
                state.stats = {
                    "fps": frames / dt if dt > 0 else 0.0,
                    "render_ms": render_ms,
                    "gaze": list(gaze),
                    "subframe": active.subframe,
                    "warmup": scale > 1,
                    "view": view,
                    "schedule": sched_names[sched_i],
                }
    except KeyboardInterrupt:
        pass
    finally:
        state.running = False
        server.shutdown()
    return frames
