"""Checkpoint / resume for progressive renders.

The reference's only persistent state is the progressive accumulation buffer +
subframe index (SURVEY.md §5.4: accum_buffer, SimplePathtracer.cpp:243,255;
subframe gating deviceProgram.cu:565-581) — which therefore IS the natural
checkpoint. Saving (canvas, subframe, camera, gaze) lets a long accumulation
resume exactly: the renderer is purely functional in that state.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

from fovpathtracing_optixcodelatest_tpu.models.camera import Camera


def save_checkpoint(path: str, canvas, subframe: int,
                    camera: Optional[Camera] = None,
                    gaze: Optional[Tuple[int, int]] = None) -> None:
    data = {
        "canvas": np.asarray(canvas),
        "subframe": np.asarray(subframe, dtype=np.int64),
    }
    if camera is not None:
        data["camera"] = np.asarray(
            [*camera.eye, *camera.lookat, *camera.up, camera.fov_y,
             camera.aspect],
            dtype=np.float64,
        )
    if gaze is not None:
        data["gaze"] = np.asarray(gaze, dtype=np.int64)
    np.savez_compressed(path, **data)


def load_checkpoint(path: str):
    """Returns dict(canvas, subframe[, camera, gaze])."""
    z = np.load(path)
    out = {
        "canvas": z["canvas"],
        "subframe": int(z["subframe"]),
    }
    if "camera" in z:
        c = z["camera"]
        out["camera"] = Camera(
            eye=tuple(c[0:3]), lookat=tuple(c[3:6]), up=tuple(c[6:9]),
            fov_y=float(c[9]), aspect=float(c[10]),
        )
    if "gaze" in z:
        out["gaze"] = tuple(int(x) for x in z["gaze"])
    return out


def resume_renderer(renderer, path: str) -> None:
    """Restore a Renderer's progressive state in place."""
    import jax.numpy as jnp

    ckpt = load_checkpoint(path)
    canvas = jnp.asarray(ckpt["canvas"])
    if canvas.shape != renderer.canvas.shape:
        raise ValueError(
            f"checkpoint canvas {canvas.shape} != renderer {renderer.canvas.shape}"
        )
    renderer.canvas = canvas
    renderer.subframe = ckpt["subframe"]
    if "camera" in ckpt:
        cam = ckpt["camera"]
        renderer.camera_params = cam.device_params()


def checkpoint_renderer(renderer, path: str,
                        camera: Optional[Camera] = None,
                        gaze: Optional[Tuple[int, int]] = None) -> None:
    save_checkpoint(path, renderer.canvas, renderer.subframe, camera, gaze)


@dataclasses.dataclass
class AutoCheckpointer:
    """Every-N-frames checkpointing policy for long progressive renders."""

    path: str
    every: int = 32

    def maybe(self, renderer) -> bool:
        if renderer.subframe > 0 and renderer.subframe % self.every == 0:
            checkpoint_renderer(renderer, self.path)
            return True
        return False
