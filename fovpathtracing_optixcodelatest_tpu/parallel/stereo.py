"""Stereo (XR) rendering: per-eye cameras over a shared scene.

Twin of 11HelloRaytracingOpenXR's per-view loop (OptiXRenderer.h:47-94,
main.cpp:874-955): each eye gets its own pose/projection and re-renders the
shared scene. TPU-native shape: the two eyes are one batched render — their
camera parameter pytrees stack on a leading eye axis and vmap runs both in a
single compiled program (the scene is closed over once, not duplicated).

``eye_cameras_from_pose`` builds the per-eye cameras from a head pose + IPD,
standing in for xrLocateViews' per-eye poses; asymmetric-FOV projections from
XrFovf-style half-angles are supported via ``camera_from_fov_angles``.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fovpathtracing_optixcodelatest_tpu.config import FoveationSchedule, RenderConfig
from fovpathtracing_optixcodelatest_tpu.models.camera import Camera, CameraParams
from fovpathtracing_optixcodelatest_tpu.models.scene import Scene
from fovpathtracing_optixcodelatest_tpu.render import film
from fovpathtracing_optixcodelatest_tpu.render.renderer import render_frame


def eye_cameras_from_pose(
    position, forward, up=(0.0, 1.0, 0.0), ipd: float = 0.064,
    fov_y: float = 90.0, aspect: float = 1.0, focus_distance: float = 10.0,
) -> Tuple[Camera, Camera]:
    """Left/right eye cameras: eyes offset ±ipd/2 along the view-right axis,
    converged at focus_distance (the XR sample re-aims per eye,
    OptiXRenderer.h:59-61)."""
    p = np.asarray(position, dtype=np.float64)
    f = np.asarray(forward, dtype=np.float64)
    f = f / np.linalg.norm(f)
    u = np.asarray(up, dtype=np.float64)
    right = np.cross(f, u)
    right /= np.linalg.norm(right)
    target = p + f * focus_distance
    eyes = []
    for sign in (-1.0, +1.0):
        eye = p + sign * 0.5 * ipd * right
        eyes.append(
            Camera(eye=tuple(eye), lookat=tuple(target), up=tuple(u),
                   fov_y=fov_y, aspect=aspect)
        )
    return eyes[0], eyes[1]


def camera_from_fov_angles(
    eye, forward, up, angle_left: float, angle_right: float,
    angle_up: float, angle_down: float,
) -> CameraParams:
    """Asymmetric-frustum camera from XrFovf-style half angles (radians),
    the projection path of the XR sample (11.../main.cpp:63+). The UVW frame
    is sheared so NDC ±1 maps to the asymmetric tangents."""
    f = np.asarray(forward, dtype=np.float64)
    f /= np.linalg.norm(f)
    u_axis = np.cross(f, np.asarray(up, dtype=np.float64))
    u_axis /= np.linalg.norm(u_axis)
    v_axis = np.cross(u_axis, f)
    tl, tr = math.tan(angle_left), math.tan(angle_right)
    tu, td = math.tan(angle_up), math.tan(angle_down)
    half_x = 0.5 * (tr - tl)
    half_y = 0.5 * (tu - td)
    center_x = 0.5 * (tr + tl)
    center_y = 0.5 * (tu + td)
    w = f + center_x * u_axis + center_y * v_axis
    return CameraParams(
        eye=jnp.asarray(eye, dtype=jnp.float32),
        u=jnp.asarray(half_x * u_axis, dtype=jnp.float32),
        v=jnp.asarray(half_y * v_axis, dtype=jnp.float32),
        w=jnp.asarray(w, dtype=jnp.float32),
    )


@dataclasses.dataclass
class StereoRenderer:
    """Two-eye foveated renderer with independent accumulation per eye."""

    scene: Scene
    config: RenderConfig
    schedule: FoveationSchedule

    def __post_init__(self):
        self._pad = film.schedule_padding(
            self.schedule, self.config.width, self.config.height
        )
        canvas = film.new_canvas(self.config.width, self.config.height, self._pad)
        self.canvases = jnp.stack([canvas, canvas])
        self.subframe = 0
        self._key = jax.random.PRNGKey(0)

        cfg, sched = self.config, self.schedule

        @jax.jit
        def _stereo_step(scene, cams_stacked, gx, gy, subframe, canvases, keys):
            def one_eye(cam, canvas, key):
                return render_frame(
                    scene, cam, gx, gy, subframe, canvas, key, cfg, sched
                )

            return jax.vmap(one_eye)(cams_stacked, canvases, keys)

        self._step = _stereo_step

    def render(
        self,
        left: Camera,
        right: Camera,
        gaze: Optional[Tuple[int, int]] = None,
    ) -> np.ndarray:
        """Render both eyes; returns (2, H, W, 3) uint8."""
        w, h = self.config.width, self.config.height
        if gaze is None:
            gaze = (w // 2, h // 2)
        cams = jax.tree_util.tree_map(
            lambda a, b: jnp.stack([a, b]),
            left.device_params(), right.device_params(),
        )
        keys = jnp.stack(
            [
                jax.random.fold_in(jax.random.fold_in(self._key, self.subframe), e)
                for e in range(2)
            ]
        )
        self.canvases, frames, _stats = self._step(
            self.scene, cams,
            jnp.asarray(gaze[0], jnp.int32), jnp.asarray(gaze[1], jnp.int32),
            jnp.asarray(self.subframe, jnp.int32), self.canvases, keys,
        )
        self.subframe += 1
        return np.asarray(frames)
