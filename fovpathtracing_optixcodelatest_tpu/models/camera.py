"""Pinhole camera with the reference's UVW frame convention, plus an orbit
trackball for interactive use.

Twin of sutil/Camera.{h,cpp}: W = lookat - eye (NOT normalized — |W| is the
focal length), U = normalize(W × up) * |V| * aspect, V = normalize(U × W) * |W| *
tan(fovY/2) (Camera.cpp:34-45). The trackball mirrors sutil/Trackball.cpp's
lat/long orbit.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Camera:
    eye: Tuple[float, float, float]
    lookat: Tuple[float, float, float]
    up: Tuple[float, float, float] = (0.0, 1.0, 0.0)
    fov_y: float = 45.0  # degrees
    aspect: float = 1.0

    def uvw_frame(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Host-side UVW (Camera.cpp UVWFrame), float32 numpy."""
        eye = np.asarray(self.eye, dtype=np.float64)
        lookat = np.asarray(self.lookat, dtype=np.float64)
        up = np.asarray(self.up, dtype=np.float64)
        w = lookat - eye
        wlen = np.linalg.norm(w)
        u = np.cross(w, up)
        u /= np.linalg.norm(u)
        v = np.cross(u, w)
        v /= np.linalg.norm(v)
        vlen = wlen * math.tan(0.5 * math.radians(self.fov_y))
        v = v * vlen
        u = u * (vlen * self.aspect)
        return (
            u.astype(np.float32),
            v.astype(np.float32),
            w.astype(np.float32),
        )

    def device_params(self) -> "CameraParams":
        u, v, w = self.uvw_frame()
        return CameraParams(
            eye=jnp.asarray(self.eye, dtype=jnp.float32),
            u=jnp.asarray(u),
            v=jnp.asarray(v),
            w=jnp.asarray(w),
        )


@dataclasses.dataclass(frozen=True)
class CameraParams:
    """Device-side camera pytree: the LaunchParams.camera struct
    (LaunchParams.h:73-78)."""

    eye: jnp.ndarray  # (3,)
    u: jnp.ndarray  # (3,)
    v: jnp.ndarray  # (3,)
    w: jnp.ndarray  # (3,)


jax.tree_util.register_dataclass(
    CameraParams, data_fields=["eye", "u", "v", "w"], meta_fields=[]
)


@dataclasses.dataclass
class Trackball:
    """Lat/long orbit around a reference frame (sutil/Trackball.cpp behavior:
    latitude clamped to (-90, 90), longitude wraps, zoom scales eye distance).

    ``view_mode`` mirrors Trackball.h:74-78 ViewMode: "lookat_fixed" orbits
    the EYE around the lookat point (the default); "eye_fixed" pivots the
    LOOKAT around a fixed eye — first-person look-around
    (Trackball.cpp updateCamera: lookat = eye - dir * distance)."""

    camera: Camera
    latitude: float = 0.0  # radians
    longitude: float = 0.0  # radians
    move_speed: float = 10.0
    view_mode: str = "lookat_fixed"  # or "eye_fixed"
    # reference frame (sutil default is the trackball's world frame; main.cpp
    # sets x=(1,0,0), y=(0,0,1), z=(0,1,0))
    frame_u: Tuple[float, float, float] = (1.0, 0.0, 0.0)
    frame_v: Tuple[float, float, float] = (0.0, 0.0, 1.0)
    frame_w: Tuple[float, float, float] = (0.0, 1.0, 0.0)

    def reinitialize_from_camera(self) -> None:
        eye = np.asarray(self.camera.eye, dtype=np.float64)
        lookat = np.asarray(self.camera.lookat, dtype=np.float64)
        d = eye - lookat
        r = np.linalg.norm(d)
        if r < 1e-12:
            return
        u = np.asarray(self.frame_u)
        v = np.asarray(self.frame_v)
        w = np.asarray(self.frame_w)
        dn = d / r
        self.latitude = math.asin(float(np.clip(np.dot(dn, w), -1.0, 1.0)))
        self.longitude = math.atan2(float(np.dot(dn, v)), float(np.dot(dn, u)))

    def _eye_from_angles(self, radius: float) -> np.ndarray:
        return np.asarray(self.camera.lookat) + radius * self._dir_from_angles()

    def _dir_from_angles(self) -> np.ndarray:
        u = np.asarray(self.frame_u)
        v = np.asarray(self.frame_v)
        w = np.asarray(self.frame_w)
        cl, sl = math.cos(self.latitude), math.sin(self.latitude)
        co, so = math.cos(self.longitude), math.sin(self.longitude)
        return cl * co * u + cl * so * v + sl * w

    def orbit(self, dx: float, dy: float) -> Camera:
        """Rotate by screen-space deltas (pixels); returns the updated camera.
        lookat_fixed moves the eye on the orbit sphere; eye_fixed pivots the
        lookat about the eye (Trackball.cpp updateCamera)."""
        self.longitude = (self.longitude - 0.005 * dx) % (2 * math.pi)
        self.latitude = float(
            np.clip(self.latitude + 0.005 * dy, -0.5 * math.pi + 1e-3, 0.5 * math.pi - 1e-3)
        )
        eye = np.asarray(self.camera.eye, dtype=np.float64)
        lookat = np.asarray(self.camera.lookat, dtype=np.float64)
        radius = float(np.linalg.norm(eye - lookat))
        dirn = self._dir_from_angles()
        if self.view_mode == "eye_fixed":
            new_lookat = eye - radius * dirn
            self.camera = dataclasses.replace(
                self.camera, lookat=tuple(map(float, new_lookat))
            )
        else:
            new_eye = lookat + radius * dirn
            self.camera = dataclasses.replace(
                self.camera, eye=tuple(map(float, new_eye))
            )
        return self.camera

    def zoom(self, direction: int) -> Camera:
        """Scale the eye↔lookat distance by 10% per wheel tick (Trackball.cpp
        zoom): lookat_fixed moves the EYE along the view ray; eye_fixed keeps
        the first-person eye pinned and moves the LOOKAT instead (the same
        invariant orbit honors per view mode)."""
        eye = np.asarray(self.camera.eye, dtype=np.float64)
        lookat = np.asarray(self.camera.lookat, dtype=np.float64)
        scale = 0.9 if direction > 0 else 1.0 / 0.9
        if self.view_mode == "eye_fixed":
            new_lookat = eye + (lookat - eye) * scale
            self.camera = dataclasses.replace(
                self.camera, lookat=tuple(map(float, new_lookat))
            )
        else:
            new_eye = lookat + (eye - lookat) * scale
            self.camera = dataclasses.replace(
                self.camera, eye=tuple(map(float, new_eye))
            )
        return self.camera
