"""Pinhole camera: construction, interaction ops, and batched ray generation.

Rebuilds ``include/camera.hpp`` as pure functions over the :class:`Camera`
pytree.  Ray generation is fully vectorized — one [H*W, 3] batch of
directions per call — instead of per-thread ``CameraGetRay``
(ray_tracing.comp:205-211).
"""

from __future__ import annotations

import dataclasses
import math as pymath

import jax.numpy as jnp
import numpy as np

from pnraytracing_tpu.core.math import FLOAT_MAX, normalize
from pnraytracing_tpu.core.types import Camera


@dataclasses.dataclass
class CameraState:
    """Host-side mutable camera rig (eye/center/up/fov), the analogue of the
    interactive fields of ``Camera`` (camera.hpp:64-76).  Produces immutable
    :class:`Camera` bases for the device."""

    eye: np.ndarray
    center: np.ndarray
    up: np.ndarray
    fov_deg: float
    aspect: float

    def basis(self) -> Camera:
        return make_camera(self.eye, self.center, self.up, self.fov_deg, self.aspect)

    # --- interaction ops (camera.hpp:33-62) ---------------------------------
    def orbit(self, phi_deg: float, theta_deg: float) -> None:
        """Orbit eye around center (camera.hpp:33-44)."""
        w, u, v = _wuv(self.eye, self.center, self.up)
        phi = pymath.radians(phi_deg * 0.6)
        theta = pymath.radians(theta_deg * 0.6)
        nv = (
            w * pymath.cos(phi) * pymath.cos(theta)
            + u * pymath.sin(phi) * pymath.cos(theta)
            + v * pymath.sin(theta)
        )
        if abs(float(np.dot(self.up, nv))) > 0.9995:
            return
        dist = float(np.linalg.norm(self.eye - self.center))
        self.eye = self.center + nv * dist

    def pan(self, dx: float, dy: float) -> None:
        """Translate eye+center in the view plane (camera.hpp:46-54)."""
        _, u, v = _wuv(self.eye, self.center, self.up)
        delta = 0.05 * (dx * u + dy * v)
        self.eye = self.eye + delta
        self.center = self.center + delta

    def zoom_fov(self, delta_deg: float) -> None:
        """Fov zoom with the reference's (1, 89) degree clamp
        (camera.hpp:56-62)."""
        nfov = self.fov_deg + delta_deg
        if 1.0 < nfov < 89.0:
            self.fov_deg = nfov


def _wuv(eye, center, up):
    w = np.asarray(eye, np.float64) - np.asarray(center, np.float64)
    w = w / np.linalg.norm(w)
    u = np.cross(np.asarray(up, np.float64), w)
    u = u / np.linalg.norm(u)
    v = np.cross(w, u)
    return w, u, v


def make_camera(eye, center, up, fov_deg: float, aspect: float) -> Camera:
    """Build the ray-gen basis (camera.hpp:11-31): screen plane at distance 1
    along -w, half-extent tan(fov/2) * (aspect, 1)."""
    eye = jnp.asarray(eye, jnp.float32)
    center = jnp.asarray(center, jnp.float32)
    up = jnp.asarray(up, jnp.float32)
    half_h = jnp.tan(jnp.deg2rad(jnp.float32(fov_deg)) * 0.5)
    half_w = jnp.float32(aspect) * half_h
    w = normalize(eye - center)
    u = normalize(jnp.cross(up, w))
    v = jnp.cross(w, u)
    lower_left = eye - half_w * u - half_h * v - w
    return Camera(
        eye=eye,
        lower_left=lower_left,
        horizontal=2.0 * half_w * u,
        vertical=2.0 * half_h * v,
    )


def camera_rays(
    camera: Camera,
    width: int,
    height: int,
    jitter: jnp.ndarray | None = None,
):
    """Generate one primary ray per pixel.

    Matches the reference's pixel-corner parameterization
    (s, t) = (x/W, y/H) with y=0 at the *bottom* row (GL convention,
    ray_tracing.comp:980).  Returns (origins [P,3], dirs [P,3], t_max [P])
    with P = width*height, pixel order row-major from the top row so that
    reshape(H, W, 3) is a top-down image.

    jitter: optional [P, 2] sub-pixel offsets in [0,1) (cfg.jitter_primary).
    """
    xs = jnp.arange(width, dtype=jnp.float32)
    ys = jnp.arange(height, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys, indexing="xy")  # [H, W]
    # top-down image rows: row 0 = top = largest t
    gy = jnp.float32(height - 1) - gy
    px = gx.reshape(-1)
    py = gy.reshape(-1)
    if jitter is not None:
        px = px + jitter[:, 0]
        py = py + jitter[:, 1]
    s = px / jnp.float32(width)
    t = py / jnp.float32(height)
    d = (
        camera.lower_left[None, :]
        + s[:, None] * camera.horizontal[None, :]
        + t[:, None] * camera.vertical[None, :]
        - camera.eye[None, :]
    )
    d = normalize(d)
    o = jnp.broadcast_to(camera.eye[None, :], d.shape)
    t_max = jnp.full((d.shape[0],), FLOAT_MAX, jnp.float32)
    return o, d, t_max
