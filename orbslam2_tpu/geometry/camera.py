"""Pinhole camera model: projection, unprojection, radial-tangential
distortion and batched keypoint undistortion.

Replaces the reference's scattered cv:: calls — `cv::undistortPoints`
(reference src/Frame.cc:436-468), the hand-inlined projections in
`Frame::isInFrustum` (reference src/Frame.cc:288-345) and the per-edge
`project` in g2o. Everything is batched over trailing point dims and
jit/vmap/grad-safe.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from orbslam2_tpu.config import CameraConfig


class Intrinsics(NamedTuple):
    """Device-friendly intrinsics bundle (static per session)."""

    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    dist: jnp.ndarray  # [5] = k1, k2, p1, p2, k3
    bf: jnp.ndarray    # baseline * fx (stereo)

    @classmethod
    def from_config(cls, cam: CameraConfig, dtype=jnp.float32) -> "Intrinsics":
        return cls(
            fx=jnp.asarray(cam.fx, dtype),
            fy=jnp.asarray(cam.fy, dtype),
            cx=jnp.asarray(cam.cx, dtype),
            cy=jnp.asarray(cam.cy, dtype),
            dist=jnp.asarray([cam.k1, cam.k2, cam.p1, cam.p2, cam.k3], dtype),
            bf=jnp.asarray(cam.bf, dtype),
        )

    @property
    def K(self) -> jnp.ndarray:
        z = jnp.zeros_like(self.fx)
        o = jnp.ones_like(self.fx)
        return jnp.stack(
            [
                jnp.stack([self.fx, z, self.cx]),
                jnp.stack([z, self.fy, self.cy]),
                jnp.stack([z, z, o]),
            ]
        )


def distort_normalized(xn: jnp.ndarray, dist: jnp.ndarray) -> jnp.ndarray:
    """Apply radial-tangential distortion to normalized coords [..., 2]."""
    k1, k2, p1, p2, k3 = dist[0], dist[1], dist[2], dist[3], dist[4]
    x, y = xn[..., 0], xn[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def undistort_normalized(xd: jnp.ndarray, dist: jnp.ndarray, iters: int = 8) -> jnp.ndarray:
    """Invert distortion by fixed-point iteration (batched, fixed iter count).

    Matches cv::undistortPoints' iterative scheme (reference src/Frame.cc:456).
    """

    def body(_, xn):
        x, y = xn[..., 0], xn[..., 1]
        k1, k2, p1, p2, k3 = dist[0], dist[1], dist[2], dist[3], dist[4]
        r2 = x * x + y * y
        radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        xu = (xd[..., 0] - dx) / radial
        yu = (xd[..., 1] - dy) / radial
        return jnp.stack([xu, yu], axis=-1)

    return jax.lax.fori_loop(0, iters, body, xd)


def undistort_pixels(uv: jnp.ndarray, K: Intrinsics, iters: int = 8) -> jnp.ndarray:
    """Undistort pixel keypoints [..., 2] -> undistorted pixel coords.

    Parity with Frame::UndistortKeyPoints (reference src/Frame.cc:436-468):
    output is re-projected with the same K (no new camera matrix).
    """
    xn = jnp.stack(
        [(uv[..., 0] - K.cx) / K.fx, (uv[..., 1] - K.cy) / K.fy], axis=-1
    )
    xu = undistort_normalized(xn, K.dist, iters)
    return jnp.stack([xu[..., 0] * K.fx + K.cx, xu[..., 1] * K.fy + K.cy], axis=-1)


def project(pc: jnp.ndarray, K: Intrinsics, distort: bool = False) -> jnp.ndarray:
    """Camera-frame points [..., 3] -> pixel coords [..., 2].

    z is clamped away from 0 so masked/padded points stay finite.
    """
    z = jnp.where(jnp.abs(pc[..., 2:3]) < 1e-6, 1e-6, pc[..., 2:3])
    xn = pc[..., :2] / z
    if distort:
        xn = distort_normalized(xn, K.dist)
    return jnp.stack(
        [xn[..., 0] * K.fx + K.cx, xn[..., 1] * K.fy + K.cy], axis=-1
    )


def project_stereo(pc: jnp.ndarray, K: Intrinsics) -> jnp.ndarray:
    """[..., 3] -> (u_left, v, u_right) with u_right = u - bf/z
    (reference src/Frame.cc:702-726 virtual right coordinate)."""
    uv = project(pc, K)
    z = jnp.maximum(pc[..., 2], 1e-6)
    ur = uv[..., 0] - K.bf / z
    return jnp.concatenate([uv, ur[..., None]], axis=-1)


def backproject(uv: jnp.ndarray, depth: jnp.ndarray, K: Intrinsics) -> jnp.ndarray:
    """Pixels [..., 2] + depth [...] -> camera-frame 3D points [..., 3]
    (reference Frame::UnprojectStereo, src/Frame.cc:729-744)."""
    x = (uv[..., 0] - K.cx) / K.fx * depth
    y = (uv[..., 1] - K.cy) / K.fy * depth
    return jnp.stack([x, y, depth], axis=-1)


def compute_image_bounds(cam: CameraConfig) -> tuple[float, float, float, float]:
    """Undistorted image bounds from the 4 corners
    (reference Frame::ComputeImageBounds, src/Frame.cc:471-510)."""
    K = Intrinsics.from_config(cam)
    corners = jnp.asarray(
        [
            [0.0, 0.0],
            [cam.width, 0.0],
            [0.0, cam.height],
            [cam.width, cam.height],
        ],
        jnp.float32,
    )
    if not cam.has_distortion():
        return 0.0, float(cam.width), 0.0, float(cam.height)
    und = undistort_pixels(corners, K)
    xs, ys = und[:, 0], und[:, 1]
    return (
        float(jnp.minimum(xs[0], xs[2])),
        float(jnp.maximum(xs[1], xs[3])),
        float(jnp.minimum(ys[0], ys[1])),
        float(jnp.maximum(ys[2], ys[3])),
    )
