"""Unit tests for the monocular H/F RANSAC initializer on clean and noisy
synthetic correspondences (no rendering/matching in the loop)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orbslam2_tpu.config import CameraConfig
from orbslam2_tpu.geometry import camera, se3
from orbslam2_tpu.solvers import initializer

CAM = CameraConfig(fx=480.0, fy=480.0, cx=319.5, cy=239.5)
K = camera.Intrinsics.from_config(CAM)


def two_view(rng, n=200, planar=False, baseline=0.3, noise=0.0, outliers=0):
    if planar:
        pw = np.c_[rng.uniform(-3, 3, n), rng.uniform(-2, 2, n), np.full(n, 6.0)]
    else:
        pw = np.c_[rng.uniform(-3, 3, n), rng.uniform(-2, 2, n), rng.uniform(3, 10, n)]
    pw = pw.astype(np.float32)
    T1 = se3.identity()
    T2 = se3.exp_se3(jnp.asarray([baseline, 0.02, 0.05, 0.01, 0.03, 0.005], jnp.float32))
    uv1 = np.array(camera.project(se3.apply(T1, jnp.asarray(pw)), K))
    uv2 = np.array(camera.project(se3.apply(T2, jnp.asarray(pw)), K))
    if noise:
        uv1 += rng.normal(0, noise, uv1.shape)
        uv2 += rng.normal(0, noise, uv2.shape)
    if outliers:
        uv2[:outliers] += rng.uniform(30, 90, (outliers, 2))
    mask = np.ones(n, bool)
    return pw, np.asarray(T2), uv1.astype(np.float32), uv2.astype(np.float32), mask


def rel_pose_error(T21_est, T21_gt):
    """Rotation error (rad) + translation direction error (rad) — mono is
    up-to-scale so only the direction of t is comparable."""
    Re = np.asarray(T21_est)[:3, :3] @ np.asarray(T21_gt)[:3, :3].T
    ang = np.arccos(np.clip((np.trace(Re) - 1) / 2, -1, 1))
    te = np.asarray(T21_est)[:3, 3]
    tg = np.asarray(T21_gt)[:3, 3]
    cos = abs(te @ tg) / max(np.linalg.norm(te) * np.linalg.norm(tg), 1e-9)
    return ang, np.arccos(np.clip(cos, -1, 1))


class TestInitializer:
    def test_general_scene_uses_fundamental(self, rng):
        pw, T21, uv1, uv2, mask = two_view(rng)
        res = initializer.initialize(
            jnp.asarray(uv1), jnp.asarray(uv2), jnp.asarray(mask), K,
            jax.random.PRNGKey(0),
        )
        assert bool(res.success)
        assert not bool(res.used_homography)
        rot_err, dir_err = rel_pose_error(res.T21, T21)
        assert rot_err < 0.01 and dir_err < 0.02, (rot_err, dir_err)
        good = np.asarray(res.good)
        assert good.sum() > 150
        # triangulated structure matches GT shape up to scale
        pts = np.asarray(res.points3d)[good]
        s = np.median(pts[:, 2] / pw[good][:, 2])
        err = np.linalg.norm(pts / s - pw[good], axis=1)
        assert np.median(err) < 0.05

    def test_planar_scene_uses_homography(self, rng):
        pw, T21, uv1, uv2, mask = two_view(rng, planar=True)
        res = initializer.initialize(
            jnp.asarray(uv1), jnp.asarray(uv2), jnp.asarray(mask), K,
            jax.random.PRNGKey(0),
        )
        assert bool(res.success)
        assert bool(res.used_homography)
        rot_err, dir_err = rel_pose_error(res.T21, T21)
        assert rot_err < 0.02 and dir_err < 0.05, (rot_err, dir_err)

    def test_noise_and_outliers(self, rng):
        pw, T21, uv1, uv2, mask = two_view(rng, noise=0.5, outliers=30)
        res = initializer.initialize(
            jnp.asarray(uv1), jnp.asarray(uv2), jnp.asarray(mask), K,
            jax.random.PRNGKey(1),
        )
        assert bool(res.success)
        rot_err, dir_err = rel_pose_error(res.T21, T21)
        # translation direction is the weakest observable at 0.5px noise +
        # 15% outliers; the pipeline refines it in the first full BA
        assert rot_err < 0.02 and dir_err < 0.25, (rot_err, dir_err)

    def test_pure_rotation_rejected(self, rng):
        """No parallax -> must NOT report success (reference requires
        triangulable structure)."""
        pw = np.c_[rng.uniform(-3, 3, 200), rng.uniform(-2, 2, 200), rng.uniform(3, 10, 200)].astype(np.float32)
        T2 = se3.exp_se3(jnp.asarray([0.0, 0, 0, 0.01, 0.05, 0.0], jnp.float32))
        uv1 = np.asarray(camera.project(jnp.asarray(pw), K))
        uv2 = np.asarray(camera.project(se3.apply(T2, jnp.asarray(pw)), K))
        res = initializer.initialize(
            jnp.asarray(uv1.astype(np.float32)), jnp.asarray(uv2.astype(np.float32)),
            jnp.ones(200, bool), K, jax.random.PRNGKey(0),
        )
        assert not bool(res.success)

    def test_insufficient_matches(self, rng):
        pw, T21, uv1, uv2, mask = two_view(rng, n=200)
        mask[:] = False
        mask[:20] = True
        res = initializer.initialize(
            jnp.asarray(uv1), jnp.asarray(uv2), jnp.asarray(mask), K,
            jax.random.PRNGKey(0),
        )
        assert not bool(res.success)
