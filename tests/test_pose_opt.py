"""Pose-only LM optimizer tests: noiseless convergence, noise robustness,
outlier rejection via the chi2 reclassification schedule."""

import jax.numpy as jnp
import numpy as np
import pytest

from orbslam2_tpu.config import CameraConfig
from orbslam2_tpu.geometry import camera, se3
from orbslam2_tpu.solvers import pose_opt

CAM = CameraConfig(fx=480.0, fy=480.0, cx=319.5, cy=239.5, bf=48.0)
K = camera.Intrinsics.from_config(CAM)


def make_problem(rng, n=256, noise=0.0, outlier_frac=0.0, stereo=False):
    pw = np.c_[rng.uniform(-3, 3, n), rng.uniform(-2, 2, n), rng.uniform(4, 12, n)].astype(np.float32)
    xi_true = np.asarray([0.1, -0.05, 0.2, 0.02, -0.03, 0.01], np.float32)
    T_true = se3.exp_se3(jnp.asarray(xi_true))
    pc = se3.apply(T_true, jnp.asarray(pw))
    uvr = camera.project_stereo(pc, K)
    uv = np.asarray(uvr[:, :2])
    ur = np.asarray(uvr[:, 2]) if stereo else np.full(n, -1.0, np.float32)
    if noise:
        uv = uv + rng.normal(0, noise, uv.shape)
        if stereo:
            ur = ur + rng.normal(0, noise, ur.shape)
    n_out = int(n * outlier_frac)
    if n_out:
        uv[:n_out] += rng.uniform(20, 80, (n_out, 2)) * np.sign(rng.normal(size=(n_out, 2)))
    obs = pose_opt.PoseObservations(
        pw=jnp.asarray(pw),
        uv=jnp.asarray(uv.astype(np.float32)),
        ur=jnp.asarray(ur.astype(np.float32)),
        inv_sigma2=jnp.ones(n),
        mask=jnp.ones(n, bool),
    )
    return T_true, obs


def pose_error(T_est, T_true):
    d = np.asarray(se3.log_se3(T_est @ se3.inverse(T_true)))
    return np.linalg.norm(d)


class TestPoseOptimize:
    def test_noiseless_convergence(self, rng):
        T_true, obs = make_problem(rng)
        res = pose_opt.pose_optimize(se3.identity(), obs, K)
        assert pose_error(res.Tcw, T_true) < 1e-4
        assert int(res.num_inliers) == 256

    def test_stereo_edges(self, rng):
        T_true, obs = make_problem(rng, stereo=True)
        res = pose_opt.pose_optimize(se3.identity(), obs, K)
        assert pose_error(res.Tcw, T_true) < 1e-4

    def test_noise_robustness(self, rng):
        T_true, obs = make_problem(rng, noise=0.5)
        res = pose_opt.pose_optimize(se3.identity(), obs, K)
        assert pose_error(res.Tcw, T_true) < 5e-3
        assert int(res.num_inliers) > 200

    def test_outlier_rejection(self, rng):
        """25% gross outliers with a motion-model-quality init (the setting
        PoseOptimization actually runs in: tracking seeds it near truth)."""
        T_true, obs = make_problem(rng, noise=0.3, outlier_frac=0.25)
        T0 = se3.exp_se3(jnp.asarray([0.02, -0.01, 0.03, 0.005, -0.008, 0.004])) @ T_true
        res = pose_opt.pose_optimize(T0, obs, K)
        assert pose_error(res.Tcw, T_true) < 5e-3
        inl = np.asarray(res.inliers)
        # outliers live in the first quarter of slots
        assert not inl[: int(256 * 0.25)].any() or inl[: int(256 * 0.25)].mean() < 0.1
        assert inl[int(256 * 0.25) :].mean() > 0.9

    def test_masked_slots_ignored(self, rng):
        T_true, obs = make_problem(rng)
        # corrupt masked-out slots with garbage; result must not change
        bad_uv = obs.uv.at[:64].set(jnp.nan)
        mask = obs.mask.at[:64].set(False)
        obs2 = obs._replace(uv=bad_uv, mask=mask)
        res = pose_opt.pose_optimize(se3.identity(), obs2, K)
        assert pose_error(res.Tcw, T_true) < 1e-3
        assert int(res.num_inliers) == 192

    def test_far_init_converges(self, rng):
        """Start far from the solution (large rotation) — the 40-iteration
        schedule should still pull it in (motion-model failures do this)."""
        T_true, obs = make_problem(rng)
        T0 = se3.exp_se3(jnp.asarray([0.5, 0.3, -0.4, 0.15, 0.1, -0.12]))
        res = pose_opt.pose_optimize(T0, obs, K)
        assert pose_error(res.Tcw, T_true) < 1e-3
