"""Bundle adjustment tests: noiseless recovery, gauge fixing via fixed
cameras, robustness to outliers via the two-phase schedule."""

import jax.numpy as jnp
import numpy as np
import pytest

from orbslam2_tpu.config import CameraConfig
from orbslam2_tpu.geometry import camera, se3
from orbslam2_tpu.solvers import ba

CAM = CameraConfig(fx=480.0, fy=480.0, cx=319.5, cy=239.5, bf=48.0)
K = camera.Intrinsics.from_config(CAM)


def make_ba_problem(
    rng,
    n_cams=6,
    n_pts=256,
    n_obs=4,
    pose_noise=0.02,
    point_noise=0.05,
    pix_noise=0.0,
    outlier_frac=0.0,
    n_fixed=1,
    stereo=False,
):
    # ground truth: cameras along x with small yaw, points in front
    cams_true = []
    for i in range(n_cams):
        xi = np.asarray([0.4 * i, 0.0, 0.0, 0.0, 0.02 * i, 0.0], np.float32)
        cams_true.append(np.asarray(se3.exp_se3(jnp.asarray(xi))))
    cams_true = np.stack(cams_true)
    pts_true = np.c_[
        rng.uniform(-4, 6, n_pts), rng.uniform(-3, 3, n_pts), rng.uniform(6, 14, n_pts)
    ].astype(np.float32)

    # each point observed by n_obs random cameras
    obs_cam = np.stack([rng.permutation(n_cams)[:n_obs] for _ in range(n_pts)]).astype(np.int32)
    Ts = cams_true[obs_cam]  # [P,O,4,4]
    pc = np.einsum("poij,pj->poi", Ts[..., :3, :3], pts_true) + Ts[..., :3, 3]
    uvr = np.asarray(camera.project_stereo(jnp.asarray(pc.astype(np.float32)), K))
    obs_uv = uvr[..., :2].astype(np.float32)
    obs_ur = uvr[..., 2].astype(np.float32) if stereo else np.full((n_pts, n_obs), -1.0, np.float32)
    obs_valid = pc[..., 2] > 0.5
    if pix_noise:
        obs_uv += rng.normal(0, pix_noise, obs_uv.shape)
    n_out = int(n_pts * n_obs * outlier_frac)
    if n_out:
        pi = rng.integers(0, n_pts, n_out)
        oi = rng.integers(0, n_obs, n_out)
        obs_uv[pi, oi] += rng.uniform(15, 60, (n_out, 2)) * np.sign(rng.normal(size=(n_out, 2)))

    # perturbed initial state (fixed cams stay at truth)
    cam_init = cams_true.copy()
    for i in range(n_fixed, n_cams):
        xi = rng.normal(0, pose_noise, 6).astype(np.float32)
        cam_init[i] = np.asarray(se3.exp_se3(jnp.asarray(xi))) @ cam_init[i]
    pts_init = pts_true + rng.normal(0, point_noise, pts_true.shape).astype(np.float32)

    prob = ba.BAProblem(
        cam_Tcw=jnp.asarray(cam_init.astype(np.float32)),
        cam_free=jnp.asarray(np.arange(n_cams) >= n_fixed),
        points=jnp.asarray(pts_init.astype(np.float32)),
        point_valid=jnp.ones(n_pts, bool),
        obs_cam=jnp.asarray(obs_cam),
        obs_uv=jnp.asarray(obs_uv),
        obs_ur=jnp.asarray(obs_ur),
        obs_inv_sigma2=jnp.ones((n_pts, n_obs)),
        obs_valid=jnp.asarray(obs_valid),
    )
    return cams_true, pts_true, prob


def cam_errors(cam_est, cams_true):
    d = np.asarray(se3.log_se3(jnp.asarray(cam_est) @ se3.inverse(jnp.asarray(cams_true))))
    return np.linalg.norm(d, axis=-1)


class TestBundleAdjust:
    def test_noiseless_recovery(self, rng):
        # two fixed cameras pin the scale gauge (mono BA with one fixed
        # camera leaves global scale free, like the reference's GBA)
        cams_true, pts_true, prob = make_ba_problem(rng, n_fixed=2)
        res = ba.bundle_adjust(prob, K, iters=15)
        assert cam_errors(res.cam_Tcw, cams_true).max() < 1e-3
        perr = np.linalg.norm(np.asarray(res.points) - pts_true, axis=-1)
        assert np.median(perr) < 5e-3

    def test_stereo_edges(self, rng):
        cams_true, pts_true, prob = make_ba_problem(rng, stereo=True)  # stereo fixes scale
        res = ba.bundle_adjust(prob, K, iters=15)
        assert cam_errors(res.cam_Tcw, cams_true).max() < 1e-3

    def test_fixed_cams_unmoved(self, rng):
        cams_true, pts_true, prob = make_ba_problem(rng, n_fixed=2)
        res = ba.bundle_adjust(prob, K, iters=10)
        np.testing.assert_allclose(
            np.asarray(res.cam_Tcw[:2]), np.asarray(prob.cam_Tcw[:2]), atol=1e-7
        )

    def test_cost_decreases(self, rng):
        *_, prob = make_ba_problem(rng, pose_noise=0.05, point_noise=0.2, pix_noise=0.5)
        res0 = ba.bundle_adjust(prob, K, iters=0)
        res = ba.bundle_adjust(prob, K, iters=12)
        assert float(res.cost) < 0.5 * float(res0.cost)

    def test_two_phase_outlier_robustness(self, rng):
        cams_true, pts_true, prob = make_ba_problem(
            rng, pix_noise=0.4, outlier_frac=0.08, n_fixed=2
        )
        res = ba.two_phase_bundle_adjust(prob, K)
        # noise-limited: 0.4px noise / ~170 obs per cam -> ~1e-2 pose std
        assert cam_errors(res.cam_Tcw, cams_true).max() < 1.5e-2
        # outlier edges must be flagged
        assert float(jnp.mean(res.obs_inlier & prob.obs_valid)) > 0.8

    def test_invalid_points_untouched(self, rng):
        cams_true, pts_true, prob = make_ba_problem(rng, n_fixed=2)
        pv = prob.point_valid.at[:32].set(False)
        garbage = prob.points.at[:32].set(jnp.nan)
        prob2 = prob._replace(point_valid=pv, points=garbage)
        res = ba.bundle_adjust(prob2, K, iters=8)
        # valid part still converges
        assert cam_errors(res.cam_Tcw, cams_true).max() < 5e-3


def test_chunked_schur_assembly_matches_direct(monkeypatch):
    """The scan-chunked reduced-camera-system assembly (used for
    KITTI-length C, where [P,O,C] one-hots would be gigabytes) must
    reproduce the direct path bit-for-bit-ish."""
    import numpy as np
    import jax.numpy as jnp

    from orbslam2_tpu.config import CameraConfig
    from orbslam2_tpu.geometry import se3
    from orbslam2_tpu.geometry.camera import Intrinsics
    from orbslam2_tpu.solvers import ba

    K = Intrinsics.from_config(CameraConfig(fx=480.0, fy=480.0, bf=240.0))
    rng = np.random.default_rng(3)
    C, Pn, O = 8, 700, 4
    cams = np.stack([
        np.asarray(se3.exp_se3(jnp.asarray([0.3 * i, 0, 0, 0, 0.02 * i, 0], jnp.float32)))
        for i in range(C)
    ]).astype(np.float32)
    pts = np.c_[rng.uniform(-3, 3, Pn), rng.uniform(-2, 2, Pn), rng.uniform(4, 10, Pn)].astype(np.float32)
    obs_cam = np.stack([rng.permutation(C)[:O] for _ in range(Pn)]).astype(np.int32)
    Ts = cams[obs_cam]
    pc = np.einsum("poij,pj->poi", Ts[..., :3, :3], pts) + Ts[..., :3, 3]
    uv = np.stack([480.0 * pc[..., 0] / pc[..., 2] + 319.5,
                   480.0 * pc[..., 1] / pc[..., 2] + 239.5], -1).astype(np.float32)
    prob = ba.BAProblem(
        cam_Tcw=jnp.asarray(cams), cam_free=jnp.asarray(np.arange(C) >= 1),
        points=jnp.asarray(pts + rng.normal(0, 0.03, pts.shape).astype(np.float32)),
        point_valid=jnp.ones(Pn, bool), obs_cam=jnp.asarray(obs_cam),
        obs_uv=jnp.asarray(uv + rng.normal(0, 0.2, uv.shape).astype(np.float32)),
        obs_ur=jnp.full((Pn, O), -1.0, jnp.float32),
        obs_inv_sigma2=jnp.ones((Pn, O)), obs_valid=jnp.ones((Pn, O), bool),
    )
    res_direct = ba.bundle_adjust(prob, K, iters=4, use_kernel=False)
    monkeypatch.setattr(ba, "_CHUNK_ELEMS", 1024)  # force chunking
    res_chunk = ba.bundle_adjust.__wrapped__(prob, K, iters=4, use_kernel=False)
    np.testing.assert_allclose(
        np.asarray(res_direct.cam_Tcw), np.asarray(res_chunk.cam_Tcw),
        atol=1e-4, rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(res_direct.points), np.asarray(res_chunk.points),
        atol=1e-3, rtol=1e-3,
    )
