"""Parity of the fused Pallas pose-GN kernel against the jnp reference
(solvers/pose_opt.pose_optimize), exercised with interpret=True on CPU.

The kernel mirrors the reference schedule semantics
(src/Optimizer.cc:239-450): Huber kernel in the first two rounds, chi2
reclassification after each round — so pose AND inlier sets must agree
bit-for-bit up to f32 roundoff with the jnp implementation.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from orbslam2_tpu.config import CameraConfig
from orbslam2_tpu.geometry import camera, se3
from orbslam2_tpu.solvers import pose_opt
from orbslam2_tpu.solvers.pallas_pose_opt import pose_optimize_pallas

CAM = CameraConfig(fx=480.0, fy=480.0, cx=319.5, cy=239.5, bf=48.0)
K = camera.Intrinsics.from_config(CAM)


def make_problem(rng, n=1024, n_real=700, noise=0.5, n_out=80, stereo_frac=0.6):
    pw = np.c_[
        rng.uniform(-3, 3, n), rng.uniform(-2, 2, n), rng.uniform(4, 12, n)
    ].astype(np.float32)
    xi_true = np.asarray([0.1, -0.05, 0.2, 0.02, -0.03, 0.01], np.float32)
    T_true = se3.exp_se3(jnp.asarray(xi_true))
    pc = se3.apply(T_true, jnp.asarray(pw))
    uvr = camera.project_stereo(pc, K)
    uv = np.asarray(uvr[:, :2]) + rng.normal(0, noise, (n, 2))
    ur = np.asarray(uvr[:, 2]) + rng.normal(0, noise, n)
    ur = np.where(rng.random(n) < stereo_frac, ur, -1.0).astype(np.float32)
    out_idx = rng.choice(n_real, n_out, replace=False)
    uv[out_idx] += rng.normal(0, 30, (n_out, 2))
    mask = np.arange(n) < n_real
    # garbage in padded slots must not leak through the mask
    uv[~mask] = np.nan
    obs = pose_opt.PoseObservations(
        pw=jnp.asarray(pw),
        uv=jnp.asarray(uv.astype(np.float32)),
        ur=jnp.asarray(ur),
        inv_sigma2=jnp.ones(n),
        mask=jnp.asarray(mask),
    )
    return T_true, obs


@pytest.mark.parametrize("rounds,iters", [(4, 10), (2, 6), (3, 6), (4, 6)])
def test_matches_jnp_reference(rng, rounds, iters):
    T_true, obs = make_problem(rng)
    T0 = se3.identity()
    ref = pose_opt.pose_optimize(T0, obs, K, rounds=rounds, iters=iters)
    pal = pose_optimize_pallas(T0, obs, K, rounds=rounds, iters=iters,
                               interpret=True)
    np.testing.assert_allclose(
        np.asarray(pal.Tcw), np.asarray(ref.Tcw), atol=5e-5
    )
    assert np.array_equal(np.asarray(pal.inliers), np.asarray(ref.inliers))
    assert int(pal.num_inliers) == int(ref.num_inliers)


def test_non_padded_size(rng):
    """N not a multiple of the 8x128 plane is padded inside the wrapper."""
    T_true, obs = make_problem(rng, n=700, n_real=600, n_out=40)
    ref = pose_opt.pose_optimize(se3.identity(), obs, K, rounds=2, iters=6)
    pal = pose_optimize_pallas(se3.identity(), obs, K, rounds=2, iters=6,
                               interpret=True)
    np.testing.assert_allclose(
        np.asarray(pal.Tcw), np.asarray(ref.Tcw), atol=5e-5
    )
    assert np.array_equal(np.asarray(pal.inliers), np.asarray(ref.inliers))


def test_converges_to_truth(rng):
    T_true, obs = make_problem(rng, noise=0.0, n_out=0)
    pal = pose_optimize_pallas(se3.identity(), obs, K, interpret=True)
    d = np.asarray(se3.log_se3(pal.Tcw @ se3.inverse(T_true)))
    assert np.linalg.norm(d) < 1e-3
