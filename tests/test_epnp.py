"""EPnP RANSAC unit tests on synthetic camera/point sets
(the test class SURVEY.md §4 prescribes for src/PnPsolver.cc:448)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orbslam2_tpu.config import CameraConfig
from orbslam2_tpu.geometry import camera, se3
from orbslam2_tpu.solvers import epnp

CAM = CameraConfig(fx=480.0, fy=480.0, cx=319.5, cy=239.5)
K = camera.Intrinsics.from_config(CAM)


def make_pnp(rng, n=128, noise=0.0, outliers=0):
    pw = np.c_[rng.uniform(-3, 3, n), rng.uniform(-2, 2, n), rng.uniform(4, 10, n)].astype(np.float32)
    xi = np.asarray([0.2, -0.1, 0.3, 0.05, -0.1, 0.08], np.float32)
    Tcw = np.asarray(se3.exp_se3(jnp.asarray(xi)))
    uv = np.array(camera.project(se3.apply(jnp.asarray(Tcw), jnp.asarray(pw)), K))
    if noise:
        uv += rng.normal(0, noise, uv.shape)
    if outliers:
        uv[:outliers] += rng.uniform(25, 80, (outliers, 2)) * np.sign(rng.normal(size=(outliers, 2)))
    return pw, Tcw, uv.astype(np.float32)


def terr(T, Tgt):
    e = np.asarray(T) @ np.linalg.inv(Tgt)
    return np.linalg.norm(e[:3, 3])


class TestEPnP:
    def test_noiseless(self, rng):
        pw, Tgt, uv = make_pnp(rng)
        res = epnp.ransac_pnp(
            jnp.asarray(pw), jnp.asarray(uv), jnp.ones(len(pw), bool),
            jnp.ones(len(pw)), K, jax.random.PRNGKey(0),
        )
        assert bool(res.success)
        assert terr(res.Tcw, Tgt) < 5e-3, terr(res.Tcw, Tgt)
        assert int(res.num_inliers) > 120

    def test_outliers(self, rng):
        pw, Tgt, uv = make_pnp(rng, noise=0.5, outliers=40)
        res = epnp.ransac_pnp(
            jnp.asarray(pw), jnp.asarray(uv), jnp.ones(len(pw), bool),
            jnp.ones(len(pw)), K, jax.random.PRNGKey(1),
        )
        assert bool(res.success)
        assert terr(res.Tcw, Tgt) < 0.05, terr(res.Tcw, Tgt)
        inl = np.asarray(res.inliers)
        assert inl[:40].mean() < 0.2
        assert inl[40:].mean() > 0.8

    def test_near_planar(self, rng):
        # hard relocalization geometry: almost-coplanar points squeeze the
        # kernel toward rank>1, where the beta1-only case breaks and the
        # beta2/beta3 + Gauss-Newton arbitration must take over (reference
        # PnPsolver.cc find_betas_approx_2/3 + gauss_newton :616-807)
        n = 128
        pw = np.c_[
            rng.uniform(-3, 3, n), rng.uniform(-2, 2, n),
            6.0 + rng.uniform(-0.02, 0.02, n),
        ].astype(np.float32)
        xi = np.asarray([0.3, -0.2, 0.1, 0.4, -0.3, 0.15], np.float32)
        Tgt = np.asarray(se3.exp_se3(jnp.asarray(xi)))
        uv = np.array(camera.project(se3.apply(jnp.asarray(Tgt), jnp.asarray(pw)), K))
        uv += rng.normal(0, 0.3, uv.shape)
        res = epnp.ransac_pnp(
            jnp.asarray(pw), jnp.asarray(uv.astype(np.float32)),
            jnp.ones(n, bool), jnp.ones(n), K, jax.random.PRNGKey(2),
        )
        assert bool(res.success)
        assert terr(res.Tcw, Tgt) < 0.05, terr(res.Tcw, Tgt)
        assert int(res.num_inliers) > 100

    def test_too_few_points(self, rng):
        pw, Tgt, uv = make_pnp(rng)
        mask = np.zeros(len(pw), bool)
        mask[:5] = True
        res = epnp.ransac_pnp(
            jnp.asarray(pw), jnp.asarray(uv), jnp.asarray(mask),
            jnp.ones(len(pw)), K, jax.random.PRNGKey(0), min_inliers=10,
        )
        assert not bool(res.success)
