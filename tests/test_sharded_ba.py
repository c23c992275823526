"""Sharded BA on the virtual 8-device CPU mesh: must converge and agree
with the single-device solver (mesh-shape-parametrized per SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orbslam2_tpu.parallel import sharded_ba
from orbslam2_tpu.solvers import ba
from tests.test_ba import K, cam_errors, make_ba_problem


@pytest.mark.parametrize("n_devices", [1, 2, 8])
def test_sharded_matches_single(rng, n_devices):
    if len(jax.devices()) < n_devices:
        pytest.skip("not enough devices")
    cams_true, pts_true, prob = make_ba_problem(rng, n_pts=256, n_fixed=2)
    mesh = sharded_ba.make_points_mesh(n_devices)
    cam, pts, cost = sharded_ba.sharded_bundle_adjust(prob, K, mesh, iters=15)
    assert cam_errors(cam, cams_true).max() < 1e-3
    perr = np.linalg.norm(np.asarray(pts) - pts_true, axis=-1)
    assert np.median(perr) < 5e-3


@pytest.mark.parametrize("n_devices", [1, 2, 8])
def test_sharded_pcg_camera_solve(rng, n_devices):
    """The reduce-scatter + distributed block-Jacobi-PCG camera solve
    converges to the same optimum as the replicated direct factorization
    (inexact inner solves still drive LM to the fixed point)."""
    if len(jax.devices()) < n_devices:
        pytest.skip("not enough devices")
    cams_true, pts_true, prob = make_ba_problem(rng, n_pts=256, n_fixed=2)
    mesh = sharded_ba.make_points_mesh(n_devices)
    cam, pts, cost = sharded_ba.sharded_bundle_adjust(
        prob, K, mesh, iters=15, camera_solver="pcg", cg_iters=48
    )
    assert cam_errors(cam, cams_true).max() < 1e-3
    perr = np.linalg.norm(np.asarray(pts) - pts_true, axis=-1)
    assert np.median(perr) < 5e-3
    _, _, cost_direct = sharded_ba.sharded_bundle_adjust(
        prob, K, mesh, iters=15
    )
    # noiseless problem: both drive the cost to ~0
    np.testing.assert_allclose(float(cost), float(cost_direct),
                               rtol=5e-2, atol=1e-6)


def test_sharded_equals_unsharded_cost(rng):
    cams_true, pts_true, prob = make_ba_problem(rng, n_pts=256, n_fixed=2, pix_noise=0.5)
    mesh1 = sharded_ba.make_points_mesh(1)
    mesh8 = sharded_ba.make_points_mesh(8)
    _, _, c1 = sharded_ba.sharded_bundle_adjust(prob, K, mesh1, iters=10)
    _, _, c8 = sharded_ba.sharded_bundle_adjust(prob, K, mesh8, iters=10)
    # same deterministic math, different device layout
    np.testing.assert_allclose(float(c1), float(c8), rtol=1e-3)
    res = ba.bundle_adjust(prob, K, iters=10)
    np.testing.assert_allclose(float(c8), float(res.cost), rtol=1e-2)
