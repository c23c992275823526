"""Sharded pose-graph + sharded BoW query on the virtual 8-device CPU
mesh: must match the single-device solvers (SURVEY.md §2b: the distributed
backend covers global BA, the essential graph, and place recognition)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orbslam2_tpu.geometry import se3
from orbslam2_tpu.parallel import sharded_bow, sharded_pose_graph
from orbslam2_tpu.solvers import pose_graph
from orbslam2_tpu.vocab import database


def circle_problem(rng, Kn=12):
    """Drifted keyframe chain on a circle + one loop edge (same geometry
    as tests/test_loop_solvers.py's correction test)."""
    gt = []
    for i in range(Kn):
        a = 2 * np.pi * i / Kn
        xi = jnp.asarray([np.cos(a), np.sin(a), 0, 0, 0, a], jnp.float32)
        gt.append(np.asarray(se3.exp_se3(xi)))
    gt = np.stack(gt)
    est = gt.copy()
    for i in range(1, Kn):
        xi = jnp.asarray(rng.normal(0, 0.01, 6).astype(np.float32) * i)
        est[i] = np.asarray(se3.exp_se3(xi)) @ gt[i]
    verts = jax.vmap(pose_graph.se3_to_pack)(jnp.asarray(est.astype(np.float32)))
    ei, ej, meas, w = [], [], [], []
    for i in range(Kn - 1):
        ei.append(i); ej.append(i + 1)
        rel = gt[i + 1] @ np.linalg.inv(gt[i])
        meas.append(np.asarray(pose_graph.se3_to_pack(jnp.asarray(rel.astype(np.float32)))))
        w.append(1.0)
    ei.append(Kn - 1); ej.append(0)
    rel = gt[0] @ np.linalg.inv(gt[Kn - 1])
    meas.append(np.asarray(pose_graph.se3_to_pack(jnp.asarray(rel.astype(np.float32)))))
    w.append(5.0)
    prob = pose_graph.PoseGraphProblem(
        vertices=verts,
        vertex_valid=jnp.ones(Kn, bool),
        vertex_fixed=jnp.zeros(Kn, bool).at[0].set(True),
        edge_i=jnp.asarray(ei, jnp.int32),
        edge_j=jnp.asarray(ej, jnp.int32),
        edge_meas=jnp.asarray(np.stack(meas).astype(np.float32)),
        edge_valid=jnp.ones(len(ei), bool),
        edge_weight=jnp.asarray(w, jnp.float32),
    )
    return gt, prob


@pytest.mark.parametrize("n_devices", [1, 2, 8])
@pytest.mark.parametrize("inner", ["gathered", "stepped"])
def test_sharded_pose_graph_matches_single(rng, n_devices, inner):
    if len(jax.devices()) < n_devices:
        pytest.skip("not enough devices")
    gt, prob = circle_problem(rng)
    ref = np.asarray(pose_graph.optimize_pose_graph(prob, iters=20))
    mesh = sharded_pose_graph.make_edges_mesh(n_devices)
    padded = sharded_pose_graph.pad_edges(prob, n_devices)
    out = np.asarray(
        sharded_pose_graph.sharded_optimize_pose_graph(
            padded, mesh, iters=20, inner=inner)
    )
    # psum reorders additions -> numerically equal, not bitwise (and the
    # packed quaternion sign is arbitrary): compare recovered SE3 poses
    poses = np.asarray(jax.vmap(pose_graph.pack_to_se3)(jnp.asarray(out)))
    poses_ref = np.asarray(jax.vmap(pose_graph.pack_to_se3)(jnp.asarray(ref)))
    np.testing.assert_allclose(poses, poses_ref, atol=5e-3)
    # and the optimization actually corrected the drift
    err = max(
        np.linalg.norm(np.asarray(se3.log_se3(jnp.asarray(
            (poses[i] @ np.linalg.inv(gt[i])).astype(np.float32)))))
        for i in range(len(gt))
    )
    assert err < 0.08, err


def test_pad_edges_noop_and_pad(rng):
    _, prob = circle_problem(rng)  # 12 edges
    assert sharded_pose_graph.pad_edges(prob, 4) is prob  # 12 % 4 == 0
    p8 = sharded_pose_graph.pad_edges(prob, 8)
    assert p8.edge_i.shape[0] == 16
    assert not bool(p8.edge_valid[-1])


@pytest.mark.parametrize("n_devices", [1, 2, 8])
def test_sharded_bow_query_matches_dense(rng, n_devices):
    if len(jax.devices()) < n_devices:
        pytest.skip("not enough devices")
    Kn, V = 16, 32
    vecs = rng.uniform(0, 1, (Kn, V)).astype(np.float32)
    vecs /= vecs.sum(axis=1, keepdims=True)
    present = np.ones(Kn, bool)
    present[13] = False
    exclude = np.zeros(Kn, bool)
    exclude[:2] = True
    covis = (rng.uniform(0, 1, (Kn, Kn)) > 0.8).astype(np.float32) * 50
    q = vecs[7] + rng.uniform(0, 0.01, V).astype(np.float32)
    q /= q.sum()
    args = (jnp.asarray(vecs), jnp.asarray(present), jnp.asarray(q),
            jnp.asarray(exclude), 0.01, jnp.asarray(covis))
    cand_d, mask_d, scores_d = database._query(*args)
    mesh = sharded_bow.make_kfs_mesh(n_devices)
    cand_s, mask_s, scores_s = sharded_bow.sharded_query(*args, mesh)
    np.testing.assert_allclose(np.asarray(scores_s), np.asarray(scores_d), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(cand_s), np.asarray(cand_d))
    np.testing.assert_array_equal(np.asarray(mask_s), np.asarray(mask_d))
    # sanity: the query's own raw best match is keyframe 7 (candidate
    # ORDER is by covisibility-group-accumulated score, not raw score)
    assert int(np.argmax(np.asarray(scores_d))) == 7
