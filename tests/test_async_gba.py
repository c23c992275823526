"""Time-sliced global BA: slice-chain equivalence with the monolithic
solver, and fold-in propagation to keyframes/points created while the
snapshot problem was being optimized (reference detached-GBA semantics,
src/LoopClosing.cc:683-790)."""

import jax
import jax.numpy as jnp
import numpy as np

from orbslam2_tpu.geometry import se3
from orbslam2_tpu.solvers import ba

from tests.test_ba import K, make_ba_problem


def test_slice_chain_matches_monolithic():
    """N slices of bundle_adjust_slice reproduce bundle_adjust exactly:
    recomputing the linearization at a slice boundary is a no-op because
    LM restores (cam, pts, terms) together on reject."""
    rng = np.random.default_rng(3)
    _, _, prob = make_ba_problem(rng, pose_noise=0.05, point_noise=0.1,
                                 pix_noise=0.5)
    ref = ba.bundle_adjust(prob, K, iters=8, use_kernel=True)

    cam, pts, lam = prob.cam_Tcw, prob.points, jnp.float32(1e-4)
    for _ in range(4):
        cam, pts, lam, cost = ba.bundle_adjust_slice(
            prob, K, cam, pts, lam, iters=2, use_kernel=jnp.asarray(True)
        )
    np.testing.assert_allclose(np.asarray(cam), np.asarray(ref.cam_Tcw),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pts), np.asarray(ref.points),
                               rtol=0, atol=1e-4)


def _small_map(n_kf=6, n_pt=40, Kcap=16, P=128):
    """Minimal MapState stand-in for _gba_fold_in (only the fields it
    touches)."""
    from orbslam2_tpu.config import MapConfig, OrbConfig
    from orbslam2_tpu.slam_map import map_state as ms

    st = ms.allocate(
        MapConfig(max_keyframes=Kcap, max_points=P), OrbConfig(), obs_slots=4
    )
    rng = np.random.default_rng(0)
    kf_T = np.tile(np.eye(4, dtype=np.float32), (Kcap, 1, 1))
    for i in range(n_kf):
        xi = np.r_[0.3 * i, 0, 0, 0, 0.02 * i, 0].astype(np.float32)
        kf_T[i] = np.asarray(se3.exp_se3(jnp.asarray(xi)))
    kf_valid = np.zeros(Kcap, bool); kf_valid[:n_kf] = True
    parent = np.full(Kcap, -1, np.int32); parent[1:n_kf] = np.arange(n_kf - 1)
    frame_id = np.full(Kcap, -1, np.int32); frame_id[:n_kf] = np.arange(n_kf) * 3
    mp_pos = np.zeros((P, 3), np.float32)
    mp_pos[:n_pt] = rng.uniform(-3, 3, (n_pt, 3))
    mp_valid = np.zeros(P, bool); mp_valid[:n_pt] = True
    mp_ref = np.full(P, -1, np.int32); mp_ref[:n_pt] = rng.integers(0, n_kf, n_pt)
    mp_first = np.full(P, -1, np.int32); mp_first[:n_pt] = mp_ref[:n_pt]
    return st._replace(
        kf_Tcw=jnp.asarray(kf_T), kf_valid=jnp.asarray(kf_valid),
        kf_parent=jnp.asarray(parent), kf_frame_id=jnp.asarray(frame_id),
        mp_pos=jnp.asarray(mp_pos), mp_valid=jnp.asarray(mp_valid),
        mp_ref_kf=jnp.asarray(mp_ref), mp_first_kf=jnp.asarray(mp_first),
    )


def test_fold_in_propagates_new_keyframes_and_points():
    from orbslam2_tpu.pipeline.loop_closing import _gba_fold_in

    st = _small_map(n_kf=6)
    Kcap = st.capacity_kf
    P = st.capacity_mp
    snap_kf_valid = st.kf_valid
    snap_kf_frame_id = st.kf_frame_id
    Mp = 64
    pts = jnp.arange(Mp, dtype=jnp.int32)
    pt_ok = st.mp_valid[:Mp]
    snap_mp_first = st.mp_first_kf[:Mp]

    # "GBA" result: per-keyframe DISTINCT corrections (a single global
    # rigid move would make rigid propagation reproduce the optimized
    # values exactly, hiding guard failures)
    D = np.asarray(se3.exp_se3(jnp.asarray(
        np.r_[0.1, -0.05, 0.2, 0.0, 0.0, 0.03].astype(np.float32))))
    cam_opt = np.array(st.kf_Tcw)
    for i in range(Kcap):
        Di = np.asarray(se3.exp_se3(jnp.asarray(
            np.r_[0.1 + 0.03 * i, -0.05, 0.2, 0.0, 0.01 * i, 0.03]
            .astype(np.float32))))
        cam_opt[i] = cam_opt[i] @ np.linalg.inv(Di)
    cam_opt = jnp.asarray(cam_opt)
    pt_opt = jnp.asarray(
        (np.asarray(st.mp_pos[:64]) @ D[:3, :3].T) + D[:3, 3]
    )

    # meanwhile: KF6 (child of KF5) and KF7 (child of KF6) were inserted,
    # plus a new point referenced to KF7 and a RECYCLED point slot
    live = st
    T6 = np.asarray(se3.exp_se3(jnp.asarray(
        np.r_[1.8, 0, 0, 0, 0.1, 0].astype(np.float32))))
    T7 = np.asarray(se3.exp_se3(jnp.asarray(
        np.r_[2.1, 0, 0, 0, 0.12, 0].astype(np.float32))))
    kf_T = np.array(live.kf_Tcw); kf_T[6], kf_T[7] = T6, T7
    kf_valid = np.array(live.kf_valid); kf_valid[6] = kf_valid[7] = True
    parent = np.array(live.kf_parent); parent[6], parent[7] = 5, 6
    frame_id = np.array(live.kf_frame_id); frame_id[6], frame_id[7] = 30, 33
    mp_pos = np.array(live.mp_pos)
    mp_valid = np.array(live.mp_valid)
    mp_ref = np.array(live.mp_ref_kf)
    mp_first = np.array(live.mp_first_kf)
    mp_pos[70] = (1.0, 2.0, 3.0); mp_valid[70] = True
    mp_ref[70] = 7; mp_first[70] = 7
    # slot 5 recycled: same index as a snapshot point but new identity
    mp_first[5] = 7; mp_ref[5] = 7
    live = live._replace(
        kf_Tcw=jnp.asarray(kf_T), kf_valid=jnp.asarray(kf_valid),
        kf_parent=jnp.asarray(parent), kf_frame_id=jnp.asarray(frame_id),
        mp_pos=jnp.asarray(mp_pos), mp_valid=jnp.asarray(mp_valid),
        mp_ref_kf=jnp.asarray(mp_ref), mp_first_kf=jnp.asarray(mp_first),
    )

    out = _gba_fold_in(live, cam_opt, pt_opt, pts, pt_ok,
                       snap_kf_frame_id, snap_kf_valid, snap_mp_first)
    out_T = np.asarray(out.kf_Tcw)
    # snapshot keyframes take the optimized pose directly
    np.testing.assert_allclose(out_T[:6], np.asarray(cam_opt)[:6], atol=1e-5)
    # post-snapshot keyframes keep their CURRENT relative pose to the
    # parent chain: T6_new = T6 @ inv(T5) @ T5_new (and T7 via T6)
    T5_new = np.asarray(cam_opt)[5]
    T6_new = T6 @ np.linalg.inv(np.asarray(st.kf_Tcw)[5]) @ T5_new
    T7_new = T7 @ np.linalg.inv(T6) @ T6_new
    np.testing.assert_allclose(out_T[6], T6_new, atol=1e-5)
    np.testing.assert_allclose(out_T[7], T7_new, atol=1e-5)
    out_p = np.asarray(out.mp_pos)
    # optimized points scattered directly (except the recycled slot)
    same = np.ones(Mp, bool); same[5] = False
    same[40:] = False  # only the first 40 were valid
    np.testing.assert_allclose(out_p[:Mp][same[:Mp] & (np.arange(Mp) < 40)],
                               np.asarray(pt_opt)[same & (np.arange(Mp) < 40)],
                               atol=1e-5)
    # the new point moved rigidly with its reference keyframe KF7
    pc = T7[:3, :3] @ np.asarray((1.0, 2.0, 3.0)) + T7[:3, 3]
    expect = np.linalg.inv(T7_new)[:3, :3] @ pc + np.linalg.inv(T7_new)[:3, 3]
    np.testing.assert_allclose(out_p[70], expect, atol=1e-4)
    # recycled slot 5 was NOT given the stale optimized value; it moved
    # with its (new) reference keyframe instead
    assert not np.allclose(out_p[5], np.asarray(pt_opt)[5], atol=1e-6)
