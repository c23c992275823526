"""End-to-end monocular slice: H/F RANSAC bootstrap + up-to-scale tracking
(SURVEY.md §7 step 6)."""

import numpy as np
import pytest

from orbslam2_tpu.config import Sensor
from orbslam2_tpu.io import synthetic
from orbslam2_tpu.pipeline.system import System
from orbslam2_tpu.pipeline.tracking import TrackState
from orbslam2_tpu.utils.evaluation import ate_rmse

from orbslam2_tpu.config import (
    CameraConfig,
    MapConfig,
    OrbConfig,
    SlamConfig,
    TrackingConfig,
)


def mono_cfg():
    return SlamConfig(
        sensor=Sensor.MONOCULAR,
        camera=CameraConfig(fx=480.0, fy=480.0, cx=319.5, cy=239.5, bf=240.0, fps=30.0),
        # mono init needs a dense, stable level-0 feature set (the reference
        # doubles its ORB budget during initialization, src/Tracking.cc:125)
        orb=OrbConfig(num_features=1200, feature_slots=1280, candidates_per_level=4096),
        map=MapConfig(max_keyframes=32, max_points=8192, max_local_points=4096),
        # kf_min_gap: mono triangulation needs baseline between keyframes;
        # back-to-back keyframes starve the map (parallax gate rejects all)
        tracking=TrackingConfig(th_depth=100.0, mono_init_min_matches=50, kf_min_gap=2),
    )


@pytest.mark.slow
def test_mono_tracking_ate():
    cfg = mono_cfg()
    seq = synthetic.textured_sequence(n_frames=24, kind="lateral", cam=cfg.camera)
    slam = System(cfg)
    for i in range(len(seq)):
        img, _ = seq.frame(i)
        slam.track_monocular(img, timestamp=i / 30.0)

    assert slam.get_tracking_state() == TrackState.OK
    ts, poses, tracked = slam.frame_poses()
    # mono: the only untracked frames allowed are the initialization
    # window itself (H/F bootstrap needs a few frames of baseline);
    # measured: 4 untracked, ATE 0.0098 m
    n_lost = int(np.count_nonzero(~tracked))
    assert n_lost <= 4, f"{n_lost} untracked frames"
    assert tracked[6:].all(), "tracking dropped after initialization"
    sel = tracked
    rmse = ate_rmse(poses[sel], seq.poses[sel], align=True, with_scale=True)
    assert rmse < 0.05, rmse
    assert slam.num_keyframes() >= 3
    assert slam.num_points() > 200


def _mono_orbit_cfg():
    """Full-resolution mono orbit config: at 320x240 the orbit's KF-pair
    parallax sits right at the triangulation gate (cos 0.9998 ~= 1.15
    degrees; reference src/LocalMapping.cc:317) and the map starves —
    at 640x480 the same geometry triangulates reliably."""
    return SlamConfig(
        sensor=Sensor.MONOCULAR,
        camera=CameraConfig(fx=480.0, fy=480.0, cx=319.5, cy=239.5,
                            bf=48.0, fps=30.0),
        orb=OrbConfig(num_features=1200, feature_slots=1280,
                      candidates_per_level=4096),
        map=MapConfig(max_keyframes=96, max_points=16384,
                      max_local_points=4096),
        tracking=TrackingConfig(th_depth=130.0, mono_init_min_matches=50,
                                kf_min_gap=2),
    )


@pytest.mark.slow
def test_mono_orbit_loop_corrects_scale():
    """Monocular scale-drift correction through the 7-DoF essential graph
    (VERDICT r2 #6) — the stated purpose of Sim3 pose-graph optimization
    (reference src/Optimizer.cc:773-1039). A full 360-degree orbit plus
    revisit, run twice: with loop closing the drifted scale is pulled
    back (a single global Sim3 alignment cannot absorb scale DRIFT, only
    a constant offset, so the corrected run must align strictly better).

    History of the measured margin: round 3 measured 0.0124 m corrected
    vs 0.0285 m drift (2.3x) and asserted a 1.8x ratio. Round-5 tracking
    improvements (anchor-preserving recycling, stale-binding scrub,
    motion model kept across map moves) HALVED the uncorrected drift to
    ~0.0135 m — near the corrected floor — so a fixed ratio no longer
    discriminates; what remains load-bearing is that the correction (a)
    fires, (b) never degrades the trajectory (it measurably did while
    the round-4/5 essential-graph no-op bug and eager acceptance gates
    were live: 0.065 vs 0.045 drift-only on the RGB-D orbit), and (c)
    meets an absolute quality bar."""
    import dataclasses

    cfg = _mono_orbit_cfg()
    seq = synthetic.textured_sequence(n_frames=170, kind="orbit",
                                      cam=cfg.camera)
    seq = dataclasses.replace(
        seq, poses=np.concatenate([seq.poses, seq.poses[:35]])
    )
    rendered = [seq.frame(i)[0] for i in range(len(seq))]

    def run(enable_loop):
        slam = System(cfg, enable_loop_closing=enable_loop)
        for i, img in enumerate(rendered):
            slam.track_monocular(img, timestamp=i / 30.0)
        slam.flush()
        ts, poses, tracked = slam.frame_poses()
        rmse = ate_rmse(poses[tracked], seq.poses[tracked],
                        align=True, with_scale=True)
        loops = slam.loop_closer.loops_closed if slam.loop_closer else 0
        return float(rmse), int((~tracked).sum()), loops

    ate_loop, lost_loop, loops = run(True)
    ate_drift, lost_drift, _ = run(False)

    assert loops >= 1, "mono loop did not close"
    assert lost_loop <= 2, f"lost {lost_loop} frames with loop closing"
    assert ate_loop < 0.015, ate_loop
    # the correction must strictly beat the uncorrected drift (it is NOT
    # automatic: a bad Sim3 or under-converged GBA makes it worse)
    assert ate_drift > ate_loop, (ate_drift, ate_loop)
