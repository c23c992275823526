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
    # mono: allow the first few frames before initialization succeeds
    n_lost = int(np.count_nonzero(~tracked))
    assert n_lost <= 6, f"{n_lost} untracked frames"
    sel = tracked
    rmse = ate_rmse(poses[sel], seq.poses[sel], align=True, with_scale=True)
    # monocular without loop closure drifts in scale; gate loosely here
    # (loop closing is exercised separately)
    assert rmse < 0.25, rmse
    assert slam.num_keyframes() >= 3
    assert slam.num_points() > 200
