"""End-to-end stereo slice (KITTI-style rectified pair input)."""

import numpy as np
import pytest

from orbslam2_tpu.config import Sensor
from orbslam2_tpu.io import synthetic
from orbslam2_tpu.pipeline.system import System
from orbslam2_tpu.pipeline.tracking import TrackState
from orbslam2_tpu.utils.evaluation import ate_rmse

from tests.test_e2e_rgbd import small_cfg


@pytest.mark.slow
def test_stereo_tracking_ate():
    cfg = small_cfg(sensor=Sensor.STEREO)
    seq = synthetic.textured_sequence(n_frames=24, kind="forward", cam=cfg.camera)
    slam = System(cfg)
    for i in range(len(seq)):
        left, right, _ = seq.stereo(i)
        slam.track_stereo(left, right, timestamp=i / 30.0)

    assert slam.get_tracking_state() == TrackState.OK
    ts, poses, tracked = slam.frame_poses()
    assert tracked.all(), f"lost {np.count_nonzero(~tracked)} frames"
    rmse = ate_rmse(poses, seq.poses, align=True)
    # stereo depth is matched (not ground truth like RGB-D), so the gate is
    # looser than the RGB-D test
    assert rmse < 0.08, rmse
    assert slam.num_keyframes() >= 2
    assert slam.num_points() > 400
