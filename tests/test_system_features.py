"""System-level features: localization mode, map save/load, trajectory
export, calibration change."""

import numpy as np
import pytest

from orbslam2_tpu.io import synthetic, trajectory
from orbslam2_tpu.pipeline.system import System
from orbslam2_tpu.pipeline.tracking import TrackState

from tests.test_e2e_rgbd import small_cfg


@pytest.fixture(scope="module")
def mapped_session(tmp_path_factory):
    cfg = small_cfg()
    seq = synthetic.textured_sequence(n_frames=14, kind="forward", cam=cfg.camera)
    slam = System(cfg)
    for i in range(len(seq)):
        img, depth = seq.frame(i)
        slam.track_rgbd(img, depth, timestamp=i / 30.0)
    assert slam.get_tracking_state() == TrackState.OK
    return cfg, seq, slam


@pytest.mark.slow
class TestSystemFeatures:
    def test_localization_mode_no_new_keyframes(self, mapped_session):
        cfg, seq, slam = mapped_session
        n_kf = slam.num_keyframes()
        slam.activate_localization_mode()
        for i in range(8, 14):
            img, depth = seq.frame(i)
            slam.track_rgbd(img, depth, timestamp=(14 + i) / 30.0)
        assert slam.get_tracking_state() == TrackState.OK
        assert slam.num_keyframes() == n_kf  # map frozen
        slam.deactivate_localization_mode()

    def test_save_load_map_roundtrip(self, mapped_session, tmp_path):
        cfg, seq, slam = mapped_session
        path = str(tmp_path / "map.npz")
        slam.save_map(path)
        slam2 = System(cfg)
        slam2.load_map(path)
        assert slam2.num_keyframes() == slam.num_keyframes()
        assert slam2.num_points() == slam.num_points()
        # a loaded map supports localization: relocalize from scratch
        slam2.activate_localization_mode()
        slam2.tracker.state = TrackState.LOST
        img, depth = seq.frame(10)
        recovered = False
        for j in range(2):
            slam2.track_rgbd(img, depth, timestamp=j / 30.0)
            if slam2.get_tracking_state() == TrackState.OK:
                recovered = True
                break
        assert recovered
        T = slam2.results[-1].Tcw
        e = T @ np.linalg.inv(seq.poses[10])
        assert np.linalg.norm(e[:3, 3]) < 0.1

    def test_trajectory_export(self, mapped_session, tmp_path):
        cfg, seq, slam = mapped_session
        p_tum = str(tmp_path / "traj.txt")
        p_kitti = str(tmp_path / "traj_kitti.txt")
        p_kf = str(tmp_path / "kf.txt")
        slam.save_trajectory_tum(p_tum)
        slam.save_trajectory_kitti(p_kitti)
        slam.save_keyframe_trajectory_tum(p_kf)
        ts, poses = trajectory.load_tum(p_tum)
        assert len(ts) >= 14
        kitti_lines = open(p_kitti).read().strip().split("\n")
        assert len(kitti_lines[0].split()) == 12
        ts_kf, poses_kf = trajectory.load_tum(p_kf)
        assert len(ts_kf) == slam.num_keyframes()

    def test_change_calibration(self, mapped_session):
        cfg, seq, slam = mapped_session
        import dataclasses

        new_cam = dataclasses.replace(cfg.camera, fx=481.0, fy=481.0)
        slam.change_calibration(new_cam)
        assert slam.cfg.camera.fx == 481.0
        # the session keeps tracking after the swap
        img, depth = seq.frame(12)
        slam.track_rgbd(img, depth, timestamp=99.0)
        assert slam.get_tracking_state() == TrackState.OK
