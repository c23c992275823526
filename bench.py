"""Headline benchmark: full-pipeline tracked frames/s on one TPU chip.

Runs the complete SLAM pipeline (ORB extraction -> matching -> robust pose
optimization -> keyframe insertion -> triangulation/fusion -> local BA) on
a synthetic RGB-D sequence and reports steady-state tracked frames per
second. Baseline: the upstream ORB-SLAM2 CPU implementation is real-time at
~30 fps on TUM-class sequences (BASELINE.md §A), so vs_baseline = fps / 30.

Prints exactly one JSON line.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax

    from orbslam2_tpu.config import (
        CameraConfig,
        MapConfig,
        OrbConfig,
        SlamConfig,
        Sensor,
        TrackingConfig,
    )
    from orbslam2_tpu.io import synthetic
    from orbslam2_tpu.pipeline.system import System
    from orbslam2_tpu.utils.evaluation import ate_rmse

    cfg = SlamConfig(
        sensor=Sensor.RGBD,
        camera=CameraConfig(fx=480.0, fy=480.0, cx=319.5, cy=239.5, bf=240.0, fps=30.0),
        orb=OrbConfig(num_features=1000, feature_slots=1024),
        map=MapConfig(max_keyframes=64, max_points=16384, max_local_points=4096),
        tracking=TrackingConfig(th_depth=100.0),
    )
    n_frames = 40
    warmup = 8
    seq = synthetic.default_sequence(
        n_frames=n_frames, kind="forward", n_points=3000, cam=cfg.camera
    )
    frames = [seq.frame(i) for i in range(n_frames)]

    slam = System(cfg)
    # warmup: triggers all compilations (extract, match, pose opt, BA)
    for i in range(warmup):
        img, depth = frames[i]
        slam.track_rgbd(img, depth, timestamp=i / 30.0)

    t0 = time.perf_counter()
    for i in range(warmup, n_frames):
        img, depth = frames[i]
        slam.track_rgbd(img, depth, timestamp=i / 30.0)
    jax.block_until_ready(slam.map.kf_Tcw)
    dt = time.perf_counter() - t0

    fps = (n_frames - warmup) / dt
    ts, poses, tracked = slam.frame_poses()
    rmse = ate_rmse(poses, seq.poses) if tracked.all() else float("nan")

    print(
        json.dumps(
            {
                "metric": "tracking_fps",
                "value": round(fps, 2),
                "unit": "frames/s/chip",
                "vs_baseline": round(fps / 30.0, 3),
                "extra": {
                    "ate_rmse_m": round(rmse, 4),
                    "frames": n_frames - warmup,
                    "keyframes": slam.num_keyframes(),
                    "points": slam.num_points(),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
