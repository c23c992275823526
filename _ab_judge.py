"""A/B: forward-dolly RGB-D tracking with vs without the Pallas pose kernel.

Usage: python /tmp/ab_pallas.py   (set ORBSLAM_TPU_NO_PALLAS=1 for the B arm)
"""
import dataclasses, json, os, sys, time

import numpy as np

import jax

os.makedirs("/root/.cache/jaxcache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from orbslam2_tpu.config import (CameraConfig, MapConfig, OrbConfig, SlamConfig,
                                 Sensor, SolverConfig, TrackingConfig, VocabConfig)
from orbslam2_tpu.io import synthetic
from orbslam2_tpu.pipeline.system import System
from orbslam2_tpu.utils.evaluation import ate_rmse

cfg = SlamConfig(
    sensor=Sensor.RGBD,
    camera=CameraConfig(fx=480.0, fy=480.0, cx=319.5, cy=239.5, bf=48.0, fps=30.0),
    orb=OrbConfig(num_features=1000, feature_slots=1024),
    map=MapConfig(max_keyframes=96, max_points=16384, max_local_points=4096),
    tracking=TrackingConfig(th_depth=40.0, pipeline_depth=2),
    solver=SolverConfig(ba_max_points=2048, local_ba_iters_first=3,
                        local_ba_iters_second=4,
                        ba_max_local_kfs=24, ba_max_fixed_kfs=16),
    vocab=VocabConfig(warmup_correction=False),
)

n = 48
seq = synthetic.textured_sequence(n_frames=n, kind="forward", cam=cfg.camera)
frames = [tuple(jax.device_put(jnp.asarray(a)) for a in seq.frame(i)) for i in range(n)]
slam = System(cfg)
wall = []
for i in range(n):
    img, depth = frames[i]
    t0 = time.perf_counter()
    slam.track_rgbd(img, depth, timestamp=i / 30.0)
    wall.append(time.perf_counter() - t0)
t0 = time.perf_counter()
slam.flush()
wall[-1] += time.perf_counter() - t0
ts, poses, tracked = slam.frame_poses()
sel = tracked
rmse = float(ate_rmse(poses[sel], seq.poses[sel], align=True)) if sel.any() else float("nan")
w = 12
print(json.dumps({
    "no_pallas": bool(os.environ.get("ORBSLAM_TPU_NO_PALLAS")),
    "fps_warm": round((n - w) / sum(wall[w:]), 2),
    "ate_rmse_m": round(rmse, 4),
    "lost": int((~tracked).sum()),
    "keyframes": slam.num_keyframes(),
    "per_frame_ms_tail": [round(x * 1e3, 1) for x in wall[-12:]],
}))
