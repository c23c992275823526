"""Time bench.py startup phases on TPU: init, vocab+warmups, first frames."""
import dataclasses
import os
import time

import jax
os.makedirs("/root/.cache/jaxcache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import jax.numpy as jnp

T0 = time.perf_counter()
def mark(s):
    print(f"{time.perf_counter()-T0:8.1f}s  {s}", flush=True)

from orbslam2_tpu.config import (
    CameraConfig, MapConfig, OrbConfig, SlamConfig, Sensor, SolverConfig,
    TrackingConfig, VocabConfig,
)
from orbslam2_tpu.io import synthetic
from orbslam2_tpu.pipeline.system import System
mark("imports")

base = SlamConfig(
    sensor=Sensor.RGBD,
    camera=CameraConfig(fx=480.0, fy=480.0, cx=319.5, cy=239.5, bf=48.0, fps=30.0),
    orb=OrbConfig(num_features=1000, feature_slots=1024),
    map=MapConfig(max_keyframes=96, max_points=16384, max_local_points=4096),
    tracking=TrackingConfig(th_depth=40.0, pipeline_depth=2),
    solver=SolverConfig(ba_max_points=2048, local_ba_iters_first=3,
                        local_ba_iters_second=4,
                        ba_max_local_kfs=24, ba_max_fixed_kfs=16),
    vocab=VocabConfig(warmup_correction=True, warmup_reloc=True),
)
seq = synthetic.textured_sequence(n_frames=16, kind="forward", cam=base.camera)
mark("sequence gen")
frames = [tuple(jax.device_put(jnp.asarray(a)) for a in seq.frame(i))
          for i in range(16)]
mark("staging")
slam = System(base)
mark("System()")
for i in range(3):
    slam.track_rgbd(*frames[i], timestamp=i / 30.0)
    mark(f"frame {i}  (vocab load + loop-closer warmups land on first KF)")
for i in range(3, 16):
    slam.track_rgbd(*frames[i], timestamp=i / 30.0)
mark("frames 3-15")
slam.flush()
mark("flush")
