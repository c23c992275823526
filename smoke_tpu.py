"""2-minute on-TPU regression gate (round-3 verdict item 7).

The hermetic CPU suite cannot see TPU-only numerics (the Pallas pose-GN
kernel, bf16 edges, relay dispatch behavior): round 3 shipped a 3x fps
regression with a green CPU suite. This smoke runs N warm frames of the
SAME forward scene as bench.py segment A on the real chip and asserts:

* 0 lost frames,
* ATE within an absolute bound,
* steady-state fps >= 0.8x the previous recorded smoke (SMOKE_BASELINE.json,
  updated on every passing run that beats the recorded number).

Exit code 0 = pass. Prints one JSON line. Run alongside bench.py at round
end and whenever a hot-path change lands.
"""

import json
import os
import sys
import time


def main():
    import jax

    os.makedirs("/root/.cache/jaxcache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np
    import jax.numpy as jnp

    from orbslam2_tpu.config import (
        CameraConfig, MapConfig, OrbConfig, SlamConfig, Sensor, SolverConfig,
        TrackingConfig, VocabConfig,
    )
    from orbslam2_tpu.io import synthetic
    from orbslam2_tpu.pipeline.system import System
    from orbslam2_tpu.utils.evaluation import ate_rmse

    cfg = SlamConfig(
        sensor=Sensor.RGBD,
        camera=CameraConfig(fx=480.0, fy=480.0, cx=319.5, cy=239.5, bf=48.0,
                            fps=30.0),
        orb=OrbConfig(num_features=1000, feature_slots=1024),
        map=MapConfig(max_keyframes=96, max_points=16384, max_local_points=4096),
        tracking=TrackingConfig(th_depth=40.0, pipeline_depth=2),
        solver=SolverConfig(ba_max_points=4096, local_ba_iters_first=3,
                            local_ba_iters_second=4,
                            ba_max_local_kfs=24, ba_max_fixed_kfs=16),
        vocab=VocabConfig(warmup_correction=False),
    )
    n, warm = 48, 8
    seq = synthetic.textured_sequence(n_frames=n, kind="forward", cam=cfg.camera)
    frames = [tuple(jax.device_put(jnp.asarray(a)) for a in seq.frame(i))
              for i in range(n)]
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
    _, poses, tracked = slam.frame_poses()
    tracked_np = np.asarray(tracked)
    ate = float(ate_rmse(poses[tracked_np], seq.poses[tracked_np], align=True))
    lost = int((~tracked_np).sum())
    fps = (n - warm) / sum(wall[warm:])

    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "SMOKE_BASELINE.json")
    prev = None
    if os.path.exists(base_path):
        with open(base_path) as f:
            prev = json.load(f).get("fps")

    ok = lost == 0 and ate <= 0.005
    # relay variance is ~±1.5 fps run-to-run (CLAUDE.md); 0.8x bounds a
    # real regression, not noise
    if prev is not None:
        ok = ok and fps >= 0.8 * prev
    out = {
        "metric": "tpu_smoke",
        "value": round(fps, 2),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / prev, 3) if prev else None,
        "ok": ok,
        "extra": {"ate_rmse_m": round(ate, 4), "lost_frames": lost,
                  "frames": n - warm, "prev_fps": prev,
                  "device": str(jax.devices()[0])},
    }
    print(json.dumps(out))
    if ok and (prev is None or fps > prev):
        with open(base_path, "w") as f:
            json.dump({"fps": round(fps, 2), "ate": round(ate, 4)}, f)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
