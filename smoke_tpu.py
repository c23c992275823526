"""On-TPU regression gate (round-3 verdict item 7; extended round 5).

The hermetic CPU suite cannot see TPU-only numerics (the Pallas pose-GN
kernel, bf16 edges, relay dispatch behavior): round 3 shipped a 3x fps
regression with a green CPU suite, and round 4 shipped a DEAD loop closer
behind a smoke gate that only measured the forward segment (verdict weak
#2: "a gate that doesn't cover the flagship capability is not a gate").

Two segments on the real chip, mirroring bench.py:

* forward dolly (48 frames): 0 lost, ATE <= 0.005, steady fps >= 0.8x the
  ROLLING MEDIAN of the last 5 passing runs (SMOKE_BASELINE.json; round 4
  used best-ever semantics, whose floor drifted above what the shipped
  config could do);
* orbit + revisit (the flagship capability) at the 320x240 e2e config
  (tests/test_loop_reloc.py::test_orbit_loop_closes): loops_closed >= 1,
  0 lost, post-closure ATE <= 0.12 (healthy measures ~0.05-0.08 vs
  0.33-0.69 for the round-4 regression class this gate exists to catch).
  The 640p bench orbit is NOT used here: it carries two pre-existing
  mid-orbit coverage losses (frames ~76/148, recovered by reloc within 3
  frames — tracked in PARITY "Known gaps") that would mask the
  loop-closure signal this gate watches.

Exit code 0 = pass. Prints one JSON line. Run before EVERY snapshot that
touches pipeline/solver/map code.
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

    import dataclasses

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

    def run(cfg, seq, n):
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
        ate = float(ate_rmse(poses[tracked_np], seq.poses[tracked_np],
                             align=True)) if tracked_np.any() else float("nan")
        return slam, wall, ate, int((~tracked_np).sum())

    # ---- forward segment: fps + accuracy floor -------------------------
    n, warm = 48, 8
    seq = synthetic.textured_sequence(n_frames=n, kind="forward", cam=cfg.camera)
    slam, wall, ate, lost = run(cfg, seq, n)
    fps = (n - warm) / sum(wall[warm:])

    # ---- orbit segment: the flagship capability must WORK --------------
    camB = CameraConfig(fx=240.0, fy=240.0, cx=159.5, cy=119.5, bf=24.0,
                        fps=30.0, width=320, height=240)
    cfgB = SlamConfig(
        sensor=Sensor.RGBD,
        camera=camB,
        orb=OrbConfig(num_features=400, feature_slots=512,
                      candidates_per_level=1024),
        map=MapConfig(max_keyframes=96, max_points=16384,
                      max_local_points=4096),
        tracking=TrackingConfig(th_depth=130.0),
    )
    nB_orbit, nB_rev = 170, 35
    seqB = synthetic.textured_sequence(n_frames=nB_orbit, kind="orbit",
                                       cam=camB)
    seqB = dataclasses.replace(
        seqB, poses=np.concatenate([seqB.poses, seqB.poses[:nB_rev]]))
    slamB, wallB, ateB, lostB = run(cfgB, seqB, nB_orbit + nB_rev)
    loops = slamB.loop_closer.loops_closed if slamB.loop_closer else 0

    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "SMOKE_BASELINE.json")
    hist = []
    if os.path.exists(base_path):
        with open(base_path) as f:
            rec = json.load(f)
        hist = rec.get("history", [rec["fps"]] if "fps" in rec else [])
    prev = float(np.median(hist)) if hist else None

    ok_fwd = lost == 0 and ate <= 0.005
    ok_loop = loops >= 1 and lostB == 0 and ateB <= 0.12
    # relay variance is ~±1.5 fps run-to-run (CLAUDE.md); 0.8x of the
    # rolling median bounds a real regression, not noise
    ok_fps = prev is None or fps >= 0.8 * prev
    ok = ok_fwd and ok_loop and ok_fps
    out = {
        "metric": "tpu_smoke",
        "value": round(fps, 2),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / prev, 3) if prev else None,
        "ok": ok,
        "extra": {"ate_rmse_m": round(ate, 4), "lost_frames": lost,
                  "frames": n - warm, "median_prev_fps": prev,
                  "orbit": {"loops_closed": loops, "lost": lostB,
                            "ate_rmse_m": round(ateB, 4),
                            "ok": ok_loop},
                  "device": str(jax.devices()[0])},
    }
    print(json.dumps(out))
    if ok:
        hist = (hist + [round(fps, 2)])[-5:]
        with open(base_path, "w") as f:
            json.dump({"history": hist, "ate": round(ate, 4)}, f)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
