"""Component-level profile of the fused frame program with a LIVE map.

Builds a real session (bench config), then times each stage of
fused.track_step + extraction in scan-repetition throughput mode.
"""
import time
import jax, jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from orbslam2_tpu.config import (CameraConfig, MapConfig, OrbConfig, SlamConfig,
                                 Sensor, SolverConfig, TrackingConfig)
from orbslam2_tpu.io import synthetic
from orbslam2_tpu.pipeline.system import System
from orbslam2_tpu.pipeline import fused, tracking as trk
from orbslam2_tpu.ops import orb as orb_mod
from orbslam2_tpu.solvers import pose_opt

cfg = SlamConfig(
    sensor=Sensor.RGBD,
    camera=CameraConfig(fx=480.0, fy=480.0, cx=319.5, cy=239.5, bf=48.0, fps=30.0),
    orb=OrbConfig(num_features=1000, feature_slots=1024),
    map=MapConfig(max_keyframes=64, max_points=16384, max_local_points=4096),
    tracking=TrackingConfig(th_depth=40.0, pipeline_depth=0),
    solver=SolverConfig(ba_max_points=2048, local_ba_iters_first=3,
                        local_ba_iters_second=4,
                        ba_max_local_kfs=24, ba_max_fixed_kfs=16),
)
seq = synthetic.textured_sequence(n_frames=14, kind="forward", cam=cfg.camera)
slam = System(cfg, enable_loop_closing=False)
for i in range(14):
    img, depth = seq.frame(i)
    slam.track_rgbd(img, depth, timestamp=i / 30.0)
slam.flush()
print("kfs", slam.num_keyframes(), "pts", slam.num_points(), flush=True)

state = slam.map
t = slam.tracker
frame = t.last_frame
K = t.K
p = t._params
img, depth = seq.frame(13)
img = jnp.asarray(img); depth = jnp.asarray(depth)
ref_kf = jnp.int32(t.ref_kf)
last_Tcw = t.last_Tcw
bind = t.last_point_idx

R = 30

def timeit(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = f(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / R * 1e3)
    print(f"{name:34s}: {best:7.3f} ms/rep", flush=True)
    return best

def rep(fn):
    def run(*args):
        def body(c, _):
            return c, fn(*args)
        return jax.lax.scan(body, 0, None, length=R)
    return run

# 1. extraction
timeit("extract", rep(lambda im: orb_mod.extract.__wrapped__(im, cfg.orb)), img)

# 2. reference KF match
def refmatch(fr):
    return trk.reference_kf_match.__wrapped__(
        state.kf_desc[ref_kf], state.kf_point_idx[ref_kf],
        state.kf_angle[ref_kf], state.kf_feat_valid[ref_kf],
        state.mp_valid, fr)
timeit("reference_kf_match", rep(refmatch), frame)

bind_ref = refmatch(frame)

# 3. build obs + pose opt 2x6 (coarse)
def coarse(fr):
    obs = trk.build_pose_observations.__wrapped__(
        bind_ref, fr, state.mp_pos, state.mp_valid, p.inv_sigma2)
    r = pose_opt.pose_optimize(last_Tcw, obs, K, rounds=2, iters=6)
    return r.Tcw
timeit("build_obs + pose_opt 2x6", rep(coarse), frame)

# 4. gather_local_map
def gather(b):
    return trk.gather_local_map.__wrapped__(
        state, b, max_local_kfs=cfg.map.max_local_keyframes,
        max_local_points=cfg.map.max_local_points)
timeit("gather_local_map", rep(gather), bind)

lkf, lkf_mask, lpts, lpts_mask, _ = gather(bind)
bounds = (p.bounds[0], p.bounds[1], p.bounds[2], p.bounds[3])

# 5. search_local_points
def search(Tcw, bseed, rm):
    return trk.search_local_points.__wrapped__(
        state, lpts, lpts_mask, Tcw, bseed, frame, K,
        p.scale_factors, bounds, rm, num_levels=cfg.orb.num_levels,
        max_dist=p.match_max_dist)
timeit("search_local_points", rep(search), last_Tcw, bind, jnp.float32(1.0))

# 6. full local pass (search + obs + 4x6 opt)
def local_pass(Tcw, bseed):
    b, vis = search(Tcw, bseed, jnp.float32(1.0))
    obs = trk.build_pose_observations.__wrapped__(
        b, frame, state.mp_pos, state.mp_valid, p.inv_sigma2)
    r = pose_opt.pose_optimize(Tcw, obs, K, rounds=4, iters=6)
    return r.Tcw
timeit("local pass (search+obs+4x6)", rep(local_pass), last_Tcw, bind)

# 7. full track_step (threads state through the scan carry)
def full_track(st):
    def body(c, _):
        st2, out = fused.track_step.__wrapped__(
            c, frame, t.last_frame.xy, bind, t.last_frame.octave,
            t.last_frame.angle, t.last_frame.desc, last_Tcw,
            jnp.eye(4), jnp.asarray(True), ref_kf, K, p,
            max_local_kfs=cfg.map.max_local_keyframes,
            max_local_points=cfg.map.max_local_points,
            num_levels=cfg.orb.num_levels)
        return st2, out.n_inliers
    return jax.lax.scan(body, st, None, length=R)
timeit("track_step (full)", full_track, state)

# 8. update_seen_counters
def seen(st):
    def body(c, _):
        c2 = trk.update_seen_counters.__wrapped__(
            c, lpts, lpts_mask, jnp.clip(bind, 0, c.capacity_mp - 1), bind >= 0)
        return c2, 0
    return jax.lax.scan(body, st, None, length=R)
timeit("update_seen_counters", seen, state)
