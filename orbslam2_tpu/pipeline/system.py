"""Public session API — the TPU analogue of `ORB_SLAM2::System`
(reference include/System.h:65-136, src/System.cc).

Where the reference spawns LocalMapping/LoopClosing/Viewer threads and
cross-wires raw pointers (src/System.cc:85-115), this engine runs the
stages synchronously in a deterministic order per frame: track -> (if new
keyframe) local mapping -> (periodically) loop closing. The map is a single
device-resident pytree passed between jitted stages — no mutexes, no
condition variables, bitwise-reproducible runs.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from orbslam2_tpu.config import SlamConfig, Sensor
from orbslam2_tpu.io import trajectory as traj_io
from orbslam2_tpu.pipeline.frame import FrameBuilder, FrameData
from orbslam2_tpu.pipeline.local_mapping import LocalMapper
from orbslam2_tpu.pipeline.tracking import Tracker, TrackResult, TrackState
from orbslam2_tpu.slam_map import map_state as ms
from orbslam2_tpu.utils.eventlog import EventLog


class _TurboRec:
    """In-flight pipelined frame: device results + raw inputs (retained so
    an invalidated dispatch can be reprocessed on the exact path)."""

    __slots__ = ("res", "frame", "inputs", "prev_anchors")

    def __init__(self, res, frame, inputs, prev_anchors):
        self.res = res
        self.frame = frame
        self.inputs = inputs
        self.prev_anchors = prev_anchors


class System:
    """One SLAM session.

    Usage:
        slam = System(cfg)
        for image, depth, t in frames:
            Tcw = slam.track_rgbd(image, depth, t)
        slam.save_trajectory_tum("out.txt")
    """

    def __init__(
        self,
        cfg: SlamConfig,
        enable_mapping: bool = True,
        enable_loop_closing: bool = True,
        log_path: Optional[str] = None,
    ):
        self.cfg = cfg
        # per-frame event/inlier stream (in-memory; JSONL when log_path set).
        # Records are built only from scalars the pipeline already pulls —
        # logging never adds a device round trip.
        self.log = EventLog(log_path)
        # TPU lowers f32 matmuls to bf16 passes by default; the SE3 chains
        # and normal-equation products in the solvers need full f32 (CPU and
        # TPU runs diverged: same sequence tracked 40/40 on CPU, lost frames
        # on-chip). Descriptor matching uses explicit precisions already.
        jax.config.update("jax_default_matmul_precision", "highest")
        self.builder = FrameBuilder(cfg)
        self.map = ms.allocate(cfg.map, cfg.orb)
        self.tracker = Tracker(cfg, self.builder, self.map)
        self.local_mapper = LocalMapper(cfg, self.builder.K, self.tracker.bounds)
        self.enable_mapping = enable_mapping
        self.enable_loop_closing = enable_loop_closing
        self.localization_only = False
        self.results: list[TrackResult] = []
        # loop closer is created lazily: its vocabulary is trained on the
        # first keyframe's descriptors (no shipped DBoW2 file; SURVEY.md §2a)
        self.loop_closer = None
        self._loop_key = None
        self._dummy_b = None
        # pipelined tracking (cfg.tracking.pipeline_depth >= 1): FIFO of
        # in-flight frame records whose host pulls are deferred, plus the
        # device-side anchor scalars (has_velocity / ref_kf /
        # frames_since_kf) selected by the previous frame's program.
        # Depth 1 overlaps each pull with one frame of device compute;
        # depth 2 gives the pull a FULL frame of slack, so by resolve time
        # the async host copy has already landed and the get is free.
        self._pending: list[_TurboRec] = []
        self._anchor = None
        self._in_resolve = False

    # -- per-frame entries (reference src/System.cc:119-266) ---------------

    def track_rgbd(self, image, depth, timestamp: float = 0.0) -> np.ndarray:
        t = self.tracker
        if (
            self.localization_only
            and t.last_frame is not None
            and (t.mb_vo or t.state == TrackState.LOST)
        ):
            # mbVO dual-hypothesis mode (reference src/Tracking.cc:365-412)
            t.map = self.map
            frame = self.builder.rgbd(jnp.asarray(image), jnp.asarray(depth), timestamp)
            reloc_db = self.loop_closer.db if self.loop_closer is not None else None
            res = t.localization_vo_step(frame, reloc_db)
            self.results.append(res)
            self.log.emit("frame", frame_id=int(frame.frame_id),
                          t=float(frame.timestamp),
                          state="VO" if t.mb_vo else res.state.name,
                          n_inliers=int(res.num_inliers), is_kf=False)
            return res.Tcw
        if t.state == TrackState.OK:
            return self._track_turbo("rgbd", image, depth, timestamp)
        frame = self.builder.rgbd(jnp.asarray(image), jnp.asarray(depth), timestamp)
        return self._track(frame)

    def _track_turbo(self, sensor: str, a, b, timestamp: float):
        """Steady-state frame (any sensor): ONE device dispatch covering
        frame build + tracking + on-device keyframe policy +
        (conditionally) keyframe/mapping/local-BA, plus one small
        device_get. `a`/`b` are (image, depth) for RGB-D, (left, right)
        for stereo, (image, ignored) for monocular.

        With cfg.tracking.pipeline_depth >= 1 the host pull of the
        PREVIOUS frame's results is deferred until after this frame's
        dispatch, so the ~40 ms relay round trip overlaps device compute
        (the device-side `next_*` anchor selections in FrameStepOut make
        the dispatch independent of the previous pull). Keyframe
        bookkeeping and loop closing then run one frame late — like the
        reference's asynchronous LocalMapping/LoopClosing threads."""
        rec = self._turbo_dispatch(sensor, a, b, timestamp)
        pipelined = (
            self.cfg.tracking.pipeline_depth >= 1
            and not self.localization_only
            and self.tracker.n_keyframes >= 1
        )
        if not pipelined:
            while self._pending:  # draining out of pipelined mode
                prev = self._pending.pop(0)
                if self._turbo_resolve(prev):
                    self._anchor = None
                    return self._reprocess_stale(rec)
            self._turbo_resolve(rec)
            return self.results[-1].Tcw
        self._pending.append(rec)
        while len(self._pending) > self.cfg.tracking.pipeline_depth:
            prev = self._pending.pop(0)
            if self._turbo_resolve(prev):
                # every in-flight frame was dispatched against anchors that
                # an event (LOST / auto-reset / loop correction) just
                # invalidated: drop their device results and reprocess the
                # raw inputs on the exact path (the reference pays the same
                # re-track when its asynchronous loop correction lands)
                self._anchor = None
                return self._reprocess_stale()
        # lazy device handle: converting to numpy synchronizes, so callers
        # that ignore the per-frame pose never pay the round trip
        return rec.res.track.Tcw

    def _reprocess(self, rec):
        sensor, a, b, timestamp = rec.inputs
        if self.tracker.state == TrackState.OK:
            return self._track_turbo(sensor, a, b, timestamp)
        return self._track(self._build_frame(sensor, a, b, timestamp))

    def _reprocess_stale(self, extra=None):
        """Reprocess every dropped in-flight frame in dispatch order (their
        device results were computed against now-invalid anchors)."""
        stale = self._pending
        self._pending = []
        if extra is not None:
            stale = stale + [extra]
        out = None
        for s in stale:
            out = self._reprocess(s)
        return out

    def _build_frame(self, sensor: str, a, b, timestamp: float) -> FrameData:
        if sensor == "rgbd":
            return self.builder.rgbd(jnp.asarray(a), jnp.asarray(b), timestamp)
        if sensor == "stereo":
            return self.builder.stereo(jnp.asarray(a), jnp.asarray(b), timestamp)
        return self.builder.monocular(jnp.asarray(a), timestamp)

    def _turbo_dispatch(self, sensor: str, a, b, timestamp: float):
        from orbslam2_tpu.pipeline import fused

        t = self.tracker
        cfg = self.cfg
        mapper = self.local_mapper
        sc = cfg.solver
        t.map = self.map
        if t._params is None:
            t._ensure_params()
        fid = self.builder._fresh_id()
        window = mapper.probation_window()
        if self._anchor is not None:
            velocity, has_vel, ref_kf_in, fsk_in = self._anchor
        else:
            velocity = t.velocity if t.velocity is not None else jnp.eye(4)
            has_vel = jnp.asarray(t.velocity is not None)
            ref_kf_in = jnp.int32(t.ref_kf)
            fsk_in = jnp.int32(t.frames_since_kf)
        if b is None:
            if self._dummy_b is None:
                self._dummy_b = jnp.zeros((), jnp.float32)
            b = self._dummy_b
        state, frame, res = fused.frame_and_keyframe_step(
            self.map, jnp.asarray(a), jnp.asarray(b), jnp.int32(fid),
            t.last_frame.xy, t.last_point_idx,
            t.last_frame.octave, t.last_frame.angle, t.last_frame.desc,
            t.last_Tcw, velocity, has_vel,
            ref_kf_in, fsk_in,
            jnp.int32(t.n_keyframes),
            jnp.asarray(self.enable_mapping and not self.localization_only),
            window, t.K, t._params,
            jnp.float32(1.0 / cfg.tracking.depth_map_factor),
            mapper.level_sigma2, mapper.inv_sigma2, cfg.orb,
            scale_factor_last=float(cfg.orb.scale_factor ** (cfg.orb.num_levels - 1)),
            baseline=float(cfg.camera.baseline),
            covis_threshold=cfg.map.covis_threshold,
            max_local_kfs=cfg.map.max_local_keyframes,
            max_local_points=cfg.map.max_local_points,
            num_levels=cfg.orb.num_levels,
            has_distortion=cfg.camera.has_distortion(),
            n_neighbors=5,
            create_close_points=cfg.sensor != Sensor.MONOCULAR,
            max_local=sc.ba_max_local_kfs, max_fixed=sc.ba_max_fixed_kfs,
            max_points=sc.ba_max_points,
            obs_slots=min(sc.ba_max_obs_per_point, int(self.map.obs_slots)),
            iters1=sc.local_ba_iters_first, iters2=sc.local_ba_iters_second,
            max_gap=max(int(cfg.camera.fps) // 2, 5),
            min_gap=cfg.tracking.kf_min_gap,
            kf_ratio=0.75 if cfg.sensor != Sensor.MONOCULAR else 0.9,
            use_close_cond=cfg.sensor != Sensor.MONOCULAR,
            sensor=sensor,
        )
        self.map = state
        t.map = state
        frame = frame._replace(frame_id=fid, timestamp=timestamp)
        prev_anchors = (t.last_frame, t.last_point_idx, t.last_Tcw)
        # advance the device-side anchors NOW (no host sync): the next
        # dispatch can proceed before this frame's results are pulled
        t.last_frame = frame
        t.last_point_idx = res.next_point_idx
        t.last_Tcw = res.next_Tcw
        self._anchor = (
            res.next_velocity, res.accept, res.next_ref_kf,
            res.next_frames_since_kf,
        )
        # start the host copy of the small result scalars NOW: by the time
        # _turbo_resolve pulls them (one frame later in pipelined mode) the
        # bytes are already on the host and the get does not pay the relay
        # round trip again
        try:
            for arr in (res.track.Tcw, res.track.ok, res.accept,
                        res.track.n_inliers, res.is_kf, res.kf_id, res.kf_Tcw,
                        res.window_keep, res.new_pids, res.cull_ids,
                        res.cull_red):
                arr.copy_to_host_async()
        except (AttributeError, RuntimeError):
            pass
        return _TurboRec(res, frame, (sensor, a, b, timestamp), prev_anchors)

    def _turbo_resolve(self, rec) -> bool:
        """Host pull + bookkeeping for a dispatched frame. Returns True
        when an event occurred that invalidates any in-flight dispatch
        (LOST, auto-reset, loop correction)."""
        from orbslam2_tpu.geometry import se3

        t = self.tracker
        cfg = self.cfg
        mapper = self.local_mapper
        res, frame = rec.res, rec.frame
        # finalize a loop detection dispatched at an earlier keyframe: its
        # device work and host copy overlapped the frames in between
        # (reference: the LoopClosing thread runs fully asynchronously)
        event = False
        if (
            self.enable_loop_closing
            and self.loop_closer is not None
            and self.loop_closer._pending_detect is not None
        ):
            event = self._finalize_loop_detection()
        # ONE host pull per frame: scalars + the keyframe outputs (the
        # latter are small and returned unconditionally, so fetching them
        # here saves a second ~25-60 ms relay round trip on every keyframe)
        (Tcw_np, ok_coarse, accept, n_inl, is_kf, kf_id, kf_Tcw_np, keep_np,
         new_pids_np, cull_ids_np, cull_red_np) = (
            jax.device_get(
                (res.track.Tcw, res.track.ok, res.accept,
                 res.track.n_inliers, res.is_kf, res.kf_id, res.kf_Tcw,
                 res.window_keep, res.new_pids, res.cull_ids, res.cull_red)
            )
        )
        ok = bool(accept)
        n_inl = int(n_inl)
        is_kf = bool(is_kf)
        if not ok:
            if self.localization_only and bool(ok_coarse):
                # map coverage fell below the accept gate but coarse
                # tracking still works: switch to mbVO instead of LOST
                # (reference src/Tracking.cc:365-380)
                t.mb_vo = True
                t.state = TrackState.OK
                t.velocity = res.next_velocity
                t.last_inliers = n_inl
                t._log_pose(frame, True, Tcw_np)
                self.results.append(TrackResult(Tcw_np, t.state, n_inl, False))
                self.log.emit("frame", frame_id=int(frame.frame_id),
                              t=float(frame.timestamp), state="VO",
                              n_inliers=n_inl, is_kf=False)
                return False
            t.state = TrackState.LOST
            t.velocity = None
            # restore the pre-frame anchors: relocalization must match
            # against the last GOOD frame, not the one that lost tracking
            t.last_frame, t.last_point_idx, t.last_Tcw = rec.prev_anchors
            self._anchor = None
            t._log_pose(frame, False)
            self.results.append(TrackResult(Tcw_np, t.state, n_inl, False))
            self.log.emit("frame", frame_id=int(frame.frame_id),
                          t=float(frame.timestamp), state="LOST",
                          n_inliers=n_inl, is_kf=False)
            # auto-reset only while BUILDING a young map (reference
            # src/Tracking.cc:502-510); never wipe a frozen/loaded map
            if t.n_keyframes <= 5 and not self.localization_only:
                self._in_resolve = True
                try:
                    self.reset()
                finally:
                    self._in_resolve = False
            return True

        t.state = TrackState.OK
        if is_kf and self.enable_mapping and not self.localization_only:
            kf_id = int(kf_id)
            self.map = mapper.after_keyframe(
                self.map, kf_id, new_pids_np, keep_np,
                cull_ids=cull_ids_np, cull_red=cull_red_np,
            )
            self._drain_culls()
            if self.enable_loop_closing:
                # DISPATCH detection only; the result is pulled on a later
                # frame so the round trip overlaps tracking
                event = self._dispatch_loop_detection(kf_id) or event
            t.map = self.map
            # a correction that just landed moved this keyframe's pose: the
            # pulled kf_Tcw_np is stale, force a fresh ref-pose pull
            t.on_new_keyframe(kf_id, ref_pose_np=None if event else kf_Tcw_np)
            # keep the motion model alive across keyframes (the reference
            # updates mVelocity every frame, src/Tracking.cc:447-456)
            t.velocity = res.next_velocity
            t.frames_since_kf = 0
        else:
            t.velocity = res.next_velocity
            t.frames_since_kf += 1
        t.last_inliers = n_inl
        t._log_pose(frame, True, Tcw_np)
        self.results.append(TrackResult(Tcw_np, t.state, n_inl, is_kf))
        rec = dict(frame_id=int(frame.frame_id), t=float(frame.timestamp),
                   state="OK", n_inliers=n_inl, is_kf=is_kf)
        if is_kf:
            rec["kf_id"] = int(kf_id)
            self.log.emit("keyframe", kf_id=int(kf_id),
                          frame_id=int(frame.frame_id),
                          n_new_points=int((np.asarray(new_pids_np) >= 0).sum()))
        self.log.emit("frame", **rec)
        return event

    def _drain_culls(self):
        """Re-anchor trajectory entries referencing keyframes the mapper
        just culled (to the culled KF's spanning-tree parent; reference
        export walks the tree instead, src/System.cc:377-384)."""
        for c, parent, Tcp in self.local_mapper.culled_log:
            self.tracker.remap_trajectory_ref(c, parent, Tcp)
        self.local_mapper.culled_log.clear()

    def flush(self):
        """Resolve any in-flight pipelined frame (host pull + bookkeeping)
        and any pending loop detection. Called automatically by every
        introspection/export entry point."""
        while self._pending:
            rec = self._pending.pop(0)
            if self._turbo_resolve(rec):
                # an event invalidated the remaining in-flight frames;
                # reprocess their raw inputs (this may enqueue fresh
                # dispatches, which the loop then drains too)
                self._anchor = None
                self._reprocess_stale()
        if (
            self.loop_closer is not None
            and self.loop_closer._pending_detect is not None
        ):
            self._finalize_loop_detection()
        self._anchor = None

    def _ensure_loop_closer(self, state, kf_id: int):
        """Lazy-init the vocabulary from the map's own descriptors
        (no shipped DBoW2 file; SURVEY.md §2a) + precompile warmup."""
        import jax

        from orbslam2_tpu.pipeline.loop_closing import LoopCloser
        from orbslam2_tpu.vocab import bow

        if self.loop_closer is None:
            codebook = bow.train_codebook(
                state.kf_desc[kf_id], state.kf_feat_valid[kf_id],
                jax.random.PRNGKey(self.cfg.vocab.seed),
                vocab_size=self.cfg.vocab.vocab_size,
                iters=self.cfg.vocab.train_iters,
            )
            self.loop_closer = LoopCloser(self.cfg, self.builder.K, codebook)
            self.loop_closer.warmup_compiles(self.cfg.orb.feature_slots, state)
            self._loop_key = jax.random.PRNGKey(self.cfg.seed + 7)

    def _dispatch_loop_detection(self, kf_id: int) -> bool:
        """Register the keyframe with the loop DB and launch detection;
        returns True if finalizing a back-to-back pending detection fired
        a correction."""
        self._ensure_loop_closer(self.map, kf_id)
        lc = self.loop_closer
        event = False
        if lc._pending_detect is not None:
            event = self._finalize_loop_detection()
        lc.add_keyframe_to_db(self.map, kf_id)
        lc.dispatch_detect(self.map, kf_id)
        return event

    def _finalize_loop_detection(self) -> bool:
        """Pull + act on a previously dispatched loop detection. Returns
        True when a loop correction moved the map."""
        import jax

        lc = self.loop_closer
        self._loop_key, sub = jax.random.split(self._loop_key)
        state, result = lc.finalize_detect(self.map, sub)
        self.map = state
        t = self.tracker
        t.map = state
        if result is not None and result.detected:
            self.log.emit("loop_closed", matched_kf=int(result.matched_kf),
                          num_inliers=int(result.num_inliers),
                          loops_closed=lc.loops_closed,
                          obs_truncations=lc.obs_truncations,
                          edge_truncations=lc.edge_truncations)
            # poses moved globally: re-anchor tracking to the corrected
            # reference keyframe and drop the motion model
            t.refresh_ref_pose()
            if t.ref_kf >= 0:
                t.last_Tcw = state.kf_Tcw[t.ref_kf]
            t.velocity = None
            self._anchor = None
            return True
        return False

    def track_stereo(self, left, right, timestamp: float = 0.0) -> np.ndarray:
        if self.tracker.state == TrackState.OK:
            return self._track_turbo("stereo", left, right, timestamp)
        frame = self.builder.stereo(jnp.asarray(left), jnp.asarray(right), timestamp)
        return self._track(frame)

    def track_monocular(self, image, timestamp: float = 0.0) -> np.ndarray:
        if self.tracker.state == TrackState.OK:
            return self._track_turbo("mono", image, None, timestamp)
        frame = self.builder.monocular(jnp.asarray(image), timestamp)
        return self._track(frame)

    def _track(self, frame: FrameData) -> np.ndarray:
        self.flush()
        self.tracker.map = self.map
        prior_state = self.tracker.state
        reloc_db = self.loop_closer.db if self.loop_closer is not None else None
        res = self.tracker.process(frame, reloc_db=reloc_db)
        self.map = self.tracker.map
        self._drain_culls()
        n_kf_ev = self.log.counts().get("keyframe", 0)
        self._handle_kf_request()
        self.results.append(res)
        if res.is_keyframe and self.log.counts().get("keyframe", 0) == n_kf_ev:
            # keyframe(s) created inside tracker.process (initialization
            # path) rather than via the kf_request pipeline; n_new_points
            # is unknown without an extra device pull
            self.log.emit("keyframe", kf_id=self.tracker.ref_kf,
                          frame_id=int(frame.frame_id), n_new_points=-1)
        if prior_state == TrackState.LOST and res.state == TrackState.OK:
            self.log.emit("relocalized", frame_id=int(frame.frame_id),
                          n_inliers=int(res.num_inliers))
        self.log.emit("frame", frame_id=int(frame.frame_id),
                      t=float(frame.timestamp), state=res.state.name,
                      n_inliers=int(res.num_inliers), is_kf=bool(res.is_keyframe))
        # auto-reset when lost right after initialization (reference
        # src/Tracking.cc:502-510: lost with <= 5 keyframes -> full reset);
        # never wipe a frozen/loaded map in localization mode
        if (
            res.state == TrackState.LOST
            and self.tracker.n_keyframes <= 5
            and not self.localization_only
        ):
            self.reset()
        return res.Tcw

    def _handle_kf_request(self):
        if (
            self.tracker.kf_request is not None
            and self.enable_mapping
            and not self.localization_only
        ):
            kf_frame, kf_Tcw, kf_bind = self.tracker.kf_request
            self.tracker.kf_request = None
            kf_id, kf_Tcw_new, kf_bind_new, kf_Tcw_np, loop_fired = (
                self._run_keyframe_pipeline(kf_frame, kf_Tcw, kf_bind)
            )
            self.tracker.map = self.map
            self.tracker.on_new_keyframe(
                kf_id, ref_pose_np=None if loop_fired else kf_Tcw_np
            )
            # keyframe pose may have moved in BA: refresh tracker anchors and
            # drop the motion model (velocity was estimated against pre-BA
            # poses; extrapolating it against the corrected pose compounds)
            self.tracker.last_Tcw = kf_Tcw_new
            self.tracker.last_point_idx = kf_bind_new
            self.tracker.velocity = None
        else:
            self.tracker.kf_request = None

    def _run_keyframe_pipeline(self, frame, Tcw, point_idx) -> int:
        """Fused keyframe insertion + mapping + probation culling + local BA
        in one device program (the synchronous analogue of the reference's
        LocalMapping thread iteration)."""
        from orbslam2_tpu.pipeline import fused

        t = self.tracker
        cfg = self.cfg
        mapper = self.local_mapper
        sc = cfg.solver
        window = mapper.probation_window()
        run_ba = t.n_keyframes >= 2  # this insert makes the third keyframe
        state, kf_dev, new_pids, keep, kf_Tcw_new, kf_bind_new, cull_ids, cull_red = fused.keyframe_full_step(
            self.map, frame, Tcw, point_idx, window, self.builder.K, t._params,
            mapper.level_sigma2, mapper.inv_sigma2,
            scale_factor_last=float(cfg.orb.scale_factor ** (cfg.orb.num_levels - 1)),
            baseline=float(cfg.camera.baseline),
            covis_threshold=cfg.map.covis_threshold,
            n_neighbors=5,
            num_levels=cfg.orb.num_levels,
            create_close_points=cfg.sensor != Sensor.MONOCULAR,
            max_local=sc.ba_max_local_kfs, max_fixed=sc.ba_max_fixed_kfs,
            max_points=sc.ba_max_points,
            obs_slots=min(sc.ba_max_obs_per_point, int(self.map.obs_slots)),
            iters1=sc.local_ba_iters_first, iters2=sc.local_ba_iters_second,
            run_ba=run_ba,
        )
        kf_id_np, keep_np, new_pids_np, kf_Tcw_np, cull_ids_np, cull_red_np = (
            jax.device_get((kf_dev, keep, new_pids, kf_Tcw_new, cull_ids, cull_red))
        )
        kf_id = int(kf_id_np)
        state = mapper.after_keyframe(
            state, kf_id, new_pids_np, keep_np,
            cull_ids=cull_ids_np, cull_red=cull_red_np,
        )
        self._drain_culls()
        self.log.emit("keyframe", kf_id=kf_id, frame_id=int(frame.frame_id),
                      n_new_points=int((np.asarray(new_pids_np) >= 0).sum()))
        loop_fired = False
        if self.enable_loop_closing:
            n_before = (
                self.loop_closer.loops_closed if self.loop_closer is not None else 0
            )
            state = self._run_loop_closing(state, kf_id)
            loop_fired = self.loop_closer.loops_closed > n_before
        self.map = state
        return kf_id, kf_Tcw_new, kf_bind_new, kf_Tcw_np, loop_fired

    def _run_loop_closing(self, state, kf_id: int):
        """Synchronous detection/correction for this keyframe (cold path;
        the turbo path uses _dispatch_loop_detection/_finalize instead)."""
        import jax

        self._ensure_loop_closer(state, kf_id)
        if self.loop_closer._pending_detect is not None:
            # an async detection from the turbo path is still in flight:
            # keep keyframe order by finalizing it first
            self.map = state
            self._finalize_loop_detection()
            state = self.map
        self._loop_key, sub = jax.random.split(self._loop_key)
        state, result = self.loop_closer.process_keyframe(state, kf_id, sub)
        if result is not None and result.detected:
            lc = self.loop_closer
            self.log.emit("loop_closed", matched_kf=int(result.matched_kf),
                          num_inliers=int(result.num_inliers),
                          loops_closed=lc.loops_closed,
                          obs_truncations=lc.obs_truncations,
                          edge_truncations=lc.edge_truncations)
            # poses moved globally: refresh tracker anchors
            self.tracker.map = state
            self.tracker.refresh_ref_pose()
        return state

    # -- reset (reference System::Reset src/System.cc:301-305 +
    #    Tracking::Reset src/Tracking.cc:1606-1652) -------------------------

    def reset(self):
        """Clear the map and return to NOT_INITIALIZED. The per-frame
        trajectory log survives (so evaluation/export still cover the whole
        session; the reference wipes it, src/Tracking.cc:1640-1651)."""
        if not self._in_resolve:
            self.flush()
        self.log.emit("reset", n_keyframes=self.tracker.n_keyframes)
        # do NOT clear self._pending here: when auto-reset fires from inside
        # _turbo_resolve, the caller reprocesses the still-queued in-flight
        # frames (dropping them would lose those frames' trajectory entries);
        # on an external reset, flush() above already drained the queue.
        self._anchor = None
        old_traj = self.tracker.trajectory
        self.map = ms.allocate(self.cfg.map, self.cfg.orb)
        self.tracker = Tracker(self.cfg, self.builder, self.map)
        self.tracker.trajectory = old_traj
        self.local_mapper = LocalMapper(self.cfg, self.builder.K, self.tracker.bounds)
        self.loop_closer = None
        self._loop_key = None

    def change_calibration(self, camera_cfg):
        """Swap camera intrinsics at runtime (reference
        Tracking::ChangeCalibration, src/Tracking.cc:1655-1686). The map is
        kept; per-session static parameters are rebuilt."""
        import dataclasses

        self.flush()
        self.cfg = dataclasses.replace(self.cfg, camera=camera_cfg)
        old_tracker = self.tracker
        self.builder = FrameBuilder(self.cfg)
        self.tracker = Tracker(self.cfg, self.builder, self.map)
        # carry session state over
        for attr in ("state", "velocity", "last_Tcw", "last_frame",
                     "last_point_idx", "ref_kf", "frames_since_kf",
                     "n_keyframes", "trajectory", "new_keyframe_ids",
                     "_ref_pose_np", "last_inliers"):
            setattr(self.tracker, attr, getattr(old_tracker, attr))
        self.local_mapper.K = self.builder.K

    # -- mode switches (reference src/System.cc:272-284) -------------------

    def activate_localization_mode(self):
        self.flush()
        self.localization_only = True

    def deactivate_localization_mode(self):
        self.flush()
        self.localization_only = False

    # -- introspection (reference src/System.cc:287-305, 497-512) ----------

    def get_tracking_state(self) -> TrackState:
        self.flush()
        return self.tracker.state

    def num_keyframes(self) -> int:
        self.flush()
        return int(self.map.num_kf)

    def num_points(self) -> int:
        self.flush()
        return int(jnp.sum(self.map.mp_valid))

    def frame_poses(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(timestamps [N], poses_cw [N,4,4], tracked [N]) with each frame's
        pose re-anchored to its reference keyframe's FINAL pose."""
        self.flush()
        kf_poses = np.asarray(self.map.kf_Tcw)
        ts, poses, tracked = [], [], []
        for t, Tcr, ref, ok in self.tracker.trajectory:
            if ref >= 0:
                Tcw = Tcr @ kf_poses[ref]
            else:
                Tcw = Tcr
            ts.append(t)
            poses.append(Tcw)
            tracked.append(ok)
        return np.asarray(ts), np.stack(poses), np.asarray(tracked)

    # -- export (reference src/System.cc:331-493) --------------------------

    def save_trajectory_tum(self, path: str):
        ts, poses, tracked = self.frame_poses()
        traj_io.save_tum(path, ts[tracked], poses[tracked])

    def save_trajectory_kitti(self, path: str):
        _, poses, _ = self.frame_poses()
        traj_io.save_kitti(path, poses)

    def save_keyframe_trajectory_tum(self, path: str):
        valid = np.asarray(self.map.kf_valid)
        poses = np.asarray(self.map.kf_Tcw)[valid]
        fids = np.asarray(self.map.kf_frame_id)[valid]
        traj_io.save_tum(path, fids.astype(np.float64), poses)

    # -- map persistence (the reference declares SaveMap/LoadMap as TODO,
    #    include/System.h:127-129 — implemented here as parity-plus) -------

    def save_map(self, path: str):
        """Serialize the full map pytree (+ BoW database if present)."""
        self.flush()
        payload = {f"map_{k}": np.asarray(v) for k, v in self.map._asdict().items()}
        if self.loop_closer is not None:
            payload["db_vectors"] = np.asarray(self.loop_closer.db.vectors)
            payload["db_present"] = np.asarray(self.loop_closer.db.present)
            payload["codebook"] = np.asarray(self.loop_closer.codebook)
        np.savez_compressed(path, **payload)

    def load_map(self, path: str):
        self.flush()
        import jax.numpy as jnp

        from orbslam2_tpu.pipeline.loop_closing import LoopCloser

        z = np.load(path)
        fields = {k[4:]: jnp.asarray(z[k]) for k in z.files if k.startswith("map_")}
        self.map = ms.MapState(**fields)
        self.tracker.map = self.map
        self.tracker.n_keyframes = int(jnp.sum(self.map.kf_valid))
        if "codebook" in z.files:
            self.loop_closer = LoopCloser(
                self.cfg, self.builder.K, jnp.asarray(z["codebook"])
            )
            self.loop_closer.db.vectors = jnp.asarray(z["db_vectors"])
            self.loop_closer.db.present = jnp.asarray(z["db_present"])
            import jax

            self._loop_key = jax.random.PRNGKey(self.cfg.seed + 7)

    def shutdown(self):
        self.flush()
