"""Loop closing: detection, Sim3 computation, correction, pose-graph
optimization and global BA.

Redesign of the reference `LoopClosing` thread (reference
src/LoopClosing.cc): the run-loop + stop handshakes + detached GBA thread
become a synchronous `process_keyframe` with explicit phase ordering; the
numerical stages (BoW scoring, Horn Sim3 RANSAC, essential-graph GN, global
BA) are the batched solvers from vocab/ and solvers/.

Stage map: DetectLoop src/LoopClosing.cc:105-232 (incl. the 3-consecutive-
keyframe covisibility-consistency check at :156-232), ComputeSim3 :240-424,
CorrectLoop :430-649, RunGlobalBundleAdjustment :683-790.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from orbslam2_tpu.config import SlamConfig, Sensor
from orbslam2_tpu.geometry import camera as cam_geo
from orbslam2_tpu.geometry import se3, sim3
from orbslam2_tpu.ops import match
from orbslam2_tpu.pipeline import local_mapping as lm
from orbslam2_tpu.slam_map import map_state as ms
from orbslam2_tpu.solvers import ba, horn, pose_graph
from orbslam2_tpu.vocab import bow
from orbslam2_tpu.vocab.database import KeyFrameDatabase


class LoopResult(NamedTuple):
    detected: bool
    matched_kf: int
    num_inliers: int


class LoopCloser:
    def __init__(self, cfg: SlamConfig, K: cam_geo.Intrinsics, codebook: jnp.ndarray):
        self.cfg = cfg
        self.K = K
        self.codebook = codebook
        self.db = KeyFrameDatabase(codebook, cfg.map.max_keyframes)
        nl = cfg.orb.num_levels
        sf = cfg.orb.scale_factor
        self.inv_sigma2 = jnp.asarray([1.0 / sf ** (2 * i) for i in range(nl)], jnp.float32)
        self.level_sigma2 = 1.0 / self.inv_sigma2
        self.last_loop_kf = -1_000
        # consistency groups: list of (set_of_kf_ids, count)
        self._consistent_groups: list[tuple[set, int]] = []
        self.loops_closed = 0

    # ------------------------------------------------------------------
    def add_keyframe_to_db(self, state: ms.MapState, kf_id: int):
        self.db.add(kf_id, state.kf_desc[kf_id], state.kf_feat_valid[kf_id])

    # ------------------------------------------------------------------
    def detect(self, state: ms.MapState, kf_id: int) -> list[int]:
        """DetectLoop (reference src/LoopClosing.cc:105-232)."""
        if kf_id < self.last_loop_kf + 10 or kf_id < 10:
            return []
        covis_row = np.asarray(state.covis[kf_id])
        valid = np.asarray(state.kf_valid)
        covisible = (covis_row >= self.cfg.map.covis_threshold) & valid
        # minScore among covisibles (reference :128-142)
        vec = self.db.vectors[kf_id]
        if covisible.any():
            scores = np.asarray(bow.l1_score(vec, self.db.vectors))
            min_score = float(scores[covisible].min())
        else:
            min_score = 0.05
        exclude = jnp.asarray(covisible) | (jnp.arange(len(valid)) == kf_id)
        # also exclude recent keyframes (temporal neighbors)
        recent = jnp.arange(len(valid)) > kf_id - 8
        cand, mask, _ = self.db.query(
            vec, exclude | recent, max(min_score, 0.01), state.covis[kf_id]
        )
        cands = [int(c) for c, m in zip(np.asarray(cand), np.asarray(mask)) if m]

        # covisibility-consistency over consecutive keyframes (:156-232)
        th = self.cfg.vocab.covisibility_consistency_th
        covis_np = np.asarray(state.covis)
        new_groups: list[tuple[set, int]] = []
        accepted: list[int] = []
        for c in cands:
            group = {c} | set(np.nonzero(covis_np[c] > 0)[0].tolist())
            count = 0
            for prev_group, prev_count in self._consistent_groups:
                if group & prev_group:
                    count = max(count, prev_count + 1)
            new_groups.append((group, count))
            if count >= th:
                accepted.append(c)
        self._consistent_groups = new_groups
        return accepted

    # ------------------------------------------------------------------
    def compute_sim3(self, state: ms.MapState, kf_id: int, cand: int, key):
        """ComputeSim3 for one candidate (reference src/LoopClosing.cc:240-424).

        Returns (success, (s, R, t) mapping candidate-cam -> current-cam,
        matched pair arrays)."""
        # match bound features of both KFs
        pidc = jnp.clip(state.kf_point_idx[kf_id], 0, state.capacity_mp - 1)
        vc = state.kf_feat_valid[kf_id] & (state.kf_point_idx[kf_id] >= 0) & state.mp_valid[pidc]
        pidk = jnp.clip(state.kf_point_idx[cand], 0, state.capacity_mp - 1)
        vk = state.kf_feat_valid[cand] & (state.kf_point_idx[cand] >= 0) & state.mp_valid[pidk]
        res = match.search_brute(
            state.kf_desc[kf_id], vc, state.kf_angle[kf_id],
            state.kf_desc[cand], vk, state.kf_angle[cand],
            max_dist=match.TH_LOW, ratio=0.75, check_rotation=True,
        )
        n = int(res.num_matches)
        if n < 20:
            return False, None, 0
        f2 = res.best_idx
        matched = f2 >= 0
        f2c = jnp.clip(f2, 0, f2.shape[0] - 1)
        p1 = state.mp_pos[pidc]                       # cur KF's points (world)
        p2 = state.mp_pos[pidk[f2c]]                  # candidate's points
        s1 = self.level_sigma2[jnp.clip(state.kf_octave[kf_id], 0, 7)]
        s2 = self.level_sigma2[jnp.clip(state.kf_octave[cand, f2c], 0, 7)]
        fix_scale = self.cfg.sensor != Sensor.MONOCULAR
        sr = horn.ransac_sim3(
            p1, p2, matched,
            state.kf_xy[kf_id], state.kf_xy[cand, f2c],
            s1, s2,
            state.kf_Tcw[kf_id], state.kf_Tcw[cand],
            self.K, key,
            iters=self.cfg.solver.sim3_ransac_iters,
            min_inliers=self.cfg.solver.sim3_min_inliers,
            fix_scale=fix_scale,
        )
        if not bool(sr.success):
            return False, None, int(sr.num_inliers)
        return True, (sr.s, sr.R, sr.t), int(sr.num_inliers)

    # ------------------------------------------------------------------
    def correct_loop(
        self,
        state: ms.MapState,
        kf_id: int,
        loop_kf: int,
        S12,
        run_global_ba: bool = True,
    ) -> ms.MapState:
        """CorrectLoop (reference src/LoopClosing.cc:430-649): propagate the
        corrected Sim3 through the current neighborhood, optimize the
        essential graph, remap landmarks, then global BA."""
        Kcap = state.capacity_kf
        s12, R12, t12 = S12

        old_pack = jax.vmap(pose_graph.se3_to_pack)(state.kf_Tcw)

        # corrected current pose: S_cw = S_12 o S_2w (candidate = frame 2)
        S_2w = sim3.from_se3(state.kf_Tcw[loop_kf])
        S_cw_corr = sim3.compose((s12, R12, t12), S_2w)

        # propagate to current KF's covisible neighborhood (reference :473-508)
        covis_row = np.asarray(state.covis[kf_id])
        neighborhood = np.nonzero(
            (covis_row >= self.cfg.map.covis_threshold) & np.asarray(state.kf_valid)
        )[0].tolist()
        neighborhood = [kf_id] + [k for k in neighborhood if k != kf_id]

        T_cw = state.kf_Tcw[kf_id]
        corrected = dict()
        for k in neighborhood:
            T_kc = state.kf_Tcw[k] @ se3.inverse(T_cw)
            S_kw = sim3.compose(sim3.from_se3(T_kc), S_cw_corr)
            corrected[k] = sim3.pack(S_kw)

        vert = old_pack
        for k, pk in corrected.items():
            vert = vert.at[k].set(pk)

        # ---- essential-graph edges ----
        covis_np = np.asarray(state.covis)
        valid_np = np.asarray(state.kf_valid)
        parents = np.asarray(state.kf_parent)
        n_kf = int(state.num_kf)
        ei, ej, meas, w = [], [], [], []
        kf_Tcw_np = np.asarray(state.kf_Tcw)

        def rel_pack(i, j):
            rel = kf_Tcw_np[j] @ np.linalg.inv(kf_Tcw_np[i])
            return np.asarray(pose_graph.se3_to_pack(jnp.asarray(rel.astype(np.float32))))

        seen = set()
        for k in range(n_kf):
            if not valid_np[k]:
                continue
            pkf = parents[k]
            if pkf >= 0 and valid_np[pkf]:
                ei.append(int(pkf)); ej.append(k); meas.append(rel_pack(pkf, k)); w.append(1.0)
                seen.add((min(int(pkf), k), max(int(pkf), k)))
            strong = np.nonzero(covis_np[k] >= self.cfg.map.essential_threshold)[0]
            for j in strong:
                j = int(j)
                if j <= k or not valid_np[j]:
                    continue
                if (k, j) in seen:
                    continue
                seen.add((k, j))
                ei.append(k); ej.append(j); meas.append(rel_pack(k, j)); w.append(1.0)
        # loop edge with the measured Sim3: S_ji with i=loop_kf, j=kf_id:
        # measurement S_cur<-loop = S12 adjusted into world-vertex form:
        # e = log(S_meas o S_i o S_j^-1) zero when S_j = S_meas o S_i, and
        # indeed S_cw_corr = S12 o S_2w.
        ei.append(loop_kf); ej.append(kf_id)
        meas.append(np.asarray(sim3.pack((s12, R12, t12))))
        w.append(5.0)

        E = len(ei)
        prob = pose_graph.PoseGraphProblem(
            vertices=vert,
            vertex_valid=state.kf_valid,
            vertex_fixed=jnp.zeros(Kcap, bool).at[loop_kf].set(True).at[0].set(True),
            edge_i=jnp.asarray(ei, jnp.int32),
            edge_j=jnp.asarray(ej, jnp.int32),
            edge_meas=jnp.asarray(np.stack(meas).astype(np.float32)),
            edge_valid=jnp.ones(E, bool),
            edge_weight=jnp.asarray(w, jnp.float32),
        )
        new_pack = pose_graph.optimize_pose_graph(
            prob, iters=self.cfg.solver.pose_graph_iters
        )

        # ---- write back: poses + landmark remap ----
        new_Tcw = jax.vmap(pose_graph.pack_to_se3)(new_pack)
        new_Tcw = jnp.where(state.kf_valid[:, None, None], new_Tcw, state.kf_Tcw)
        new_pts = pose_graph.remap_points(
            state.mp_pos, state.mp_ref_kf, old_pack, new_pack
        )
        new_pts = jnp.where(state.mp_valid[:, None], new_pts, state.mp_pos)
        state = state._replace(kf_Tcw=new_Tcw, mp_pos=new_pts)
        state = state._replace(
            loop_edges=state.loop_edges.at[kf_id, loop_kf].set(True)
            .at[loop_kf, kf_id].set(True)
        )

        # ---- global BA (reference spawns a thread; we run it inline) ----
        if run_global_ba:
            state = self.global_ba(state)
        self.last_loop_kf = kf_id
        self.loops_closed += 1
        return state

    # ------------------------------------------------------------------
    def global_ba(self, state: ms.MapState) -> ms.MapState:
        """Full-map BA (reference GlobalBundleAdjustment src/Optimizer.cc:40-236
        + the propagation in RunGlobalBundleAdjustment src/LoopClosing.cc:683-790
        — propagation is unnecessary here because the pipeline is synchronous)."""
        prob, cam_ids, cam_present, pts, pt_ok = lm.build_global_ba_problem(
            state, self.inv_sigma2,
            max_points=self.cfg.map.max_points,
            obs_slots=int(state.obs_slots),
        )
        res = ba.bundle_adjust(
            prob, self.K, iters=self.cfg.solver.global_ba_iters, use_kernel=True
        )
        return lm.writeback_local_ba(state, res, prob, cam_ids, cam_present, pts, pt_ok)

    # ------------------------------------------------------------------
    def process_keyframe(self, state: ms.MapState, kf_id: int, key) -> tuple[ms.MapState, Optional[LoopResult]]:
        """Full loop-closing iteration for one keyframe."""
        self.add_keyframe_to_db(state, kf_id)
        cands = self.detect(state, kf_id)
        for c in cands:
            key, sub = jax.random.split(key)
            okay, S12, n_inl = self.compute_sim3(state, kf_id, c, sub)
            if okay:
                state = self.correct_loop(state, kf_id, c, S12)
                return state, LoopResult(True, c, n_inl)
        return state, None
