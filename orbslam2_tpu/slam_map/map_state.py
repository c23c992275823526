"""The SLAM map as a device-resident struct-of-arrays pytree.

Replaces the reference's pointer graph of heap objects guarded by mutexes —
`Map` (reference src/Map.cc), `KeyFrame` (src/KeyFrame.cc), `MapPoint`
(src/MapPoint.cc) — with fixed-capacity masked arrays mutated by pure
functions at defined pipeline points. Key translations:

* `MapPoint::mObservations` (map<KeyFrame*, idx>, reference
  include/MapPoint.h:126)  ->  padded per-point observation table
  `mp_obs_kf/mp_obs_feat [P, O]` with -1 holes;
* per-KF feature->point bindings (`Frame::mvpMapPoints`)  ->
  `kf_point_idx [K, S]`;
* the covisibility graph (reference src/KeyFrame.cc:326-414)  ->  a dense
  weight matrix `covis [K, K]` rebuilt incrementally from shared-point
  counts (one indicator-gather per new keyframe, no mutexes);
* the spanning tree (`mpParent`)  ->  `kf_parent [K]`;
* loop edges  ->  boolean matrix `loop_edges [K, K]`.

Capacities are static (MapConfig); slots are allocated monotonically and
invalidated on culling.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orbslam2_tpu.config import MapConfig, OrbConfig


class MapState(NamedTuple):
    # --- keyframes [K, ...] ---
    kf_Tcw: jnp.ndarray          # [K, 4, 4]
    kf_valid: jnp.ndarray        # [K] bool
    kf_frame_id: jnp.ndarray     # [K] int32 source frame index
    kf_xy: jnp.ndarray           # [K, S, 2] undistorted keypoint coords
    kf_ur: jnp.ndarray           # [K, S] right-x coord (<0 mono)
    kf_depth: jnp.ndarray        # [K, S] keypoint depth (<0 unknown)
    kf_octave: jnp.ndarray       # [K, S] int32
    kf_angle: jnp.ndarray        # [K, S]
    kf_desc: jnp.ndarray         # [K, S, 8] uint32
    kf_feat_valid: jnp.ndarray   # [K, S] bool
    kf_point_idx: jnp.ndarray    # [K, S] int32 -> map point, -1 unbound
    kf_parent: jnp.ndarray       # [K] int32 spanning-tree parent (-1 root)
    kf_seq: jnp.ndarray          # [K] int32 insertion sequence number (the
                                 # reference's monotonically increasing
                                 # KeyFrame::mnId, include/KeyFrame.h:217;
                                 # needed because SLOTS are recycled, so the
                                 # slot index no longer encodes age/order)
    # --- map points [P, ...] ---
    mp_pos: jnp.ndarray          # [P, 3]
    mp_valid: jnp.ndarray        # [P] bool
    mp_desc: jnp.ndarray         # [P, 8] uint32 representative descriptor
    mp_normal: jnp.ndarray       # [P, 3] mean viewing direction
    mp_min_dist: jnp.ndarray     # [P] scale-invariance band lower
    mp_max_dist: jnp.ndarray     # [P] upper
    mp_ref_kf: jnp.ndarray       # [P] int32
    mp_first_kf: jnp.ndarray     # [P] int32 creating keyframe's SEQ number
                                 # (ages in cull_points are seq deltas;
                                 # also the slot-identity guard for async
                                 # GBA fold-in)
    mp_n_obs: jnp.ndarray        # [P] int32 (stereo counts 2, reference MapPoint.cc:108)
    mp_visible: jnp.ndarray      # [P] int32 tracking visibility counter
    mp_found: jnp.ndarray        # [P] int32 tracking found counter
    mp_obs_kf: jnp.ndarray       # [P, O] int32 observing keyframe ids, -1 hole
    mp_obs_feat: jnp.ndarray     # [P, O] int32 feature slot in that KF
    # --- graphs ---
    covis: jnp.ndarray           # [K, K] int32 shared-point counts
    loop_edges: jnp.ndarray      # [K, K] bool
    # --- counters (scalars) ---
    num_kf: jnp.ndarray          # int32 keyframes ever INSERTED (monotonic
                                 # seq counter, NOT the live count — culled
                                 # slots are recycled; live = sum(kf_valid))
    num_mp: jnp.ndarray          # int32 allocated point slots

    @property
    def capacity_kf(self) -> int:
        return self.kf_valid.shape[0]

    @property
    def capacity_mp(self) -> int:
        return self.mp_valid.shape[0]

    @property
    def obs_slots(self) -> int:
        return self.mp_obs_kf.shape[1]


def allocate(map_cfg: MapConfig, orb_cfg: OrbConfig, obs_slots: int = 16) -> MapState:
    K = map_cfg.max_keyframes
    P = map_cfg.max_points
    S = orb_cfg.feature_slots
    O = obs_slots
    f32 = jnp.float32
    i32 = jnp.int32
    return MapState(
        kf_Tcw=jnp.tile(jnp.eye(4, dtype=f32), (K, 1, 1)),
        kf_valid=jnp.zeros(K, bool),
        kf_frame_id=jnp.full(K, -1, i32),
        kf_xy=jnp.zeros((K, S, 2), f32),
        kf_ur=jnp.full((K, S), -1.0, f32),
        kf_depth=jnp.full((K, S), -1.0, f32),
        kf_octave=jnp.zeros((K, S), i32),
        kf_angle=jnp.zeros((K, S), f32),
        kf_desc=jnp.zeros((K, S, 8), jnp.uint32),
        kf_feat_valid=jnp.zeros((K, S), bool),
        kf_point_idx=jnp.full((K, S), -1, i32),
        kf_parent=jnp.full(K, -1, i32),
        kf_seq=jnp.full(K, -1, i32),
        mp_pos=jnp.zeros((P, 3), f32),
        mp_valid=jnp.zeros(P, bool),
        mp_desc=jnp.zeros((P, 8), jnp.uint32),
        mp_normal=jnp.zeros((P, 3), f32),
        mp_min_dist=jnp.zeros(P, f32),
        mp_max_dist=jnp.zeros(P, f32),
        mp_ref_kf=jnp.full(P, -1, i32),
        mp_first_kf=jnp.full(P, -1, i32),
        mp_n_obs=jnp.zeros(P, i32),
        mp_visible=jnp.ones(P, i32),
        mp_found=jnp.ones(P, i32),
        mp_obs_kf=jnp.full((P, O), -1, i32),
        mp_obs_feat=jnp.full((P, O), -1, i32),
        covis=jnp.zeros((K, K), i32),
        loop_edges=jnp.zeros((K, K), bool),
        num_kf=jnp.zeros((), i32),
        num_mp=jnp.zeros((), i32),
    )


# ---------------------------------------------------------------------------
# keyframe insertion
# ---------------------------------------------------------------------------


@jax.jit
def add_keyframe(
    state: MapState,
    frame_id: jnp.ndarray,
    Tcw: jnp.ndarray,
    xy: jnp.ndarray,
    ur: jnp.ndarray,
    depth: jnp.ndarray,
    octave: jnp.ndarray,
    angle: jnp.ndarray,
    desc: jnp.ndarray,
    feat_valid: jnp.ndarray,
    point_idx: jnp.ndarray,
) -> tuple[MapState, jnp.ndarray]:
    """Write a new keyframe into the FIRST FREE SLOT (culled slots are
    recycled — a fixed 512-slot pool sustains unbounded sessions the way
    the reference's heap allocation + SetBadFlag does, src/KeyFrame.cc:
    507-610); bind its pre-matched points (point_idx[s] >= 0), append
    observations, refresh covisibility row and pick the spanning-tree
    parent (top covisible, reference src/KeyFrame.cc:406-411).

    Age/order semantics live in `kf_seq` (= the reference's monotonic
    KeyFrame::mnId), NOT the slot index. If no slot is free every write
    drops (callers gate on `jnp.any(~kf_valid)`).

    Returns (new_state, kf_slot) — kf_slot == capacity_kf when full.
    """
    K = state.capacity_kf
    seq = state.num_kf
    free = ~state.kf_valid
    has_free = jnp.any(free)
    k = jnp.where(has_free, jnp.argmax(free), K).astype(jnp.int32)
    bind = (point_idx >= 0) & has_free
    safe_pid = jnp.where(bind, point_idx, 0)

    st = state._replace(
        kf_Tcw=state.kf_Tcw.at[k].set(Tcw, mode="drop"),
        kf_valid=state.kf_valid.at[k].set(True, mode="drop"),
        kf_frame_id=state.kf_frame_id.at[k].set(frame_id, mode="drop"),
        kf_xy=state.kf_xy.at[k].set(xy, mode="drop"),
        kf_ur=state.kf_ur.at[k].set(ur, mode="drop"),
        kf_depth=state.kf_depth.at[k].set(depth, mode="drop"),
        kf_octave=state.kf_octave.at[k].set(octave, mode="drop"),
        kf_angle=state.kf_angle.at[k].set(angle, mode="drop"),
        kf_desc=state.kf_desc.at[k].set(desc, mode="drop"),
        kf_feat_valid=state.kf_feat_valid.at[k].set(feat_valid, mode="drop"),
        kf_point_idx=state.kf_point_idx.at[k].set(
            jnp.where(bind, point_idx, -1), mode="drop"),
        kf_seq=state.kf_seq.at[k].set(seq, mode="drop"),
        num_kf=seq + jnp.where(has_free, 1, 0),
    )
    st = _append_observations(st, k, safe_pid, bind, ur)
    st = update_covisibility_row(st, jnp.clip(k, 0, K - 1))
    # spanning-tree parent: strongest covisible among OLDER keyframes (all
    # other valid keyframes — their seq predates ours); fall back to the
    # most recently inserted one when covisibility is empty
    kc = jnp.clip(k, 0, K - 1)
    weights = st.covis[kc]
    older = st.kf_valid & (st.kf_seq >= 0) & (st.kf_seq < seq)
    w = jnp.where(older, weights, -1)
    prev = jnp.argmax(jnp.where(older, st.kf_seq, -1))
    parent = jnp.where(jnp.max(w) > 0, jnp.argmax(w), prev).astype(jnp.int32)
    parent = jnp.where(jnp.any(older), parent, -1)
    st = st._replace(kf_parent=st.kf_parent.at[k].set(parent, mode="drop"))
    return st, k


def _append_observations(
    state: MapState, k, point_ids, bind_mask, ur
) -> MapState:
    """Append (k, feat_slot) to each bound point's observation table."""
    S = point_ids.shape[0]
    rows = state.mp_obs_kf[point_ids]            # [S, O]
    free = rows < 0
    slot = jnp.argmax(free, axis=1)              # first free slot
    has_free = jnp.any(free, axis=1)
    do = bind_mask & has_free
    feat_ids = jnp.arange(S, dtype=jnp.int32)
    pid_w = jnp.where(do, point_ids, state.capacity_mp)  # OOB drop
    obs_kf = state.mp_obs_kf.at[pid_w, slot].set(jnp.full(S, k, jnp.int32), mode="drop")
    obs_ft = state.mp_obs_feat.at[pid_w, slot].set(feat_ids, mode="drop")
    # stereo observations count twice (reference src/MapPoint.cc:108-118)
    inc = jnp.where(ur >= 0, 2, 1).astype(jnp.int32)
    n_obs = state.mp_n_obs.at[pid_w].add(jnp.where(do, inc, 0), mode="drop")
    return state._replace(mp_obs_kf=obs_kf, mp_obs_feat=obs_ft, mp_n_obs=n_obs)


@jax.jit
def update_covisibility_row(state: MapState, k) -> MapState:
    """Recompute covis[k, :] and covis[:, k] from shared point bindings.

    Indicator trick: scatter KF k's point ids into a [P] flag vector, then
    for every KF count flagged bindings with one gather — O(K*S), no K x S x S
    blowup. (Semantics of KeyFrame::UpdateConnections, src/KeyFrame.cc:326-414.)
    """
    P = state.capacity_mp
    ids_k = state.kf_point_idx[k]
    flag = jnp.zeros(P + 1, bool).at[jnp.where(ids_k >= 0, ids_k, P)].set(True)
    flag = flag.at[P].set(False)
    ids_all = jnp.where(state.kf_point_idx >= 0, state.kf_point_idx, P)  # [K, S]
    counts = jnp.sum(flag[ids_all], axis=1).astype(jnp.int32)  # [K]
    counts = jnp.where(state.kf_valid, counts, 0).at[k].set(0)
    covis = state.covis.at[k, :].set(counts)
    covis = covis.at[:, k].set(counts)
    return state._replace(covis=covis)


# ---------------------------------------------------------------------------
# map point insertion
# ---------------------------------------------------------------------------


@jax.jit
def add_points(
    state: MapState,
    positions: jnp.ndarray,   # [N, 3]
    valid: jnp.ndarray,       # [N] bool
    ref_kf: jnp.ndarray,      # scalar int32
    feat_idx: jnp.ndarray,    # [N] feature slot in ref_kf binding this point
    desc: jnp.ndarray,        # [N, 8]
    normal: jnp.ndarray,      # [N, 3]
    min_dist: jnp.ndarray,    # [N]
    max_dist: jnp.ndarray,    # [N]
    ur: jnp.ndarray,          # [N] right coords of the seeding feature
) -> tuple[MapState, jnp.ndarray]:
    """Batch-allocate new points into FREE slots (invalid or never used);
    bind them to ref_kf's features and seed their observation tables.

    Slots of culled points are reused, so long sessions do not exhaust the
    pool the way round 1's monotonic watermark did (point creation silently
    stopped once `num_mp` hit capacity and tracking starved). Stale ids in
    host-side lists are safe: culled ids are removed from the probation
    window in the same keyframe step that frees them, and per-frame
    bindings are re-validated against mp_valid every frame.

    Returns (state, point_ids [N] with -1 where invalid/overflow).
    """
    N = positions.shape[0]
    P = state.capacity_mp
    free = jnp.nonzero(~state.mp_valid, size=N, fill_value=P)[0]
    slot_rank = jnp.cumsum(valid.astype(jnp.int32)) - 1
    pid = free[jnp.clip(slot_rank, 0, N - 1)]
    ok = valid & (pid < P)
    pid_w = jnp.where(ok, pid, P)  # OOB drop

    st = state._replace(
        mp_pos=state.mp_pos.at[pid_w].set(positions, mode="drop"),
        mp_valid=state.mp_valid.at[pid_w].set(ok, mode="drop"),
        mp_desc=state.mp_desc.at[pid_w].set(desc, mode="drop"),
        mp_normal=state.mp_normal.at[pid_w].set(normal, mode="drop"),
        mp_min_dist=state.mp_min_dist.at[pid_w].set(min_dist, mode="drop"),
        mp_max_dist=state.mp_max_dist.at[pid_w].set(max_dist, mode="drop"),
        mp_ref_kf=state.mp_ref_kf.at[pid_w].set(jnp.full(N, ref_kf, jnp.int32), mode="drop"),
        # creation "time" = the ref keyframe's SEQ (slot ids are recycled)
        mp_first_kf=state.mp_first_kf.at[pid_w].set(
            jnp.broadcast_to(
                state.kf_seq[jnp.clip(ref_kf, 0, state.capacity_kf - 1)], (N,)
            ).astype(jnp.int32),
            mode="drop",
        ),
        mp_n_obs=state.mp_n_obs.at[pid_w].set(jnp.where(ur >= 0, 2, 1), mode="drop"),
        mp_visible=state.mp_visible.at[pid_w].set(1, mode="drop"),
        mp_found=state.mp_found.at[pid_w].set(1, mode="drop"),
        mp_obs_kf=state.mp_obs_kf.at[pid_w, 0].set(jnp.full(N, ref_kf, jnp.int32), mode="drop"),
        mp_obs_feat=state.mp_obs_feat.at[pid_w, 0].set(feat_idx, mode="drop"),
        num_mp=state.num_mp + jnp.sum(ok.astype(jnp.int32)),
    )
    # bind in the keyframe table
    feat_w = jnp.where(ok, feat_idx, state.kf_point_idx.shape[1])
    kpi = st.kf_point_idx.at[ref_kf, feat_w].set(
        jnp.where(ok, pid, -1).astype(jnp.int32), mode="drop"
    )
    return st._replace(kf_point_idx=kpi), jnp.where(ok, pid, -1)


# ---------------------------------------------------------------------------
# derived quantities / maintenance
# ---------------------------------------------------------------------------


@jax.jit
def recompute_point_stats(
    state: MapState, point_ids: jnp.ndarray, scale_factors: jnp.ndarray
) -> MapState:
    """Re-elect distinctive descriptors + refresh normal/depth bands for a
    batch of points (reference MapPoint::ComputeDistinctiveDescriptors
    src/MapPoint.cc:275-342 and UpdateNormalAndDepth src/MapPoint.cc:369-427).
    point_ids may contain -1 entries (skipped). `scale_factors` is the
    per-level pyramid scale array ([num_levels], scale_factor**level)."""
    from orbslam2_tpu.ops import hamming  # local import to avoid cycle

    O = state.obs_slots
    pid = jnp.where(point_ids >= 0, point_ids, 0)
    ok = (point_ids >= 0) & state.mp_valid[pid]

    obs_kf = state.mp_obs_kf[pid]     # [N, O]
    obs_ft = state.mp_obs_feat[pid]
    has = obs_kf >= 0
    kf_w = jnp.where(has, obs_kf, 0)
    ft_w = jnp.where(has, obs_ft, 0)

    descs = state.kf_desc[kf_w, ft_w]  # [N, O, 8]
    # pairwise Hamming per point, median per row over valid, argmin
    d = jax.vmap(hamming.distance_matrix)(descs, descs)  # [N, O, O]
    big = jnp.int32(1 << 16)
    d = jnp.where(has[:, :, None] & has[:, None, :], d, big)
    # masked median: sort each row, index at (n_valid // 2)
    n_valid = jnp.sum(has, axis=1)  # [N]
    d_sorted = jnp.sort(d, axis=-1)
    med_idx = jnp.clip(n_valid // 2, 0, O - 1)
    med = jnp.take_along_axis(
        d_sorted, med_idx[:, None, None].repeat(O, 1), axis=-1
    )[..., 0]  # [N, O]
    med = jnp.where(has, med, big)
    best_obs = jnp.argmin(med, axis=1)
    new_desc = jnp.take_along_axis(descs, best_obs[:, None, None].repeat(8, -1), axis=1)[:, 0]

    # normal: mean of unit vectors point->..: (pos - Ow)/|..| over observers
    pos = state.mp_pos[pid]  # [N, 3]
    centers = -jnp.einsum(
        "nokj,nok->noj", state.kf_Tcw[kf_w][..., :3, :3], state.kf_Tcw[kf_w][..., :3, 3]
    )  # [N, O, 3] camera centers
    dirs = pos[:, None, :] - centers
    dn = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-9)
    dn = jnp.where(has[..., None], dn, 0.0)
    normal = dn.sum(1) / jnp.maximum(n_valid[:, None], 1)

    # depth band from the reference keyframe's octave
    ref = jnp.clip(state.mp_ref_kf[pid], 0, state.capacity_kf - 1)
    ref_T = state.kf_Tcw[ref]
    ref_c = -jnp.einsum("nkj,nk->nj", ref_T[..., :3, :3], ref_T[..., :3, 3])
    dist = jnp.linalg.norm(pos - ref_c, axis=-1)
    # find the feature slot bound in ref kf (first obs whose kf == ref)
    is_ref = obs_kf == ref[:, None]
    ref_slot = jnp.argmax(is_ref, axis=1)
    ref_feat = jnp.take_along_axis(obs_ft, ref_slot[:, None], 1)[:, 0]
    octv = state.kf_octave[ref, jnp.clip(ref_feat, 0, state.kf_octave.shape[1] - 1)]
    nl = scale_factors.shape[0]
    scale = scale_factors[jnp.clip(octv, 0, nl - 1)]
    max_d = dist * scale
    min_d = max_d / scale_factors[nl - 1]

    def upd(arr, new):
        return arr.at[pid].set(jnp.where(ok[..., None] if new.ndim > 1 else ok, new, arr[pid]))

    return state._replace(
        mp_desc=upd(state.mp_desc, new_desc),
        mp_normal=upd(state.mp_normal, normal),
        mp_max_dist=upd(state.mp_max_dist, max_d),
        mp_min_dist=upd(state.mp_min_dist, min_d),
    )


@jax.jit
def rebuild_observations(state: MapState) -> tuple[MapState, jnp.ndarray]:
    """Rebuild the per-point observation tables (mp_obs_kf/mp_obs_feat/
    mp_n_obs) from the keyframe binding tables, which are the source of
    truth after bulk rebinding (loop-closure point replacement, fuse).

    The reference keeps MapPoint::mObservations transactionally in sync
    (src/MapPoint.cc:108-160); after a batched rebind the cheap TPU move is
    one global reconcile: flatten all (kf, feat, pid) bindings, sort by pid,
    rank within each pid segment, scatter the first `obs_slots` per point.

    Returns (state, n_truncated) where n_truncated counts observations
    dropped because a point had more than obs_slots observers — the
    round-1 review flagged this truncation as silent (VERDICT "What's
    weak"); callers should surface it.
    """
    K, S = state.kf_point_idx.shape
    P = state.capacity_mp
    O = state.obs_slots
    pid = state.kf_point_idx
    pid_c = jnp.clip(pid, 0, P - 1)
    valid = (
        (pid >= 0) & state.kf_feat_valid & state.kf_valid[:, None]
        & state.mp_valid[pid_c]
    )
    flat_pid = jnp.where(valid, pid, P).reshape(-1)
    kf_ids = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32)[:, None], (K, S)).reshape(-1)
    ft_ids = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None, :], (K, S)).reshape(-1)
    order = jnp.argsort(flat_pid)
    sp = flat_pid[order]
    skf = kf_ids[order]
    sft = ft_ids[order]
    idx = jnp.arange(sp.shape[0])
    seg_start = jnp.searchsorted(sp, sp, side="left")
    rank = idx - seg_start
    ok = (sp < P) & (rank < O)
    sp_w = jnp.where(ok, sp, P)
    rank_w = jnp.where(ok, rank, 0)
    obs_kf = jnp.full((P, O), -1, jnp.int32).at[sp_w, rank_w].set(skf, mode="drop")
    obs_ft = jnp.full((P, O), -1, jnp.int32).at[sp_w, rank_w].set(sft, mode="drop")
    ur = state.kf_ur.reshape(-1)[order]
    inc = jnp.where(ur >= 0, 2, 1).astype(jnp.int32)
    n_obs = (
        jnp.zeros(P + 1, jnp.int32)
        .at[jnp.where(sp < P, sp, P)]
        .add(jnp.where(sp < P, inc, 0))[:P]
    )
    truncated = jnp.sum((sp < P) & (rank >= O))
    st = state._replace(mp_obs_kf=obs_kf, mp_obs_feat=obs_ft, mp_n_obs=n_obs)
    return st, truncated


def covisible_keyframes(state: MapState, k, min_weight: int = 15):
    """Weights row with threshold (reference GetCovisiblesByWeight)."""
    w = state.covis[k]
    return (w >= min_weight) & state.kf_valid
