"""Keyframe database: BoW rows per keyframe + loop/relocalization queries.

Replaces `KeyFrameDatabase` (reference src/KeyFrameDatabase.cc): the
inverted index `mvInvertedFile` (include/KeyFrameDatabase.h:64) exists to
skim candidate KFs on a CPU; here the whole database is one dense [K, V]
matrix and a query scores EVERY keyframe in a single broadcast — the
shared-word prefilter, min-score gate and covisibility-group accumulation
(DetectLoopCandidates, src/KeyFrameDatabase.cc:87-215) become masked
reductions.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orbslam2_tpu.vocab import bow


class KeyFrameDatabase:
    """Host wrapper owning the device-side [K, V] BoW matrix."""

    def __init__(self, codebook, max_keyframes: int, idf=None):
        self.codebook = codebook
        self.idf = idf          # [V] tf-idf weights (None = tf-only)
        V = bow.num_words(codebook)
        self.vectors = jnp.zeros((max_keyframes, V), jnp.float32)
        self.present = jnp.zeros((max_keyframes,), bool)

    def add(self, kf_id: int, descs, valid) -> jnp.ndarray:
        """Compute + store the BoW row; returns the vector."""
        v = bow.bow_vector(descs, valid, self.codebook, self.idf)
        self.vectors = self.vectors.at[kf_id].set(v)
        self.present = self.present.at[kf_id].set(True)
        return v

    def erase(self, kf_id: int):
        self.present = self.present.at[kf_id].set(False)

    def query(self, vec, exclude_mask, min_score, covis, max_candidates: int = 8):
        return _query(
            self.vectors, self.present, vec, exclude_mask,
            jnp.float32(min_score), covis, max_candidates,
        )


@partial(jax.jit, static_argnames=("max_candidates",))
def _query(vectors, present, vec, exclude_mask, min_score, covis, max_candidates: int = 8):
    """Loop/reloc candidate selection (reference DetectLoopCandidates,
    src/KeyFrameDatabase.cc:87-215):

    1. score query against every present, non-excluded KF;
    2. keep scores >= min_score;
    3. accumulate each candidate's score over its covisibility group =
       the candidate + its TOP-10 covisible neighbours that also scored
       (reference accScore over GetBestCovisibilityKeyFrames(10),
       src/KeyFrameDatabase.cc:170-196);
    4. each group is represented by its best-scoring member (reference
       pBestKF); return representatives of groups whose accumulated score
       >= 0.75 * best group score (src/KeyFrameDatabase.cc:198-215).

    Returns (cand_ids [C], cand_mask [C], scores [K]).
    """
    K = vectors.shape[0]
    scores = bow.l1_score(vec, vectors)  # [K]
    ok = present & ~exclude_mask & (scores >= min_score)
    scores_ok = jnp.where(ok, scores, 0.0)
    # top-10 covisible neighbours per candidate; only neighbours that
    # themselves passed the gates contribute (reference checks
    # mnLoopQuery/minCommonWords on each group member)
    ng = min(10, K)
    top_w, top_idx = jax.lax.top_k(covis, ng)          # [K, ng]
    neigh_ok = ok[top_idx] & (top_w > 0)
    neigh_scores = jnp.where(neigh_ok, scores[top_idx], 0.0)
    acc = scores_ok + neigh_scores.sum(-1)
    # group representative = best-scoring member (reference pBestKF)
    best_n = jnp.argmax(neigh_scores, axis=-1)
    best_n_score = jnp.take_along_axis(neigh_scores, best_n[:, None], 1)[:, 0]
    rows = jnp.arange(K)
    rep = jnp.where(best_n_score > scores_ok, top_idx[rows, best_n], rows)
    acc = jnp.where(ok, acc, -1.0)
    best = jnp.max(acc)
    admit_group = ok & (acc >= 0.75 * best) & (best > 0)
    # de-duplicate: several groups may elect the same representative; keep
    # the max accumulated score per representative
    rep_w = jnp.where(admit_group, rep, K)
    rep_acc = (
        jnp.full((K + 1,), -jnp.inf)
        .at[rep_w].max(jnp.where(admit_group, acc, -jnp.inf))[:K]
    )
    admit = rep_acc > -jnp.inf
    order = jnp.argsort(jnp.where(admit, -rep_acc, jnp.inf))
    cand = order[:max_candidates]
    cand_mask = admit[cand]
    return cand.astype(jnp.int32), cand_mask, scores
