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

    def __init__(self, codebook: jnp.ndarray, max_keyframes: int):
        self.codebook = codebook
        V = codebook.shape[0]
        self.vectors = jnp.zeros((max_keyframes, V), jnp.float32)
        self.present = jnp.zeros((max_keyframes,), bool)

    def add(self, kf_id: int, descs, valid) -> jnp.ndarray:
        """Compute + store the BoW row; returns the vector."""
        v = bow.bow_vector(descs, valid, self.codebook)
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
    3. accumulate each candidate's score over its top covisibility group
       (covis weight > 0 neighbours), like the reference's accScore;
    4. return candidates whose group score >= 0.75 * best group score.

    Returns (cand_ids [C], cand_mask [C], scores [K]).
    """
    scores = bow.l1_score(vec, vectors)  # [K]
    ok = present & ~exclude_mask & (scores >= min_score)
    scores_ok = jnp.where(ok, scores, 0.0)
    # group score: candidate + ITS covisible neighbours that also scored
    # (per-candidate accumulation needs the full [K, K] covisibility
    # matrix; reference accScore over the candidate's top-10 covisibles,
    # src/KeyFrameDatabase.cc:170-196)
    covis_pos = (covis > 0).astype(jnp.float32)
    acc = scores_ok + covis_pos @ scores_ok
    acc = jnp.where(ok, acc, -1.0)
    best = jnp.max(acc)
    admit = ok & (acc >= 0.75 * best) & (best > 0)
    order = jnp.argsort(jnp.where(admit, -acc, jnp.inf))
    cand = order[:max_candidates]
    cand_mask = admit[cand]
    return cand.astype(jnp.int32), cand_mask, scores
