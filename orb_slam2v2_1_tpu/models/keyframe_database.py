"""Keyframe recognition database: dense BoW store + batched scoring.

Replaces `KeyFrameDatabase` (reference src/KeyFrameDatabase.cc): instead of
the word->keyframe inverted file walked per query (:76-197), keyframe BoW
vectors live in one dense (K, W) matrix and every query is a single masked
matmul/ L1-score against all keyframes at once. The candidate logic keeps the
reference semantics: exclude covisible keyframes, require a minimum score
relative to the query's covisible neighborhood, and accumulate
covisibility-group scores (DetectLoopCandidates) / no minScore for
relocalization (DetectRelocalizationCandidates, :199-310).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import hamming, vocab
from .map_state import MapState


class BowDatabase(NamedTuple):
    vectors: jax.Array  # (K, W) f32 L1-normalized tf-idf
    words: jax.Array  # (K, N) i32 per-keypoint word ids (for fast matching)
    valid: jax.Array  # (K,) bool


def empty_database(max_kf: int, n_kp: int, n_words: int) -> BowDatabase:
    return BowDatabase(
        vectors=jnp.zeros((max_kf, n_words), jnp.float32),
        words=jnp.zeros((max_kf, n_kp), jnp.int32),
        valid=jnp.zeros(max_kf, bool),
    )


# NOT donated: the BoW database is written by the loop worker but read
# concurrently by the tracking thread (relocalization candidates); donating
# would delete buffers the reader still holds (observed use-after-free on
# the pipelined path). The preserved-input copy is ~5 MB of HBM traffic per
# keyframe — microseconds at chip bandwidth.
@jax.jit
def add_keyframe(
    db: BowDatabase, voc: vocab.Vocabulary, kf_id: jax.Array,
    desc: jax.Array, kp_valid: jax.Array,
) -> BowDatabase:
    """Quantize a keyframe's descriptors and store its BoW vector
    (KeyFrameDatabase::add, src/KeyFrameDatabase.cc:40-47)."""
    pm1 = hamming.unpack_pm1(desc)
    words = vocab.assign_words(voc, pm1)
    vec = vocab.bow_vector(words, kp_valid, voc.word_weight, db.vectors.shape[1])
    return db._replace(
        vectors=db.vectors.at[kf_id].set(vec),
        words=db.words.at[kf_id].set(words),
        valid=db.valid.at[kf_id].set(True),
    )


@jax.jit
def add_and_detect_batch(
    db: BowDatabase, voc: vocab.Vocabulary, state: MapState, slots: jax.Array,
):
    """Add+detect for a BATCH of keyframes (slots padded with -1) in ONE
    dispatch per chunk instead of one per keyframe: all registrations land
    with one scatter (vmapped tree descent), then detection runs vmapped.
    Unlike the reference's strictly sequential order, keyframe i's detection
    can see same-batch keyframes j>i — harmless, because same-chunk
    keyframes are covisible neighbors and the candidate mask excludes the
    query's covisible group (detect_loop_candidates).

    Returns (db, scores (S,K), cand (S,K))."""
    ok = slots >= 0
    sl = jnp.maximum(slots, 0)

    def bow_row(desc, kp_valid):
        pm1 = hamming.unpack_pm1(desc)
        words = vocab.assign_words(voc, pm1)
        vec = vocab.bow_vector(words, kp_valid, voc.word_weight, db.vectors.shape[1])
        return words, vec

    words, vecs = jax.vmap(bow_row)(state.kf_desc[sl], state.kf_kp_valid[sl])
    tgt = jnp.where(ok, sl, db.vectors.shape[0])  # park pads out of range
    db = db._replace(
        vectors=db.vectors.at[tgt].set(vecs, mode="drop"),
        words=db.words.at[tgt].set(words, mode="drop"),
        valid=db.valid.at[tgt].set(True, mode="drop"),
    )
    scores, cand, _ = jax.vmap(
        detect_loop_candidates, in_axes=(None, None, 0)
    )(db, state, sl)
    return db, scores, cand & ok[:, None]


@jax.jit
def add_keyframe_from_state(
    db: BowDatabase, voc: vocab.Vocabulary, state, kf_id: jax.Array,
) -> BowDatabase:
    """Registration-only path with the keyframe row sliced INSIDE the jit:
    an eager `state.kf_desc[int]` outside bakes the index into a throwaway
    gather program per keyframe id (a fresh XLA compile on the worker thread
    while it holds the structural lock — measured as multi-hundred-ms
    tracking stalls at keyframe cadence)."""
    return add_keyframe(
        db, voc, kf_id, state.kf_desc[kf_id], state.kf_kp_valid[kf_id]
    )


@jax.jit
def add_and_detect(
    db: BowDatabase, voc: vocab.Vocabulary, state: MapState, kf_id: jax.Array,
):
    """Fused KeyFrameDatabase::add + DetectLoopCandidates: ONE dispatch per
    keyframe on the loop-closing cadence instead of two (each dispatch is a
    full tunnel round-trip on remote-attached chips)."""
    db = add_keyframe(db, voc, kf_id, state.kf_desc[kf_id], state.kf_kp_valid[kf_id])
    scores, cand, min_score = detect_loop_candidates(db, state, kf_id)
    return db, scores, cand


@jax.jit
def detect_loop_candidates(
    db: BowDatabase,
    state: MapState,
    query_kf: jax.Array,  # () i32
):
    """Loop candidates for a keyframe (DetectLoopCandidates,
    src/KeyFrameDatabase.cc:76-197).

    Returns (scores (K,), candidate_mask (K,), min_score ()) where candidates
    exclude the query's covisible neighborhood and must beat min_score = the
    lowest BoW similarity to a covisible neighbor.
    """
    # Cached covisibility: loop detection runs right after an insertion
    # round, where the cache was just refreshed.
    C = state.covis
    covis = C[query_kf] > 0  # connected keyframes
    q = db.vectors[query_kf]
    scores = vocab.bow_scores(q, db.vectors)
    scores = jnp.where(db.valid & state.kf_valid, scores, -1.0)

    # min_score over covisible neighbors (src/LoopClosing.cc:128-140).
    covis_scores = jnp.where(covis, scores, jnp.inf)
    min_score = jnp.minimum(jnp.min(covis_scores), 1.0)
    min_score = jnp.where(jnp.isinf(min_score), 0.0, min_score)

    self_or_covis = covis | (jnp.arange(scores.shape[0]) == query_kf)
    cand = (~self_or_covis) & (scores >= jnp.maximum(min_score, 1e-6))

    # Accumulated covisibility-group score: each candidate's score plus its
    # best covisible neighbors' scores; keep those >= 0.75 * best
    # (src/KeyFrameDatabase.cc:140-195).
    neigh_best = jnp.max(jnp.where(C > 0, scores[None, :], 0.0), axis=1)
    acc = jnp.where(cand, scores + neigh_best, -1.0)
    best_acc = jnp.max(acc)
    cand = cand & (acc >= 0.75 * best_acc) & (best_acc > 0)
    return scores, cand, min_score


@jax.jit
def detect_reloc_candidates(
    db: BowDatabase,
    state: MapState,
    frame_words: jax.Array,  # (N,) i32
    frame_kp_valid: jax.Array,
    word_weight: jax.Array,
):
    """Relocalization candidates for a lost frame
    (DetectRelocalizationCandidates, src/KeyFrameDatabase.cc:199-310)."""
    W = db.vectors.shape[1]
    q = vocab.bow_vector(frame_words, frame_kp_valid, word_weight, W)
    scores = vocab.bow_scores(q, db.vectors)
    scores = jnp.where(db.valid & state.kf_valid, scores, -1.0)
    best = jnp.max(scores)
    cand = scores >= 0.75 * jnp.maximum(best, 1e-9)
    return scores, cand & (best > 0)
