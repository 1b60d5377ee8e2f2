"""Binary bag-of-words vocabulary: training, quantization, scoring.

TPU-native replacement for the vendored DBoW2 (reference
`Thirdparty/DBoW2/DBoW2/TemplatedVocabulary.h`, `FORB.cpp`): a k-ary tree of
binary centroids trained by k-medians (bitwise majority vote = the Hamming
medoid update, `FORB::meanValue` semantics). Runtime quantization descends
the tree with batched +-1 MXU distance matmuls: 4 levels x (N,K) products for
a whole frame at once — no per-descriptor recursion.

BoW vectors are DENSE (W words, tf-idf, L1-normalized) so database scoring is
one matmul (see keyframe_database.py), replacing the inverted-file walk
(src/KeyFrameDatabase.cc:76-197).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from . import hamming

K_BRANCH = 10
LEVELS = 4  # 10^4 = 10000 words


class Vocabulary(NamedTuple):
    # Flattened tree: level l has K_BRANCH^(l+1) nodes.
    nodes_pm1: tuple  # per level: (K^(l+1), 256) bf16 centroids in +-1
    word_weight: jax.Array  # (W,) f32 idf weights
    # Per-level node validity for imported (incomplete) DBoW2 trees; empty
    # tuple = complete tree (all nodes valid).
    node_valid: tuple = ()

    @property
    def n_words(self) -> int:
        return self.nodes_pm1[-1].shape[0]


# ---------------------------------------------------------------------------
# Training (offline, NumPy)
# ---------------------------------------------------------------------------

def _kmedians_binary(bits: np.ndarray, k: int, rng, iters: int = 8) -> np.ndarray:
    """Binary k-medians: majority-vote centroids, Hamming assignment.

    bits: (N, 256) uint8 in {0,1}. Returns (k, 256) centroids.
    """
    n = bits.shape[0]
    if n <= k:
        out = np.zeros((k, 256), np.uint8)
        out[:n] = bits
        return out
    centers = bits[rng.choice(n, k, replace=False)].copy()
    for _ in range(iters):
        # Hamming distances via dot on +-1.
        pm_b = bits.astype(np.int32) * 2 - 1
        pm_c = centers.astype(np.int32) * 2 - 1
        d = 256 - pm_b @ pm_c.T  # monotone in Hamming
        assign = d.argmin(1)
        for j in range(k):
            sel = bits[assign == j]
            if len(sel):
                centers[j] = (sel.mean(0) > 0.5).astype(np.uint8)
            else:
                centers[j] = bits[rng.integers(n)]
    return centers


def train_vocabulary(descriptors: np.ndarray, rng=None) -> dict:
    """Train the k-ary tree from packed descriptors (N, 8) uint32.

    Returns plain numpy arrays (save with np.savez). Mirrors
    `TemplatedVocabulary::create` (HKmeansStep recursion) with k=10, L=4.
    """
    rng = rng or np.random.default_rng(0)
    bits = np.unpackbits(
        descriptors.view(np.uint8), axis=1, bitorder="little"
    ).astype(np.uint8)  # (N,256)

    levels = []
    groups = [np.arange(len(bits))]
    for lvl in range(LEVELS):
        centers_all = []
        next_groups = []
        for g in groups:
            centers = _kmedians_binary(bits[g], K_BRANCH, rng)
            centers_all.append(centers)
            if lvl < LEVELS - 1:
                pm_b = bits[g].astype(np.int32) * 2 - 1
                pm_c = centers.astype(np.int32) * 2 - 1
                assign = (256 - pm_b @ pm_c.T).argmin(1)
                for j in range(K_BRANCH):
                    next_groups.append(g[assign == j])
        levels.append(np.concatenate(centers_all))  # (K^(l+1), 256)
        groups = next_groups

    # idf weights from the training corpus word histogram.
    words = _assign_words_np(bits, levels)
    counts = np.bincount(words, minlength=K_BRANCH**LEVELS).astype(np.float64)
    n_docs = max(len(bits), 1)
    idf = np.log(n_docs / np.maximum(counts, 1.0)).astype(np.float32)
    return {
        **{f"level{l}": levels[l] for l in range(LEVELS)},
        "word_weight": idf,
    }


def _assign_words_np(bits: np.ndarray, levels: list[np.ndarray]) -> np.ndarray:
    node = np.zeros(len(bits), np.int64)
    pm_b = bits.astype(np.int32) * 2 - 1
    for lvl in range(LEVELS):
        base = node * K_BRANCH
        cand = levels[lvl][(base[:, None] + np.arange(K_BRANCH)[None, :]) % len(levels[lvl])]
        pm_c = cand.astype(np.int32) * 2 - 1
        d = 256 - np.einsum("nb,nkb->nk", pm_b, pm_c)
        node = base + d.argmin(1)
    return node


def load_vocabulary(npz) -> Vocabulary:
    """Load arrays (from np.load or a dict) into device form."""
    nodes = []
    for lvl in range(LEVELS):
        bits = np.asarray(npz[f"level{lvl}"], np.uint8)
        nodes.append(jnp.asarray(bits.astype(np.float32) * 2 - 1, jnp.bfloat16))
    return Vocabulary(
        nodes_pm1=tuple(nodes),
        word_weight=jnp.asarray(npz["word_weight"], jnp.float32),
    )


# ---------------------------------------------------------------------------
# DBoW2 text-format interop (TemplatedVocabulary::loadFromTextFile /
# saveToTextFile, TemplatedVocabulary.h:1351-1464): header "k L scoring
# weighting", then one node per line in insertion order:
# "parent isLeaf d0 .. d31 weight".
# ---------------------------------------------------------------------------

def import_dbow2_text(path, levels: int = LEVELS) -> Vocabulary:
    """Load a DBoW2 ORB text vocabulary (e.g. the stock ORBvoc.txt) into the
    flattened-tree runtime form.

    Trees deeper than `levels` are truncated: depth-`levels` nodes become
    words, with weight = sum of descendant leaf weights (tf-idf mass is
    preserved). Incomplete branches are masked via Vocabulary.node_valid so
    tree descent never routes into a hole.
    """
    with open(path) as f:
        header = f.readline().split()
        k = int(header[0])
        if k != K_BRANCH:
            raise ValueError(f"only k={K_BRANCH} vocabularies supported, got k={k}")
        parents, is_leaf, descs, weights = [], [], [], []
        for line in f:
            parts = line.split()
            if len(parts) < 35:
                continue
            parents.append(int(parts[0]))
            is_leaf.append(int(parts[1]) > 0)
            descs.append(np.array(parts[2:34], np.uint8))
            weights.append(float(parts[34]))
    n = len(parents)
    parents = np.asarray(parents)
    # Node ids in the file are 1-based (root = 0, implicit); compute depth and
    # per-parent child rank in insertion order (the parser at
    # TemplatedVocabulary.h:1397-1404 appends children in file order).
    depth = np.zeros(n + 1, np.int32)  # [0] = root
    rank = np.zeros(n, np.int32)
    child_count = np.zeros(n + 1, np.int32)
    for i in range(n):
        p = parents[i]
        depth[i + 1] = depth[p] + 1
        rank[i] = child_count[p]
        child_count[p] += 1

    # Flat slot of each node in the complete K^depth layout.
    slot = np.zeros(n + 1, np.int64)
    for i in range(n):
        slot[i + 1] = slot[parents[i]] * K_BRANCH + rank[i]

    bits_all = np.unpackbits(
        np.stack(descs) if descs else np.zeros((0, 32), np.uint8),
        axis=1, bitorder="little",
    )
    level_bits = []
    level_valid = []
    for lvl in range(levels):
        size = K_BRANCH ** (lvl + 1)
        lb = np.zeros((size, 256), np.uint8)
        lv = np.zeros(size, bool)
        sel = np.nonzero(depth[1:] == lvl + 1)[0]
        lb[slot[sel + 1]] = bits_all[sel]
        lv[slot[sel + 1]] = True
        level_bits.append(lb)
        level_valid.append(lv)

    # Word weights at the truncation depth: accumulate every original leaf's
    # weight into its depth-`levels` ancestor slot.
    w = np.zeros(K_BRANCH ** levels, np.float64)
    anc = np.zeros(n + 1, np.int64)  # ancestor slot at `levels`, tracked lazily
    for i in range(n):
        d = depth[i + 1]
        if d == levels:
            anc[i + 1] = slot[i + 1]
        elif d > levels:
            anc[i + 1] = anc[parents[i]]
        if is_leaf[i] and d >= levels:
            w[anc[i + 1]] += weights[i]
        elif is_leaf[i] and d < levels:
            # Shallow leaf: its subtree is a single chain of copies; weight
            # lands on its slot scaled up to the truncation depth.
            s = slot[i + 1]
            for _ in range(levels - d):
                s = s * K_BRANCH
            w[s] += weights[i]
            # Make the descent able to reach it: replicate the centroid down.
            for l2 in range(d, levels):
                s2 = slot[i + 1]
                for _ in range(l2 + 1 - d):
                    s2 = s2 * K_BRANCH
                level_bits[l2][s2] = bits_all[i]
                level_valid[l2][s2] = True

    nodes = tuple(
        jnp.asarray(b.astype(np.float32) * 2 - 1, jnp.bfloat16) for b in level_bits
    )
    return Vocabulary(
        nodes_pm1=nodes,
        word_weight=jnp.asarray(w, jnp.float32),
        node_valid=tuple(jnp.asarray(v) for v in level_valid),
    )


def export_dbow2_text(vocab_npz: dict, path, scoring: int = 0, weighting: int = 0):
    """Write our trained complete tree in DBoW2 text format (saveToTextFile
    layout) so reference-tooling users can consume it."""
    levels = [np.asarray(vocab_npz[f"level{l}"], np.uint8) for l in range(LEVELS)]
    weight = np.asarray(vocab_npz["word_weight"], np.float64)
    with open(path, "w") as f:
        f.write(f"{K_BRANCH} {LEVELS}  {scoring} {weighting}\n")
        # Complete tree, breadth-first: file node id of (lvl, slot) =
        # 1 + sum_{l<lvl} K^(l+1) + slot; root is implicit id 0.
        offset = [0]
        for l in range(LEVELS):
            offset.append(offset[-1] + K_BRANCH ** (l + 1))
        for lvl in range(LEVELS):
            bits = levels[lvl]
            for s in range(bits.shape[0]):
                parent = 0 if lvl == 0 else offset[lvl - 1] + s // K_BRANCH + 1
                leaf = 1 if lvl == LEVELS - 1 else 0
                byts = np.packbits(bits[s], bitorder="little")
                w = weight[s] if leaf else 0.0
                f.write(
                    f"{parent} {leaf} " + " ".join(str(int(b)) for b in byts)
                    + f" {w}\n"
                )


# ---------------------------------------------------------------------------
# Runtime quantization + BoW (device)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=())
def assign_words(vocab: Vocabulary, desc_pm1: jax.Array) -> jax.Array:
    """Tree descent: (N, 256) descriptors -> (N,) int32 word ids.

    Each level: gather the current node's K children and pick the
    Hamming-nearest via one batched matmul (`TemplatedVocabulary::transform`
    descent, TemplatedVocabulary.h:1075-1122)."""
    n = desc_pm1.shape[0]
    node = jnp.zeros(n, jnp.int32)
    for lvl in range(LEVELS):
        children = vocab.nodes_pm1[lvl]  # (K^(l+1), 256)
        base = node * K_BRANCH
        cand_idx = base[:, None] + jnp.arange(K_BRANCH)[None, :]  # (N, K)
        cand = children[cand_idx]  # (N, K, 256)
        dots = jnp.einsum(
            "nb,nkb->nk", desc_pm1, cand, preferred_element_type=jnp.float32
        )
        if vocab.node_valid:
            dots = jnp.where(vocab.node_valid[lvl][cand_idx], dots, -jnp.inf)
        node = base + jnp.argmax(dots, axis=1).astype(jnp.int32)  # max dot = min Hamming
    return node


@partial(jax.jit, static_argnames=("depth",))
def assign_nodes(vocab: Vocabulary, desc_pm1: jax.Array, depth: int = 2) -> jax.Array:
    """Truncated tree descent: (N, 256) descriptors -> (N,) ids of their
    level-`depth` ancestor node.

    This is the FeatureVector alignment node of the reference's
    `SearchByBoW`/`SearchForTriangulation` (src/ORBmatcher.cc:522-825):
    DBoW2 stores features under a coarse tree node and only matches features
    sharing it. Matching masks AND a `node_q == node_t` test — the same
    pruning, expressed as a mask on the dense match matrix instead of an
    inverted-file walk."""
    n = desc_pm1.shape[0]
    node = jnp.zeros(n, jnp.int32)
    for lvl in range(depth):
        children = vocab.nodes_pm1[lvl]
        base = node * K_BRANCH
        cand_idx = base[:, None] + jnp.arange(K_BRANCH)[None, :]
        cand = children[cand_idx]
        dots = jnp.einsum(
            "nb,nkb->nk", desc_pm1, cand, preferred_element_type=jnp.float32
        )
        if vocab.node_valid:
            dots = jnp.where(vocab.node_valid[lvl][cand_idx], dots, -jnp.inf)
        node = base + jnp.argmax(dots, axis=1).astype(jnp.int32)
    return node


@partial(jax.jit, static_argnames=("n_words",))
def bow_vector(
    words: jax.Array, valid: jax.Array, word_weight: jax.Array, n_words: int
) -> jax.Array:
    """tf-idf L1-normalized dense BoW vector (W,) f32."""
    hist = jnp.zeros(n_words + 1, jnp.float32).at[
        jnp.where(valid, words, n_words)
    ].add(1.0)[:n_words]
    v = hist * word_weight
    return v / jnp.maximum(jnp.sum(v), 1e-9)


def bow_scores(query: jax.Array, database: jax.Array) -> jax.Array:
    """L1 similarity between a query (W,) and database rows (K, W):
    s = 1 - 0.5*||q - d||_1 (DBoW2 L1Scoring, ScoringObject.cpp:315) —
    computed densely."""
    diff = jnp.abs(query[None, :] - database)
    return 1.0 - 0.5 * jnp.sum(diff, axis=-1)
