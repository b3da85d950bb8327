"""Place recognition — bag-of-binary-words as dense MXU ops.

TPU-native replacement for DBoW2 + KeyFrameDatabase (SURVEY.md §2.2 plan):
the reference's 1M-leaf vocabulary tree exists to make CPU descriptor->word
assignment O(k·L); on the MXU, assigning 1024 descriptors to a W-word
vocabulary is ONE Hamming matmul + argmin, so the tree disappears. A frame
becomes a tf-normalized word histogram ("BowVector"); similarity is the
DBoW2 L1 score s(a,b) = 1 - 0.5*|a - b|_1 = sum(min(a_i, b_i)) for
L1-normalized vectors, evaluated against ALL keyframes at once.

The vocabulary itself is a fixed random binary codebook (no 145 MB asset,
no training run needed offline): for matching-free *scoring* purposes a
random codebook quantizes descriptor space uniformly, which preserves the
similarity ordering the candidate gates rely on. Word ids are also exported
per feature so matchers could gate by shared words (FeatureVector parity),
though the dense Hamming search makes that unnecessary.

Candidate selection semantics mirror KeyFrameDatabase
(src/KeyFrameDatabase.cc): loop candidates must beat the min covisible
score and survive covisibility-group accumulation with a 0.75*best cut;
relocalization candidates skip the minScore gate.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import hamming as H


class VocabTensor:
    """Binary vocabulary evaluated as one Hamming matmul.

    The startup codebook is random (quantizes descriptor space uniformly
    — no 145 MB asset, no startup cost); a k-medians codebook trained on
    scene descriptors (loop/vocab_train.py) can be passed via `bits`.
    The loop-recall study (LOOP_RECALL.md, loop/recall_study.py) shows
    the two tie under mild/moderate revisit noise but the trained one
    dominates under severe viewpoint change (recall@1 0.96 vs 0.18), so
    KeyFrameDatabase.maybe_retrain self-trains from the map's own
    descriptors once enough keyframes exist — the online analog of
    DBoW2's offline vocabulary build."""

    def __init__(self, n_words: int = 4096, seed: int = 42, bits=None):
        if bits is None:
            rng = np.random.default_rng(seed)
            bits = (rng.random((n_words, H.DESC_BITS)) < 0.5
                    ).astype(np.uint8)
        else:
            bits = np.asarray(bits, np.uint8)
            n_words = bits.shape[0]
        self.n_words = n_words
        self.signs = H.to_signs(bits)

    def transform(self, desc_signs, valid):
        """Descriptors -> (word ids (N,), tf bow vector (W,) L1-normed).

        Parity: TemplatedVocabulary::transform producing BowVector (+ the
        word ids double as the FeatureVector node ids). The codebook is a
        TRACED argument — a static-self jit recompiled on the mapping
        worker whenever the vocabulary retrained (id-based hash).
        """
        return _transform_kernel(desc_signs, valid, self.signs)


@jax.jit
def _transform_kernel(desc_signs, valid, vocab_signs):
    D = H.hamming_matrix(desc_signs, vocab_signs)
    words = jnp.argmin(D, axis=1).astype(jnp.int32)
    n_words = vocab_signs.shape[0]
    w = jnp.where(valid, 1.0, 0.0)
    bow = jnp.zeros(n_words, jnp.float32).at[words].add(w)
    bow = bow / jnp.maximum(bow.sum(), 1e-9)
    return words, bow


@jax.jit
def l1_scores(bow_query, bow_db, db_valid):
    """DBoW2 L1 score of a query against every DB row: (K,) in [0, 1]."""
    s = jnp.sum(jnp.minimum(bow_query[None, :], bow_db), -1)
    return jnp.where(db_valid, s, -1.0)


@jax.jit
def _bow_set_row(bow_db, kf, row):
    return bow_db.at[kf].set(row)


class KeyFrameDatabase:
    """Inverted-index replacement: dense [MAX_KF, W] bow matrix + masks."""

    def __init__(self, store, vocab: VocabTensor | None = None):
        self.store = store
        self.vocab = vocab or VocabTensor()
        K = store.cfg.max_keyframes
        self.bow = np.zeros((K, self.vocab.n_words), np.float32)
        self.has_bow = np.zeros(K, bool)
        self.trained = vocab is not None   # custom vocab: NEVER retrain
        self._trained_at = float("inf") if vocab is not None else 0
        # device-resident mirror of the bow matrix: scoring against the
        # (MAX_KF, W) database is a tiny matmul, but uploading the host
        # copy per query cost 16+ MB on every KeyFrameDatabase query —
        # measured 200 ms of every keyframe event on the live transport.
        # add() updates one row on device; bulk rewrites invalidate.
        self._bow_dev = None

    def maybe_retrain(self, min_kfs: int = 24, max_train: int = 30_000,
                      n_iters: int = 4):
        """K-medians codebook training from the map's own descriptors
        (LOOP_RECALL.md: the trained codebook dominates under severe
        viewpoint change). Re-encodes all stored bow vectors. First
        fires at min_kfs keyframes, then again whenever the map has
        QUADRUPLED since the last training — a codebook fitted to the
        first room drifts as the trajectory enters new appearance
        regimes (VERDICT r4 weak #10)."""
        s = self.store
        n_kf = s.n_keyframes()
        if n_kf < min_kfs:
            return False
        if self.trained and n_kf < 4 * max(self._trained_at, 1):
            return False
        kfs = np.nonzero(self.has_bow & s.kf_valid)[0]
        descs = s.kf_desc[kfs][s.kf_kp_valid[kfs]]
        if len(descs) > max_train:
            rng = np.random.default_rng(0)
            descs = descs[rng.choice(len(descs), max_train, replace=False)]
        from .vocab_train import train_codebook
        bits = train_codebook(H.unpack_bits(descs).reshape(-1, H.DESC_BITS),
                              n_words=self.vocab.n_words, n_iters=n_iters)
        self.vocab = VocabTensor(bits=bits)
        self.trained = True
        self._trained_at = n_kf
        self._bow_dev = None     # bulk re-encode: one re-upload at next query
        for kf in kfs:
            self.add(int(kf))
        return True

    def compute_bow(self, desc_bits, valid):
        signs = H.to_signs(desc_bits)
        words, bow = self.vocab.transform(signs, jnp.asarray(valid))
        words, bow = jax.device_get((words, bow))   # ONE transport sync
        return np.asarray(words), np.asarray(bow)

    def add(self, kf: int, bow=None):
        """Parity: KeyFrameDatabase::add."""
        if bow is None:
            s = self.store
            bits = H.unpack_bits(s.kf_desc[kf])
            _, bow = self.compute_bow(bits, s.kf_kp_valid[kf])
        self.bow[kf] = bow
        self.has_bow[kf] = True
        if self._bow_dev is not None:       # one-row device update
            self._bow_dev = _bow_set_row(
                self._bow_dev, jnp.int32(kf),
                jnp.asarray(np.asarray(bow, np.float32)))

    def _bow_db_device(self):
        if self._bow_dev is None:
            self._bow_dev = jnp.asarray(self.bow)
        return self._bow_dev

    def _scores(self, bow_query, exclude=()):
        s = self.store
        db_valid = self.has_bow & s.kf_valid
        for e in exclude:
            if e >= 0:
                db_valid = db_valid.copy()
                db_valid[e] = False
        return np.array(l1_scores(jnp.asarray(bow_query),
                                  self._bow_db_device(),
                                  jnp.asarray(db_valid)))

    def _group_accumulate(self, scores, min_score):
        """Covisibility-group score accumulation + 0.75*best cut.
        Parity: the accScore loop in DetectLoop/RelocalizationCandidates."""
        s = self.store
        cand = np.nonzero(scores > min_score)[0]
        if len(cand) == 0:
            return []
        acc_best_kf = {}
        acc_scores = {}
        for k in cand:
            group = [int(k)] + [int(g) for g in
                                s.covisible_keyframes(int(k), n_best=10)]
            acc = float(sum(max(scores[g], 0.0) for g in group))
            best_in_group = max(group, key=lambda g: scores[g])
            acc_scores[int(k)] = acc
            acc_best_kf[int(k)] = int(best_in_group)
        best_acc = max(acc_scores.values())
        keep, out = set(), []
        for k, acc in sorted(acc_scores.items(), key=lambda kv: -kv[1]):
            if acc < 0.75 * best_acc:
                continue
            b = acc_best_kf[k]
            if b not in keep:
                keep.add(b)
                out.append(b)
        return out

    def detect_loop_candidates(self, kf: int, bow=None):
        """Parity: KeyFrameDatabase::DetectLoopCandidates — exclude the
        covisible neighborhood, gate at the min covisible score."""
        s = self.store
        if bow is None:
            bow = self.bow[kf]
        connected = [int(k) for k in s.covisible_keyframes(kf)]
        scores = self._scores(bow, exclude=[kf])
        covis_scores = [float(scores[c]) for c in connected
                        if self.has_bow[c]]
        min_score = max(min(covis_scores, default=0.0), 0.0)
        for c in connected:
            scores[c] = -1.0
        return self._group_accumulate(scores, min_score)

    def detect_relocalization_candidates(self, bow):
        """Parity: KeyFrameDatabase::DetectRelocalizationCandidates —
        same accumulation, no minScore gate."""
        scores = self._scores(bow)
        if (scores > 0).sum() == 0:
            return []
        # ref gates at 0.8 * best common-words; tf-score analog: 0.8 * max
        th = 0.8 * float(scores.max())
        return self._group_accumulate(scores, max(th, 0.0))
