"""Binary k-medians codebook training for place recognition.

The reference ships a 145 MB pre-trained DBoW2 vocabulary (k=10, L=6,
~1M leaf words — SURVEY §2.2); place_recognition.py replaces the tree
with a flat codebook evaluated as ONE Hamming matmul on the MXU. This
module trains that codebook from scene descriptors with binary k-medians
(Hamming assignment + per-bit majority vote), the natural binary-descriptor
analog of the k-means DBoW2 uses per tree level.

Used by the loop-recall study (loop/recall_study.py) to compare a random
codebook against a trained one; the study's verdict decides the default.
"""
from __future__ import annotations

import numpy as np

from ..ops import hamming as H


def assign_words(desc_signs, word_signs, chunk=8192):
    """Nearest word per descriptor (Hamming argmin), chunked matmuls.

    Chunks are PADDED to a fixed size so every call reuses one compiled
    kernel (a ragged tail chunk would mint a fresh XLA compile per
    training-set size — this runs on the live mapping worker)."""
    import jax.numpy as jnp

    out = []
    n = desc_signs.shape[0]
    for lo in range(0, n, chunk):
        block = desc_signs[lo:lo + chunk]
        pad = chunk - len(block)
        if pad:
            block = np.concatenate([block, np.zeros((pad,) + block.shape[1:],
                                                    block.dtype)])
        d = H.hamming_matrix(jnp.asarray(block), word_signs)
        a = np.asarray(jnp.argmin(d, axis=1))
        out.append(a[:len(a) - pad] if pad else a)
    return np.concatenate(out)


def train_codebook(desc_bits, n_words=4096, n_iters=6, seed=0):
    """Binary k-medians over {0,1}^256 descriptors.

    Args:
      desc_bits: (N, 256) uint8 training descriptors.
    Returns:
      (n_words, 256) uint8 codebook bits.
    """
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    desc_bits = np.asarray(desc_bits, np.uint8)
    n = len(desc_bits)
    if n < n_words:                     # degenerate: pad with random words
        pad = (rng.random((n_words - n, H.DESC_BITS)) < 0.5).astype(np.uint8)
        desc_bits = np.concatenate([desc_bits, pad])
        n = len(desc_bits)
    # k-means++-lite init: random distinct training descriptors
    words = desc_bits[rng.choice(n, n_words, replace=False)].copy()
    signs = desc_bits.astype(np.int8) * 2 - 1
    for _ in range(n_iters):
        w_signs = jnp.asarray(words.astype(np.int8) * 2 - 1)
        a = assign_words(signs, w_signs)
        # per-word majority bit vote (the binary median). Sort-based
        # reduceat instead of np.add.at: add.at is an unbuffered scalar
        # loop that HOLDS THE GIL for seconds at this size — training on
        # the mapping worker froze the tracking thread mid-run (the r3
        # bench's one 30 s frame).
        order = np.argsort(a, kind="stable")
        a_sorted = a[order]
        starts = np.nonzero(np.r_[True, a_sorted[1:] != a_sorted[:-1]])[0]
        seg_sums = np.add.reduceat(desc_bits[order].astype(np.int32),
                                   starts, axis=0)
        sums = np.zeros((n_words, H.DESC_BITS), np.int32)
        sums[a_sorted[starts]] = seg_sums
        counts = np.bincount(a, minlength=n_words)
        nz = counts > 0
        maj = np.zeros_like(words)
        maj[nz] = (2 * sums[nz] >= counts[nz, None]).astype(np.uint8)
        # empty words: re-seed from random descriptors
        n_empty = int((~nz).sum())
        if n_empty:
            maj[~nz] = desc_bits[rng.choice(n, n_empty, replace=False)]
        if np.array_equal(maj, words):
            break
        words = maj
    return words
