"""Binary-descriptor Hamming distance on the MXU.

TPU-native replacement for the reference's ORBmatcher::DescriptorDistance
(src/ORBmatcher.cc:≈1640 — the SSE popcount bit-trick) and every per-pair
Hamming loop built on it. The TPU idiom (SURVEY.md §7 design stance):
descriptors as ±1 vectors, so

    hamming(a, b) = (256 - <±1(a), ±1(b)>) / 2

turning an entire N x M candidate search into ONE int8 matmul on the
128x128 systolic array — thousands of descriptor pairs per MXU pass
instead of a scalar popcount loop.

Canonical representations:
  * bits:  (N, 256) uint8 in {0, 1}   — host/interop format
  * signs: (N, 256) int8  in {-1, +1} — device matmul format
  * packed:(N, 32)  uint8             — storage (parity with the
                                        reference's 32-byte cv::Mat rows)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

DESC_BITS = 256
DESC_BYTES = 32
# matching thresholds, parity with ORBmatcher (src/ORBmatcher.cc TH_LOW/TH_HIGH)
TH_LOW = 50
TH_HIGH = 100


def pack_bits(bits):
    """(N, 256) {0,1} -> (N, 32) uint8 (LSB-first within each byte)."""
    bits = np.asarray(bits, np.uint8).reshape(-1, DESC_BYTES, 8)
    return np.packbits(bits, axis=-1, bitorder="little").reshape(-1, DESC_BYTES)


def unpack_bits(packed):
    """(N, 32) uint8 -> (N, 256) {0,1} uint8."""
    packed = np.asarray(packed, np.uint8)
    return np.unpackbits(packed, axis=-1, bitorder="little")


def pack_bits_device(bits):
    """Device-side pack: (..., 256) {0,1} -> (..., 32) uint8, LSB-first —
    same byte layout as pack_bits/unpack_bits. Used to shrink snapshot
    readbacks 8x (the transport reads back at ~30 MB/s)."""
    b = jnp.asarray(bits, jnp.int32).reshape(bits.shape[:-1]
                                             + (DESC_BYTES, 8))
    w = jnp.left_shift(jnp.int32(1), jnp.arange(8, dtype=jnp.int32))
    return jnp.sum(b * w, axis=-1).astype(jnp.uint8)


def to_signs(bits):
    """{0,1} bits -> ±1 int8 (device format)."""
    return (jnp.asarray(bits, jnp.int8) * 2 - 1).astype(jnp.int8)


def unpack_bits_device(packed):
    """Device-side unpack: (..., 32) uint8 -> (..., 256) {0,1} uint8,
    LSB-first (same layout as unpack_bits). Lets callers upload PACKED
    descriptors (8x smaller) and expand on device inside a jit."""
    p = jnp.asarray(packed, jnp.uint8)
    w = jnp.arange(8, dtype=jnp.uint8)
    bits = jnp.bitwise_and(
        jnp.right_shift(p[..., :, None], w), jnp.uint8(1))
    return bits.reshape(p.shape[:-1] + (DESC_BITS,))


def signs_from_packed(packed):
    """Packed (..., 32) uint8 descriptors -> ±1 int8 signs, on device.
    Trace-safe (pure jnp) — call inside a jit or via signs_from_packed_jit."""
    return (unpack_bits_device(packed).astype(jnp.int8) * 2 - 1)


signs_from_packed_jit = jax.jit(signs_from_packed)


def hamming_matrix(signs_a, signs_b, valid_a=None, valid_b=None,
                   invalid_dist=DESC_BITS + 1):
    """All-pairs Hamming distances via one MXU matmul.

    Args:
      signs_a: (N, 256) int8 ±1. signs_b: (M, 256) int8 ±1.
      valid_a/valid_b: optional bool masks; invalid rows/cols get
        `invalid_dist` so downstream argmin/threshold logic ignores them.
    Returns:
      (N, M) int32 Hamming distances in [0, 256].
    """
    dot = jax.lax.dot_general(
        signs_a, signs_b,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)
    d = (DESC_BITS - dot) >> 1
    if valid_a is not None:
        d = jnp.where(valid_a[:, None], d, invalid_dist)
    if valid_b is not None:
        d = jnp.where(valid_b[None, :], d, invalid_dist)
    return d


def hamming_pairs(signs_a, signs_b):
    """Row-wise Hamming distance of aligned pairs: (N,256),(N,256)->(N,)."""
    dot = jnp.sum(signs_a.astype(jnp.int32) * signs_b.astype(jnp.int32), -1)
    return (DESC_BITS - dot) >> 1


def best_match(dist, th=TH_LOW, nn_ratio=1.0):
    """Per-row best column under threshold + Lowe ratio test.

    Parity with ORBmatcher's best/secondbest bookkeeping (mfNNratio).
    Returns (idx (N,) int32 with -1 for no match, best_dist (N,) int32).
    """
    # top-2 smallest via top_k on the negated distances — O(M) per row on
    # the VPU instead of a full argsort.
    neg_vals, idx = jax.lax.top_k(-dist, 2)
    best = idx[:, 0]
    d0, d1 = -neg_vals[:, 0], -neg_vals[:, 1]
    ok = (d0 <= th) & (d0.astype(jnp.float32)
                       <= nn_ratio * d1.astype(jnp.float32))
    return jnp.where(ok, best, -1).astype(jnp.int32), d0


def mutual_filter(idx_ab, idx_ba):
    """Keep only mutual nearest-neighbour matches.

    idx_ab: (N,) best b for each a; idx_ba: (M,) best a for each b.
    """
    n = idx_ab.shape[0]
    back = jnp.where(idx_ab >= 0, jnp.take(idx_ba, jnp.maximum(idx_ab, 0)), -2)
    mutual = back == jnp.arange(n)
    return jnp.where(mutual, idx_ab, -1)


def rotation_consistency(angles_a, angles_b, match_idx, n_bins=30, top_k=3):
    """Orientation-histogram filter, parity with ORBmatcher's 30-bin
    rotHist keeping the top-3 bins (ComputeThreeMaxima).

    Args:
      angles_a: (N,) degrees; angles_b: (M,) degrees;
      match_idx: (N,) index into b or -1.
    Returns: (N,) int32 match_idx with inconsistent matches set to -1.
    """
    matched = match_idx >= 0
    rot = angles_a - jnp.take(angles_b, jnp.maximum(match_idx, 0))
    rot = jnp.where(rot < 0, rot + 360.0, rot)
    factor = n_bins / 360.0
    bin_idx = jnp.round(rot * factor).astype(jnp.int32) % n_bins
    hist = jnp.zeros(n_bins, jnp.int32).at[bin_idx].add(
        matched.astype(jnp.int32))
    # top-3 bins, with the reference's 10%-of-max secondary-bin cut
    top_vals, top_bins = jax.lax.top_k(hist, top_k)
    keep_bin = top_vals >= jnp.maximum((0.1 * top_vals[0]).astype(jnp.int32), 1)
    in_top = jnp.any((bin_idx[:, None] == top_bins[None, :]) & keep_bin[None, :],
                     axis=1)
    return jnp.where(matched & in_top, match_idx, -1)
