"""Fused Pallas windowed-Hamming kernel vs the XLA reference path.

The kernel (ops/pallas_hamming.py) must be bit-identical to the XLA
composition (hamming_matrix + masks + best_match + mutual_filter) up to
argmin tie-breaking; the test data is built tie-free so the comparison
is exact.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from ar_orbslam2_tpu.ops import hamming as H
from ar_orbslam2_tpu.ops.pallas_hamming import fused_windowed_top2


def _problem(n=128, m=128, seed=0):
    rng = np.random.default_rng(seed)
    q_signs = (rng.integers(0, 2, (n, 256)) * 2 - 1).astype(np.int8)
    kp_signs = (rng.integers(0, 2, (m, 256)) * 2 - 1).astype(np.int8)
    # plant strong matches for half the queries
    for i in range(0, n, 2):
        j = i % m
        kp_signs[j] = q_signs[i]
        flip = rng.choice(256, rng.integers(0, 30), replace=False)
        kp_signs[j, flip] *= -1
    kp_uv = rng.uniform([0, 0], [640, 480], (m, 2)).astype(np.float32)
    q_uv = kp_uv[np.arange(n) % m] + rng.normal(0, 3, (n, 2)).astype(
        np.float32)
    radius = np.full(n, 15.0, np.float32)
    kp_oct = rng.integers(0, 8, m).astype(np.int32)
    olo = np.maximum(kp_oct[np.arange(n) % m] - 1, -1).astype(np.int32)
    ohi = (kp_oct[np.arange(n) % m] + 1).astype(np.int32)
    q_valid = rng.random(n) > 0.1
    kp_valid = rng.random(m) > 0.1
    return dict(q_signs=q_signs, q_uv=q_uv, radius=radius, olo=olo,
                ohi=ohi, q_valid=q_valid, kp_signs=kp_signs, kp_uv=kp_uv,
                kp_oct=kp_oct, kp_valid=kp_valid)


@pytest.mark.parametrize("mutual", [False, True])
def test_pallas_matches_xla(mutual):
    p = _problem()
    args = (jnp.asarray(p["q_signs"]), jnp.asarray(p["q_uv"]),
            jnp.asarray(p["radius"]), jnp.asarray(p["olo"]),
            jnp.asarray(p["ohi"]), jnp.asarray(p["q_valid"]),
            jnp.asarray(p["kp_signs"]), jnp.asarray(p["kp_uv"]),
            jnp.asarray(p["kp_oct"]), jnp.asarray(p["kp_valid"]))
    idx_x, d0_x = fused_windowed_top2(*args, th=H.TH_HIGH, nn_ratio=0.9,
                                      mutual=mutual, force="xla")
    idx_p, d0_p = fused_windowed_top2(*args, th=H.TH_HIGH, nn_ratio=0.9,
                                      mutual=mutual, force="pallas")
    idx_x, idx_p = np.asarray(idx_x), np.asarray(idx_p)
    # matched set must agree exactly; distances too (where matched)
    np.testing.assert_array_equal(idx_p, idx_x)
    matched = idx_x >= 0
    np.testing.assert_array_equal(np.asarray(d0_p)[matched],
                                  np.asarray(d0_x)[matched])
    assert matched.sum() > 20          # the planted matches are found


def test_pallas_finds_planted_matches():
    p = _problem(seed=3)
    idx, _ = fused_windowed_top2(
        jnp.asarray(p["q_signs"]), jnp.asarray(p["q_uv"]),
        jnp.asarray(p["radius"]), jnp.asarray(p["olo"]),
        jnp.asarray(p["ohi"]), jnp.asarray(p["q_valid"]),
        jnp.asarray(p["kp_signs"]), jnp.asarray(p["kp_uv"]),
        jnp.asarray(p["kp_oct"]), jnp.asarray(p["kp_valid"]),
        th=H.TH_HIGH, nn_ratio=0.9, mutual=True, force="pallas")
    idx = np.asarray(idx)
    hits = 0
    for i in range(0, 128, 2):
        if p["q_valid"][i] and p["kp_valid"][i % 128]:
            hits += int(idx[i] == i % 128)
    assert hits >= 30
