"""Parity tests: native map-graph kernels vs their numpy oracles.

The native library (native/mapgraph.cpp) must be bit-identical to the
vectorized numpy implementations in mapstore/map.py (which themselves are
semantics-parity with MapPoint::ComputeDistinctiveDescriptors /
UpdateNormalAndDepth / KeyFrame::UpdateConnections).
"""
import numpy as np
import pytest

from ar_orbslam2_tpu.mapstore.map import MapConfig, MapStore
from ar_orbslam2_tpu.native import mapgraph as native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native mapgraph lib not built")


def _populated_store(seed=0, n_kf=8, n_mp=300, obs_per_mp=(2, 8)):
    rng = np.random.default_rng(seed)
    cfg = MapConfig(max_keyframes=16, max_map_points=2048, max_kp=128,
                    max_obs=12)
    s = MapStore(cfg)
    for k in range(n_kf):
        w = rng.normal(0, 0.1, 3)
        th = np.linalg.norm(w) + 1e-9
        Kx = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]],
                       [-w[1], w[0], 0]]) / th
        R = (np.eye(3) + np.sin(th) * Kx
             + (1 - np.cos(th)) * Kx @ Kx).astype(np.float32)
        t = rng.normal(0, 0.5, 3).astype(np.float32)
        uv = rng.uniform(0, 640, (cfg.max_kp, 2)).astype(np.float32)
        desc = rng.integers(0, 256, (cfg.max_kp, 32), dtype=np.uint8)
        octv = rng.integers(0, 8, cfg.max_kp).astype(np.int32)
        s.add_keyframe(R, t, uv, desc, octv, np.ones(cfg.max_kp, bool))
    pos = rng.uniform([-2, -2, 2], [2, 2, 8], (n_mp, 3)).astype(np.float32)
    desc = rng.integers(0, 256, (n_mp, 32), dtype=np.uint8)
    ids = s.add_map_points(pos, desc, first_kf=0)
    for m in ids:
        n_obs = rng.integers(*obs_per_mp)
        kfs = rng.choice(n_kf, min(n_obs, n_kf), replace=False)
        for kf in kfs:
            feat = int(rng.integers(0, cfg.max_kp))
            if s.kf_mp[kf, feat] < 0:
                s.add_observation(int(m), int(kf), feat)
    return s, ids


def test_distinctive_descriptors_parity():
    s, ids = _populated_store()
    ids = ids[s.mp_nobs[ids] > 0]
    native.distinctive_descriptors(s, ids)
    got = s.mp_desc[ids].copy()
    s._compute_distinctive_descriptors_np(ids)
    want = s.mp_desc[ids]
    assert np.array_equal(got, want)


def test_update_normal_and_depth_parity():
    s, ids = _populated_store(seed=1)
    ids = ids[s.mp_nobs[ids] > 0]
    native.update_normal_and_depth(s, ids)
    got = (s.mp_normal[ids].copy(), s.mp_dmin[ids].copy(),
           s.mp_dmax[ids].copy())
    s._update_normal_and_depth_np(ids)
    assert np.allclose(got[0], s.mp_normal[ids], atol=1e-5)
    assert np.allclose(got[1], s.mp_dmin[ids], rtol=1e-5)
    assert np.allclose(got[2], s.mp_dmax[ids], rtol=1e-5)


def test_update_connections_parity():
    s, ids = _populated_store(seed=2)
    s2, _ = _populated_store(seed=2)
    for kf in range(8):
        native.update_connections(s, kf)
        s2._update_connections_np(kf)
    assert np.array_equal(s.covis, s2.covis)
    assert np.array_equal(s.kf_parent, s2.kf_parent)


def test_hamming_matrix_parity(rng):
    a = rng.integers(0, 256, (33, 32), dtype=np.uint8)
    b = rng.integers(0, 256, (65, 32), dtype=np.uint8)
    D = native.hamming_matrix(a, b)
    ref = np.unpackbits(a[:, None, :] ^ b[None, :, :], axis=-1).sum(-1)
    assert np.array_equal(D, ref)


def test_obs_beyond_64_would_not_truncate():
    """Advisor finding: buffers must size from O, not a fixed 64."""
    cfg = MapConfig(max_keyframes=4, max_map_points=128, max_kp=80,
                    max_obs=72)
    rng = np.random.default_rng(3)
    s = MapStore(cfg)
    for k in range(2):
        desc = rng.integers(0, 256, (cfg.max_kp, 32), dtype=np.uint8)
        s.add_keyframe(np.eye(3, dtype=np.float32), np.zeros(3, np.float32),
                       np.zeros((cfg.max_kp, 2), np.float32), desc,
                       np.zeros(cfg.max_kp, np.int32),
                       np.ones(cfg.max_kp, bool))
    ids = s.add_map_points(np.zeros((1, 3), np.float32),
                           rng.integers(0, 256, (1, 32), dtype=np.uint8))
    mp = int(ids[0])
    for i in range(70):
        s.add_observation(mp, i % 2, i % cfg.max_kp)
    assert s.mp_nobs[mp] == 70
    native.distinctive_descriptors(s, np.array([mp], np.int64))
    got = s.mp_desc[mp].copy()
    s._compute_distinctive_descriptors_np(np.array([mp], np.int64))
    assert np.array_equal(got, s.mp_desc[mp])
