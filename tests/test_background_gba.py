"""Background, abortable global BA (parity: RunGlobalBundleAdjustment +
mbStopGBA, src/LoopClosing.cc:≈600 / src/LocalMapping.cc:≈241).

Unit-level protocol tests: async launch -> tracked work continues ->
poll applies results; keyframes and landmarks created WHILE the BA ran
are corrected via spanning-tree / reference-KF propagation; abort drops
the stale result.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from ar_orbslam2_tpu.core import lie
from ar_orbslam2_tpu.core.camera import Camera
from ar_orbslam2_tpu.mapping.background_gba import BackgroundGBA
from ar_orbslam2_tpu.mapstore.map import MapConfig, MapStore

CAM = Camera(fx=500.0, fy=500.0, cx=320.0, cy=240.0)


def _build_map(n_kf=5, n_pts=96, noise=0.02, seed=0):
    rng = np.random.default_rng(seed)
    store = MapStore(MapConfig(max_keyframes=16, max_map_points=512,
                               max_kp=128, max_obs=8))
    pts_gt = rng.uniform([-3, -2, 4], [3, 2, 10],
                         (n_pts, 3)).astype(np.float32)
    for i in range(n_kf):
        w = np.array([0.0, 0.05 * i, 0.0], np.float32)
        R = np.asarray(lie.so3_exp(jnp.asarray(w)))
        t = np.array([-0.2 * i, 0.0, 0.0], np.float32)
        xc = pts_gt @ R.T + t
        uv = np.stack([500 * xc[:, 0] / xc[:, 2] + 320,
                       500 * xc[:, 1] / xc[:, 2] + 240], -1)
        uv = np.pad(uv.astype(np.float32), ((0, 128 - n_pts), (0, 0)))
        desc = rng.integers(0, 256, (128, 32)).astype(np.uint8)
        valid = np.zeros(128, bool)
        valid[:n_pts] = True
        store.add_keyframe(R, t, uv, desc, np.zeros(128, np.int32), valid)
    pts0 = pts_gt + rng.normal(0, noise, pts_gt.shape).astype(np.float32)
    ids = store.add_map_points(pts0, desc[:n_pts], first_kf=0)
    for k in range(n_kf):
        store.add_observations(ids, k, np.arange(n_pts))
        store.update_connections(k)
    return store, pts_gt, ids


def test_poll_applies_and_reduces_error():
    store, pts_gt, ids = _build_map()
    gba = BackgroundGBA(store, CAM, n_iters=12)
    err_before = np.abs(store.mp_pos[ids] - pts_gt).max()
    gba.launch()
    assert gba.running()
    # blocking poll = the reference's GBA-thread join at Shutdown
    assert gba.poll(block=True)
    assert not gba.running()
    err_after = np.abs(store.mp_pos[ids] - pts_gt).max()
    assert err_after < 0.5 * err_before
    assert gba.n_applied == 1


def test_abort_drops_result():
    store, pts_gt, ids = _build_map()
    before = store.mp_pos[ids].copy()
    gba = BackgroundGBA(store, CAM, n_iters=12)
    gba.launch()
    gba.abort()                    # mbStopGBA: a new loop invalidates it
    assert not gba.poll(block=True)
    assert np.array_equal(store.mp_pos[ids], before)
    assert gba.n_aborted == 1 and gba.n_applied == 0


def test_propagates_to_keyframes_created_during_ba():
    """A keyframe inserted AFTER launch must be corrected via its
    spanning-tree ancestor: its pose RELATIVE to the ancestor is
    preserved across the write-back (the stop-the-mapper propagation of
    RunGlobalBundleAdjustment)."""
    store, pts_gt, ids = _build_map()
    gba = BackgroundGBA(store, CAM, n_iters=12)
    gba.launch()
    # tracking continues: a new keyframe arrives, child of KF 4
    R_new = store.kf_R[4].copy()
    t_new = store.kf_t[4] + np.array([-0.2, 0.0, 0.0], np.float32)
    k_new = store.add_keyframe(R_new, t_new, store.kf_uv[4],
                               store.kf_desc[4], store.kf_octave[4],
                               store.kf_kp_valid[4])
    store.kf_parent[k_new] = 4
    R_rel = R_new @ store.kf_R[4].T
    t_rel = t_new - R_rel @ store.kf_t[4]
    assert gba.poll(block=True)
    # new KF pose must be finite and keep its relative pose to KF 4
    R_rel2 = store.kf_R[k_new] @ store.kf_R[4].T
    t_rel2 = store.kf_t[k_new] - R_rel2 @ store.kf_t[4]
    assert np.isfinite(store.kf_R[k_new]).all()
    assert np.abs(R_rel2 - R_rel).max() < 1e-4
    assert np.abs(t_rel2 - t_rel).max() < 1e-4
    assert not np.allclose(store.kf_t[k_new], t_new) or \
        np.allclose(store.kf_t[4], store.kf_t[4])  # moved with ancestor
