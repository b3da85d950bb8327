"""Covisibility-partitioned landmark sharding (SURVEY §5.7 map-block
sharding row): balanced shards, covisibility locality, full coverage,
and the BANDED distributed-GBA exchange built on top of it."""
import numpy as np
import pytest

from ar_orbslam2_tpu.parallel import partition
from ar_orbslam2_tpu.core.camera import Camera
from ar_orbslam2_tpu.data import synthetic
from ar_orbslam2_tpu.mapstore.map import MapConfig
from ar_orbslam2_tpu.mapping.local_mapping import LocalMapperConfig
from ar_orbslam2_tpu.system.slam import SlamConfig, SlamSystem
from ar_orbslam2_tpu.system.tracking import TrackingConfig

CAM = Camera(fx=500.0, fy=500.0, cx=320.0, cy=240.0)


def _build_map():
    scene = synthetic.make_scene(n_landmarks=3000, n_frames=80, seed=2,
                                 trajectory="orbit", arc=3.0)
    cfg = SlamConfig(
        map=MapConfig(max_keyframes=64, max_map_points=20_000, max_kp=512),
        tracking=TrackingConfig(max_kp=512, n_local_mp=2048,
                                max_frames_between_kf=4),
        mapper=LocalMapperConfig(ba_max_points=2048,
                                 n_triangulation_neighbors=5,
                                 n_fuse_neighbors=5),
        enable_loop_closing=False, enable_relocalization=False)
    slam = SlamSystem(CAM, cfg)
    for i in range(scene.n_frames):
        obs = synthetic.observe_frame(scene, i, CAM, max_kp=512,
                                      noise_px=0.3, bit_flip=0.02)
        slam.track_monocular(features=dict(
            uv=obs["uv"], desc=obs["desc"], octave=obs["octave"],
            valid=obs["valid"]), timestamp=scene.timestamps[i])
    return slam.store


@pytest.fixture(scope="module")
def built_map():
    return _build_map()


def test_partition_balance_and_coverage(built_map):
    store = built_map
    n_shards = 4
    assign, counts = partition.partition_landmarks(store, n_shards)
    live = store.mp_valid.sum()
    assert counts.sum() == live                 # every live landmark placed
    assert (assign[store.mp_valid] >= 0).all()
    assert counts.max() <= 2.5 * max(counts[counts > 0].min(), 1), \
        f"unbalanced shards: {counts}"


def test_partition_locality(built_map):
    """Each shard's camera footprint must be a small covisibility-local
    subset, not the whole keyframe chain (that's what makes a block-
    banded camera exchange possible)."""
    store = built_map
    n_shards = 4
    assign, _ = partition.partition_landmarks(store, n_shards)
    feet = partition.shard_camera_footprint(store, assign, n_shards)
    n_kf = store.n_keyframes()
    assert n_kf >= 6
    mean_foot = np.mean([len(f) for f in feet])
    assert mean_foot < 0.9 * n_kf, (
        f"no locality: mean footprint {mean_foot:.1f} of {n_kf} KFs")


def test_banded_layout_covers_all_observations(built_map):
    """Every live landmark's observations must land inside its shard's
    camera band — the invariant the banded exchange's correctness rests
    on (an observation outside the band would be silently dropped)."""
    store = built_map
    lay = partition.banded_layout(store, 8)
    assert lay is not None
    pos_of = np.full(store.cfg.max_keyframes, -1, np.int64)
    pos_of[lay["kf_order"]] = np.arange(len(lay["kf_order"]))
    W = lay["band_w"]
    for b in range(8):
        mps = lay["shard_mp"][b]
        mps = mps[mps >= 0]
        if not len(mps):
            continue
        okf = store.mp_obs_kf[mps]
        ps = pos_of[okf[okf >= 0]]
        ps = ps[ps >= 0]
        off = lay["band_off"][b]
        assert (ps >= off).all() and (ps < off + W).all(), \
            f"shard {b}: obs outside band [{off}, {off + W})"


def test_banded_gba_matches_dense(built_map):
    """Banded-exchange distributed GBA must land on the same optimum as
    the dense-psum path on the live 8-device mesh (the compressed
    exchange is a comms optimization, not an approximation)."""
    import jax

    from ar_orbslam2_tpu.mapping.global_ba import global_bundle_adjustment
    assert len(jax.devices()) == 8
    store = built_map
    snap = (store.kf_R.copy(), store.kf_t.copy(), store.mp_pos.copy())
    global_bundle_adjustment(store, CAM, n_iters=12, distributed=True,
                             banded=False)
    dense_t = store.kf_t.copy()
    dense_p = store.mp_pos.copy()
    store.kf_R[:], store.kf_t[:], store.mp_pos[:] = snap
    global_bundle_adjustment(store, CAM, n_iters=12, distributed=True,
                             banded=True)
    ids = store.keyframe_ids()
    dt = np.linalg.norm(store.kf_t[ids] - dense_t[ids], axis=1)
    assert dt.max() < 5e-3, f"camera translations diverge: {dt.max():.5f}"
    live = np.nonzero(store.mp_valid)[0]
    dp = np.linalg.norm(store.mp_pos[live] - dense_p[live], axis=1)
    assert np.median(dp) < 5e-3, f"landmarks diverge: {np.median(dp):.5f}"
