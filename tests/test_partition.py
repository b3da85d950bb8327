"""Covisibility-partitioned landmark sharding (SURVEY §5.7 map-block
sharding row): balanced shards, covisibility locality, full coverage."""
import numpy as np

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


def test_partition_balance_and_coverage():
    store = _build_map()
    n_shards = 4
    assign, counts = partition.partition_landmarks(store, n_shards)
    live = store.mp_valid.sum()
    assert counts.sum() == live                 # every live landmark placed
    assert (assign[store.mp_valid] >= 0).all()
    assert counts.max() <= 2.5 * max(counts[counts > 0].min(), 1), \
        f"unbalanced shards: {counts}"


def test_partition_locality():
    """Each shard's camera footprint must be a small covisibility-local
    subset, not the whole keyframe chain (that's what makes a block-
    banded camera exchange possible)."""
    store = _build_map()
    n_shards = 4
    assign, _ = partition.partition_landmarks(store, n_shards)
    feet = partition.shard_camera_footprint(store, assign, n_shards)
    n_kf = store.n_keyframes()
    assert n_kf >= 6
    mean_foot = np.mean([len(f) for f in feet])
    assert mean_foot < 0.9 * n_kf, (
        f"no locality: mean footprint {mean_foot:.1f} of {n_kf} KFs")
