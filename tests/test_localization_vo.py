"""Localization-mode visual-odometry fallback (Tracking::mbVO parity).

Reference semantics (src/Tracking.cc:≈700): in ActivateLocalizationMode
the map is frozen; when the camera leaves the mapped region and fewer
than 10 MAP points stay matched, tracking rides temporal depth points
("VO"), attempting relocalization every frame; re-entering the mapped
region re-acquires the map.

Scenario: map the first 40% of an RGB-D orbit, freeze the map, continue
through unmapped territory (VO regime must survive on last-frame depth
points), and finish back at the start (relocalization must re-acquire).
"""
import numpy as np
import pytest

from ar_orbslam2_tpu.core.camera import Camera
from ar_orbslam2_tpu.data import synthetic
from ar_orbslam2_tpu.mapstore.map import MapConfig
from ar_orbslam2_tpu.mapping.local_mapping import LocalMapperConfig
from ar_orbslam2_tpu.system.slam import SlamConfig, SlamSystem
from ar_orbslam2_tpu.system.tracking import TrackingConfig

CAM = Camera(fx=500.0, fy=500.0, cx=320.0, cy=240.0, bf=50.0)


def _feats(scene, i):
    obs = synthetic.observe_frame(scene, i, CAM, max_kp=512, noise_px=0.3,
                                  bit_flip=0.02)
    return (dict(uv=obs["uv"], desc=obs["desc"], octave=obs["octave"],
                 valid=obs["valid"]), obs["depth"])


def _out_and_back_scene(n_out=36, n_back=15, seed=5):
    """Forward corridor then retrace: the mapped region leaves the view
    (unlike an inward-looking orbit, where it never does) and re-enters
    at the end."""
    base = synthetic.make_scene(
        n_landmarks=4000, n_frames=n_out, seed=seed,
        trajectory="forward", box=((-4.0, -3.0, 0.0), (4.0, 3.0, 26.0)),
        speed=0.35)
    back_idx = np.arange(n_back - 1, -1, -1)
    R = np.concatenate([base.R_cw, base.R_cw[back_idx]])
    t = np.concatenate([base.t_cw, base.t_cw[back_idx]])
    ts = np.arange(len(R), dtype=np.float64) / 30.0
    return synthetic.SyntheticScene(base.landmarks, base.desc_bits,
                                    R, t, ts)


@pytest.fixture(scope="module")
def vo_run():
    scene = _out_and_back_scene()
    cfg = SlamConfig(
        sensor="RGBD",
        map=MapConfig(max_keyframes=64, max_map_points=20_000, max_kp=512),
        tracking=TrackingConfig(max_kp=512, n_local_mp=2048,
                                max_frames_between_kf=5),
        mapper=LocalMapperConfig(ba_max_points=2048,
                                 n_triangulation_neighbors=5,
                                 n_fuse_neighbors=5),
        enable_loop_closing=False, enable_relocalization=True)
    slam = SlamSystem(CAM, cfg)
    n_map = 16                       # frames used to build the map
    history = []
    for i in range(scene.n_frames):
        if i == n_map:
            slam.activate_localization_mode()
        feats, depth = _feats(scene, i)
        T = slam.track_rgbd(features=feats, kp_depth=depth,
                            timestamp=scene.timestamps[i])
        history.append(dict(i=i, ok=T is not None,
                            vo=slam.tracking.vo,
                            state=slam.tracking.state))
    return slam, history, n_map


def test_map_frozen_in_localization_mode(vo_run):
    slam, history, n_map = vo_run
    # no keyframes added after activation
    created_after = (slam.store.kf_frame_id[slam.store.kf_valid]
                     >= n_map).sum()
    assert created_after == 0, "localization mode extended the map"


def test_vo_regime_survives_unmapped_stretch(vo_run):
    slam, history, n_map = vo_run
    mid = [h for h in history if n_map + 8 <= h["i"] < n_map + 20]
    n_tracked_mid = sum(h["ok"] for h in mid)
    assert n_tracked_mid >= len(mid) * 0.5, (
        f"VO lost the unmapped stretch: {n_tracked_mid}/{len(mid)}")
    assert any(h["vo"] for h in history), "mbVO regime never engaged"


def test_reacquires_map_on_return(vo_run):
    slam, history, n_map = vo_run
    tail = history[-6:]
    assert any(h["ok"] and not h["vo"] for h in tail), (
        "map never re-acquired on revisit: "
        + str([(h['i'], h['state'], h['vo']) for h in tail]))
