"""End-to-end RGB-D/stereo SLAM on a synthetic scene — METRIC scale.

The reference initializes stereo/RGB-D maps at true scale from measured
depth (Tracking::StereoInitialization) and keeps seeding close-depth
landmarks at every new keyframe (Tracking::CreateNewKeyFrame stereo branch,
src/Tracking.cc:≈1030). This test gates the full depth pipeline on ATE
WITHOUT scale alignment — scale drift or a missing depth path fails it.
"""
import numpy as np
import pytest

from ar_orbslam2_tpu.core.camera import Camera
from ar_orbslam2_tpu.data import synthetic
from ar_orbslam2_tpu.eval.ate import ate_rmse
from ar_orbslam2_tpu.mapstore.map import MapConfig
from ar_orbslam2_tpu.mapping.local_mapping import LocalMapperConfig
from ar_orbslam2_tpu.system.slam import RGBD, SlamConfig, SlamSystem
from ar_orbslam2_tpu.system.tracking import TrackingConfig

CAM = Camera(fx=500.0, fy=500.0, cx=320.0, cy=240.0, bf=40.0)


@pytest.fixture(scope="module")
def rgbd_run():
    scene = synthetic.make_scene(n_landmarks=1500, n_frames=30, seed=5,
                                 trajectory="orbit", arc=1.0)
    cfg = SlamConfig(
        sensor=RGBD,
        map=MapConfig(max_keyframes=64, max_map_points=20_000, max_kp=512),
        tracking=TrackingConfig(max_kp=512, n_local_mp=2048,
                                max_frames_between_kf=5),
        mapper=LocalMapperConfig(ba_max_points=2048,
                                 n_triangulation_neighbors=5,
                                 n_fuse_neighbors=5),
        enable_loop_closing=False, enable_relocalization=False,
        depth_threshold=40.0)
    slam = SlamSystem(CAM, cfg)
    est, gt = [], []
    for i in range(scene.n_frames):
        obs = synthetic.observe_frame(scene, i, CAM, max_kp=512,
                                      noise_px=0.3, bit_flip=0.02)
        feats = dict(uv=obs["uv"], desc=obs["desc"], octave=obs["octave"],
                     valid=obs["valid"])
        T = slam.track_rgbd(features=feats, kp_depth=obs["depth"],
                            timestamp=scene.timestamps[i])
        if T is not None:
            R_wc = T[:3, :3].T
            est.append(-(R_wc @ T[:3, 3]))
            gt.append(-(scene.R_cw[i].T @ scene.t_cw[i]))
    return slam, scene, np.asarray(est), np.asarray(gt)


def test_metric_initialization(rgbd_run):
    """Depth init must give a map at TRUE scale from frame 0 (no 2-view
    bootstrap needed)."""
    slam, scene, est, gt = rgbd_run
    assert slam.tracking.state == "OK"
    assert len(est) >= scene.n_frames - 1   # tracked from the first frame
    assert slam.store.n_keyframes() >= 3


def test_depth_seeded_keyframes(rgbd_run):
    """Every stereo/RGB-D keyframe must seed close-depth landmarks
    (round-1 gap: depth was stored but unused after init)."""
    slam, *_ = rgbd_run
    seeded = [r.get("n_depth_mp", 0) for r in slam.tracking.metrics
              if "new_kf" in r]
    assert len(seeded) >= 2
    assert sum(seeded) > 0, "no depth-seeded landmarks at new keyframes"


def test_metric_ate(rgbd_run):
    """ATE WITHOUT scale alignment — metric scale must hold end to end.
    Reference bound: ~1.6cm on TUM fr1/desk RGB-D (scene scale here ~3m)."""
    slam, scene, est, gt = rgbd_run
    rmse = ate_rmse(est, gt, with_scale=False)
    assert rmse < 0.05, f"metric ATE RMSE {rmse:.4f}"
    ts, R_wc, t_wc = slam.frame_trajectory()
    idx = np.round(np.asarray(ts) * 30.0).astype(int)
    gt_t = np.stack([-(scene.R_cw[i].T @ scene.t_cw[i]) for i in idx])
    rmse_final = ate_rmse(t_wc, gt_t, with_scale=False)
    assert rmse_final < 0.05, f"final metric ATE RMSE {rmse_final:.4f}"


def test_stereo_uvr_edges_in_ba(rgbd_run):
    """Keyframes must carry right-u stereo measurements so BA gets
    3-dof depth-constrained edges."""
    slam, *_ = rgbd_run
    s = slam.store
    ids = s.keyframe_ids()
    has_uvr = (s.kf_uvr[ids] > 0).sum()
    assert has_uvr > 100
