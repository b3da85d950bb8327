"""End-to-end monocular SLAM on a synthetic scene.

The reference has no automated tests (SURVEY.md §4); this is the golden
integration test it lacks: run the full pipeline (init -> tracking -> local
mapping -> local BA) over a synthetic sequence and gate on scale-aligned
ATE RMSE, the same metric used to evaluate the reference on TUM/KITTI.
"""
import numpy as np
import pytest

from ar_orbslam2_tpu.core.camera import Camera
from ar_orbslam2_tpu.data import synthetic
from ar_orbslam2_tpu.eval.ate import ate_rmse
from ar_orbslam2_tpu.mapstore.map import MapConfig
from ar_orbslam2_tpu.mapping.local_mapping import LocalMapperConfig
from ar_orbslam2_tpu.system.slam import SlamConfig, SlamSystem
from ar_orbslam2_tpu.system.tracking import TrackingConfig

CAM = Camera(fx=500.0, fy=500.0, cx=320.0, cy=240.0)


def _small_cfg(**kw):
    return SlamConfig(
        map=MapConfig(max_keyframes=64, max_map_points=20_000, max_kp=512),
        tracking=TrackingConfig(max_kp=512, n_local_mp=2048,
                                max_frames_between_kf=5),
        mapper=LocalMapperConfig(ba_max_points=2048,
                                 n_triangulation_neighbors=5,
                                 n_fuse_neighbors=5),
        enable_loop_closing=False, enable_relocalization=False, **kw)


@pytest.fixture(scope="module")
def slam_run():
    scene = synthetic.make_scene(n_landmarks=1500, n_frames=30, seed=3,
                                 trajectory="orbit", arc=1.0)
    slam = SlamSystem(CAM, _small_cfg())
    est, gt, ts = [], [], []
    for i in range(scene.n_frames):
        obs = synthetic.observe_frame(scene, i, CAM, max_kp=512,
                                      noise_px=0.3, bit_flip=0.02)
        feats = dict(uv=obs["uv"], desc=obs["desc"], octave=obs["octave"],
                     valid=obs["valid"])
        T = slam.track_monocular(features=feats,
                                 timestamp=scene.timestamps[i])
        if T is not None:
            R_wc = T[:3, :3].T
            est.append(-(R_wc @ T[:3, 3]))
            gt.append(-(scene.R_cw[i].T @ scene.t_cw[i]))
            ts.append(scene.timestamps[i])
    return slam, scene, np.asarray(est), np.asarray(gt)


def test_initializes_and_tracks(slam_run):
    slam, scene, est, gt = slam_run
    assert slam.tracking.state == "OK"
    # tracked the large majority of frames after init
    assert len(est) >= scene.n_frames - 5
    assert slam.store.n_keyframes() >= 3
    assert slam.store.n_map_points() > 200


def test_ate_rmse_bound(slam_run):
    slam, scene, est, gt = slam_run
    # online (at-track-time) poses
    rmse_online = ate_rmse(est, gt, with_scale=True)
    assert rmse_online < 0.02, f"online ATE RMSE {rmse_online:.4f}"
    # final trajectory (re-composed against BA-refined keyframes, parity
    # with SaveTrajectoryTUM): tight bound (ref: ~0.9cm TUM fr1/xyz on a
    # ~1m-scale scene). Achieved 0.0035 on this 1.0-rad orbit after the
    # SO(3)-projection + UpdateLastFrame fixes; gate at 0.02 for margin.
    ts, R_wc, t_wc = slam.frame_trajectory()
    idx = np.round(np.asarray(ts) * 30.0).astype(int)
    gt_t = np.stack([-(scene.R_cw[i].T @ scene.t_cw[i]) for i in idx])
    rmse = ate_rmse(t_wc, gt_t, with_scale=True)
    assert rmse < 0.02, f"final ATE RMSE {rmse:.4f} too high"


def test_motion_model_stays_healthy(slam_run):
    """The velocity model must keep working over the whole sequence (a
    round-1 regression: non-orthonormal rotation accumulation collapsed
    SearchByProjection after ~15 frames, silently degrading to per-frame
    reference-KF tracking)."""
    slam, scene, est, gt = slam_run
    mi = [r.get("motion_inliers", 0) or 0 for r in slam.tracking.metrics[5:]]
    assert np.median(mi) > 50, f"motion-model inliers collapsed: {mi}"


def test_covisibility_and_observations_consistent(slam_run):
    slam, *_ = slam_run
    s = slam.store
    for mp in s.map_point_ids()[:200]:
        n = s.mp_nobs[mp]
        kfs = s.mp_obs_kf[mp, :n]
        fts = s.mp_obs_feat[mp, :n]
        assert (kfs >= 0).all()
        for kf, ft in zip(kfs, fts):
            assert s.kf_mp[kf, ft] == mp


def test_trajectory_export(slam_run, tmp_path):
    slam, *_ = slam_run
    p = tmp_path / "kf_traj.txt"
    slam.save_keyframe_trajectory_tum(str(p))
    from ar_orbslam2_tpu.eval.trajectory import load_tum
    ts, R, t = load_tum(str(p))
    assert len(ts) == slam.store.n_keyframes()
    # rotations orthonormal
    err = np.abs(R @ np.swapaxes(R, -1, -2) - np.eye(3)).max()
    assert err < 1e-4
