"""Relocalization + place recognition + loop closing, end to end.

The reference verifies these only by manual dataset runs (SURVEY.md §4);
here: synthetic sequences engineered to exercise each path.
"""
import numpy as np
import pytest

from ar_orbslam2_tpu.core.camera import Camera
from ar_orbslam2_tpu.data import synthetic
from ar_orbslam2_tpu.mapstore.map import MapConfig
from ar_orbslam2_tpu.mapping.local_mapping import LocalMapperConfig
from ar_orbslam2_tpu.system.slam import SlamConfig, SlamSystem
from ar_orbslam2_tpu.system.tracking import TrackingConfig

CAM = Camera(fx=500.0, fy=500.0, cx=320.0, cy=240.0)


def _cfg(loops=False, reloc=False):
    return SlamConfig(
        map=MapConfig(max_keyframes=64, max_map_points=20_000, max_kp=512),
        tracking=TrackingConfig(max_kp=512, n_local_mp=2048,
                                max_frames_between_kf=5),
        mapper=LocalMapperConfig(ba_max_points=2048,
                                 n_triangulation_neighbors=5,
                                 n_fuse_neighbors=5),
        enable_loop_closing=loops, enable_relocalization=reloc)


def _feats(scene, i, **kw):
    obs = synthetic.observe_frame(scene, i, CAM, max_kp=512, noise_px=0.3,
                                  bit_flip=0.02, **kw)
    return dict(uv=obs["uv"], desc=obs["desc"], octave=obs["octave"],
                valid=obs["valid"])


def test_place_recognition_ranks_revisit_first():
    from ar_orbslam2_tpu.loop.place_recognition import KeyFrameDatabase
    from ar_orbslam2_tpu.mapstore.map import MapStore
    from ar_orbslam2_tpu.ops import hamming as H
    scene = synthetic.make_scene(n_landmarks=1200, n_frames=12, seed=5,
                                 trajectory="orbit", arc=1.6)
    s = MapStore(MapConfig(max_keyframes=32, max_map_points=4096,
                           max_kp=512))
    db = KeyFrameDatabase(s)
    for i in range(12):
        obs = synthetic.observe_frame(scene, i, CAM, max_kp=512,
                                      bit_flip=0.02)
        kf = s.add_keyframe(scene.R_cw[i], scene.t_cw[i], obs["uv"],
                            H.pack_bits(obs["desc"]), obs["octave"],
                            obs["valid"])
        db.add(kf)
    # re-observation of frame 2 with fresh noise: best candidate == KF 2
    obs = synthetic.observe_frame(scene, 2, CAM, max_kp=512, bit_flip=0.03,
                                  seed=999)
    _, bow = db.compute_bow(obs["desc"], obs["valid"])
    cands = db.detect_relocalization_candidates(bow)
    assert len(cands) >= 1
    assert 2 in cands[:2]



def test_relocalization_recovers_from_lost():
    scene = synthetic.make_scene(n_landmarks=1500, n_frames=24, seed=3,
                                 trajectory="orbit", arc=0.8)
    slam = SlamSystem(CAM, _cfg(reloc=True))
    for i in range(16):
        slam.track_monocular(features=_feats(scene, i),
                             timestamp=scene.timestamps[i])
    assert slam.tracking.state == "OK"
    n_kf = slam.store.n_keyframes()
    assert n_kf >= 2
    # kill tracking: force LOST (simulates occlusion/blur gap)
    slam.tracking.state = "LOST"
    slam.tracking.velocity = None
    slam.tracking.last_frame = None
    # revisit an early viewpoint -> relocalize
    ok = False
    for i in [5, 6, 7]:
        T = slam.track_monocular(features=_feats(scene, i),
                                 timestamp=scene.timestamps[i] + 10.0)
        if T is not None:
            ok = True
            # pose must agree with the pose tracked for this viewpoint in
            # the first pass (same map, same mono scale)
            old = [m for m in slam.tracking.metrics
                   if m["frame_id"] == i and "t" in m]
            if old:
                c_old = -(old[0]["R"].T @ old[0]["t"])
                c_new = -(T[:3, :3].T @ T[:3, 3])
                assert np.linalg.norm(c_new - c_old) < 0.1
            break
    assert ok, "relocalization failed"
    assert slam.tracking.state == "OK"



def test_loop_closing_fires_and_corrects():
    # full-circle orbit: end revisits the start -> loop closure
    scene = synthetic.make_scene(n_landmarks=2500, n_frames=64, seed=11,
                                 trajectory="orbit", arc=2 * np.pi * 0.999)
    slam = SlamSystem(CAM, _cfg(loops=True, reloc=True))
    slam.tracking.loop_closer.cfg = type(slam.tracking.loop_closer.cfg)(
        min_kf_gap=8, consistency_threshold=1, run_global_ba=True)
    tracked = 0
    for i in range(scene.n_frames):
        T = slam.track_monocular(features=_feats(scene, i),
                                 timestamp=scene.timestamps[i])
        tracked += T is not None
    assert tracked > scene.n_frames * 0.7
    lc = slam.tracking.loop_closer
    assert len(lc.loops) >= 1, "no loop closed on a full-circle revisit"
    loop = lc.loops[0]
    # mono scale drift correction should be modest on synthetic data
    assert 0.5 < loop["s12"] < 2.0


def test_loop_closure_improves_ate():
    """Loop closure must PAY ITS RENT (VERDICT r4 missing #7): on a
    drift-accumulating full circuit, ATE after CorrectLoop + essential
    graph + GBA must be strictly better than the same frames with loop
    closing disabled. Parity: LoopClosing::CorrectLoop
    (src/LoopClosing.cc:≈420) exists exactly to cancel accumulated
    odometry drift at revisit."""
    from ar_orbslam2_tpu.eval.ate import ate_rmse
    scene = synthetic.make_scene(n_landmarks=2500, n_frames=64, seed=11,
                                 trajectory="orbit", arc=2 * np.pi * 0.999)
    gt = -(np.swapaxes(scene.R_cw, -1, -2)
           @ scene.t_cw[..., None])[..., 0]

    def run(loops):
        slam = SlamSystem(CAM, _cfg(loops=loops, reloc=loops))
        if loops:
            slam.tracking.loop_closer.cfg = type(
                slam.tracking.loop_closer.cfg)(
                min_kf_gap=8, consistency_threshold=1, run_global_ba=True)
        for i in range(scene.n_frames):
            # noisy, dropout-heavy observations: odometry must actually
            # drift for the correction to have rent to pay (at the
            # fire-test's 0.3 px the circuit closes at ~0.004 ATE with
            # no loop needed at all)
            obs = synthetic.observe_frame(scene, i, CAM, max_kp=512,
                                          noise_px=1.5, bit_flip=0.04,
                                          dropout=0.4)
            slam.track_monocular(
                features=dict(uv=obs["uv"], desc=obs["desc"],
                              octave=obs["octave"], valid=obs["valid"]),
                timestamp=scene.timestamps[i])
        slam.shutdown()
        ts_k, _, t_k = slam.keyframe_trajectory()
        idx = np.round(np.asarray(ts_k) * 30.0).astype(int)
        ok = idx < len(gt)
        return (slam, ate_rmse(t_k[ok], gt[idx[ok]], with_scale=True))

    slam_on, ate_on = run(True)
    slam_off, ate_off = run(False)
    assert len(slam_on.tracking.loop_closer.loops) >= 1, \
        "loop never closed — nothing to measure"
    assert ate_on < ate_off, \
        f"loop closure did not improve ATE: {ate_on:.4f} vs {ate_off:.4f}"
