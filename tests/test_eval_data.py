import numpy as np

from ar_orbslam2_tpu.core.camera import Camera
from ar_orbslam2_tpu import eval as ev
from ar_orbslam2_tpu.data import synthetic


def test_tum_roundtrip(tmp_path, rng):
    from scipy.spatial.transform import Rotation
    n = 10
    R = Rotation.random(n, rng).as_matrix().astype(np.float32)
    t = rng.standard_normal((n, 3)).astype(np.float32)
    ts = np.arange(n, dtype=float)
    p = tmp_path / "traj.txt"
    ev.save_tum(p, ts, R, t)
    ts2, R2, t2 = ev.load_tum(p)
    np.testing.assert_allclose(ts2, ts)
    np.testing.assert_allclose(R2, R, atol=1e-4)
    np.testing.assert_allclose(t2, t, atol=1e-5)


def test_kitti_roundtrip(tmp_path, rng):
    from scipy.spatial.transform import Rotation
    R = Rotation.random(5, rng).as_matrix().astype(np.float32)
    t = rng.standard_normal((5, 3)).astype(np.float32)
    p = tmp_path / "kitti.txt"
    ev.save_kitti(p, R, t)
    R2, t2 = ev.load_kitti(p)
    np.testing.assert_allclose(R2, R, atol=1e-5)
    np.testing.assert_allclose(t2, t, atol=1e-5)


def test_ate_invariant_to_sim3(rng):
    gt = rng.standard_normal((50, 3))
    from scipy.spatial.transform import Rotation
    R = Rotation.random(1, rng).as_matrix()[0]
    est = 2.5 * gt @ R.T + np.array([1.0, -2.0, 0.5])
    assert ev.ate_rmse(est, gt, with_scale=True) < 1e-6
    # with noise
    est2 = est + rng.normal(0, 0.01, est.shape)
    assert 0.001 < ev.ate_rmse(est2, gt) < 0.05


def test_rpe_zero_for_identical(rng):
    from scipy.spatial.transform import Rotation
    R = Rotation.random(20, rng).as_matrix()
    t = rng.standard_normal((20, 3))
    tr, rr = ev.rpe(R, t, R, t)
    assert tr < 1e-9 and rr < 1e-3


def test_synthetic_observations_consistent():
    cam = Camera(fx=500, fy=500, cx=320, cy=240)
    scene = synthetic.make_scene(n_landmarks=500, n_frames=10, seed=1)
    obs = synthetic.observe_frame(scene, 3, cam, noise_px=0.0, bit_flip=0.0)
    assert obs["n_valid"] > 50
    ids = obs["landmark_id"][obs["valid"]]
    uv = obs["uv"][obs["valid"]]
    # reproject and compare
    R, t = scene.R_cw[3], scene.t_cw[3]
    xc = scene.landmarks[ids] @ R.T + t
    u = 500 * xc[:, 0] / xc[:, 2] + 320
    v = 500 * xc[:, 1] / xc[:, 2] + 240
    np.testing.assert_allclose(uv[:, 0], u, atol=1e-3)
    np.testing.assert_allclose(uv[:, 1], v, atol=1e-3)
    # descriptors exact when bit_flip=0
    np.testing.assert_array_equal(obs["desc"][obs["valid"]],
                                  scene.desc_bits[ids])


def test_synthetic_observation_overlap_between_frames():
    cam = Camera(fx=500, fy=500, cx=320, cy=240)
    scene = synthetic.make_scene(n_landmarks=1000, n_frames=20, seed=2)
    o1 = synthetic.observe_frame(scene, 5, cam)
    o2 = synthetic.observe_frame(scene, 6, cam)
    s1 = set(o1["landmark_id"][o1["valid"]].tolist())
    s2 = set(o2["landmark_id"][o2["valid"]].tolist())
    # consecutive frames must share most landmarks
    assert len(s1 & s2) > 0.5 * min(len(s1), len(s2))


def test_render_plane_sequence():
    cam = Camera(fx=500, fy=500, cx=320, cy=240, width=640, height=480)
    imgs, R, t = synthetic.render_plane_sequence(cam, n_frames=3)
    assert imgs.shape == (3, 480, 640)
    assert imgs.dtype == np.uint8
    # images have texture (nontrivial variance) and differ between frames
    assert imgs[0].std() > 20
    assert np.abs(imgs[0].astype(int) - imgs[2].astype(int)).mean() > 2
