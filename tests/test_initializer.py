import numpy as np
import jax
import jax.numpy as jnp

from ar_orbslam2_tpu.estimation import initializer
from ar_orbslam2_tpu.core.camera import Camera


def two_view_setup(rng, planar=False, n=400, noise=0.4, outlier_frac=0.1,
                   baseline=0.6):
    from scipy.spatial.transform import Rotation
    cam = Camera(fx=500, fy=500, cx=320, cy=240)
    K = np.asarray(cam.K)
    if planar:
        xy = rng.uniform(-2.5, 2.5, (n, 2))
        xw = np.concatenate([xy, np.full((n, 1), 5.0)], 1)
        xw += rng.normal(0, 0.003, xw.shape)  # tiny off-plane noise
    else:
        xw = rng.uniform([-2.5, -2, 3], [2.5, 2, 8], (n, 3))
    R21 = Rotation.from_rotvec([0.01, -0.12, 0.02]).as_matrix()
    t21 = np.array([-baseline, 0.03, 0.05])
    t21 /= np.linalg.norm(t21) / 0.6

    def proj(R, t):
        xc = xw @ R.T + t
        return (xc[:, :2] / xc[:, 2:3]) @ np.diag([500, 500]) + [320, 240]

    uv1 = proj(np.eye(3), np.zeros(3)) + rng.normal(0, noise, (n, 2))
    uv2 = proj(R21, t21) + rng.normal(0, noise, (n, 2))
    n_out = int(n * outlier_frac)
    ids = rng.choice(n, n_out, replace=False)
    uv2[ids] += rng.uniform(20, 100, (n_out, 2)) * rng.choice([-1, 1], (n_out, 2))
    valid = (np.abs(uv1 - [320, 240]) < [320, 240]).all(1) & \
            (np.abs(uv2 - [320, 240]) < [320, 240]).all(1)
    return cam, K, xw, uv1.astype(np.float32), uv2.astype(np.float32), \
        valid, R21, t21, ids


def check_pose(res, R21, t21, atol_deg=1.0):
    assert res is not None
    R, t = res["R21"], res["t21"]
    cos = np.clip((np.trace(R.T @ R21) - 1) / 2, -1, 1)
    assert np.degrees(np.arccos(cos)) < atol_deg
    t_gt = t21 / np.linalg.norm(t21)
    assert min(np.linalg.norm(t - t_gt), np.linalg.norm(t + t_gt)) < 0.05


def test_initialize_general_scene_uses_f(rng):
    cam, K, xw, uv1, uv2, valid, R21, t21, out_ids = two_view_setup(rng)
    res = initializer.initialize_two_view(
        uv1, uv2, valid, K, jax.random.PRNGKey(0))
    check_pose(res, R21, t21)
    assert res["used_model"] == "F"
    good = res["good"]
    assert good.sum() > 150
    assert good[out_ids].mean() < 0.05
    # triangulated points match GT up to the scale of t (unit-normalized)
    scale = np.linalg.norm(t21)
    err = np.linalg.norm(res["xw"][good] * scale - xw[good], axis=1)
    assert np.median(err) < 0.1


def test_initialize_planar_scene_uses_h(rng):
    cam, K, xw, uv1, uv2, valid, R21, t21, _ = two_view_setup(
        rng, planar=True, outlier_frac=0.05)
    res = initializer.initialize_two_view(
        uv1, uv2, valid, K, jax.random.PRNGKey(1))
    check_pose(res, R21, t21, atol_deg=1.5)
    assert res["used_model"] == "H"


def test_initialize_rejects_pure_rotation(rng):
    from scipy.spatial.transform import Rotation
    cam = Camera(fx=500, fy=500, cx=320, cy=240)
    K = np.asarray(cam.K)
    xw = rng.uniform([-2.5, -2, 3], [2.5, 2, 8], (400, 3))
    R21 = Rotation.from_rotvec([0.0, -0.1, 0.0]).as_matrix()

    def proj(R, t):
        xc = xw @ R.T + t
        return (xc[:, :2] / xc[:, 2:3]) @ np.diag([500, 500]) + [320, 240]

    uv1 = (proj(np.eye(3), np.zeros(3)) + rng.normal(0, 0.3, (400, 2))).astype(np.float32)
    uv2 = (proj(R21, np.zeros(3)) + rng.normal(0, 0.3, (400, 2))).astype(np.float32)
    valid = np.ones(400, bool)
    res = initializer.initialize_two_view(
        uv1, uv2, valid, K, jax.random.PRNGKey(2))
    # no parallax -> must refuse to initialize
    assert res is None


def test_initialize_too_few_matches(rng):
    cam, K, xw, uv1, uv2, valid, R21, t21, _ = two_view_setup(rng, n=60)
    valid[:] = False
    valid[:30] = True
    res = initializer.initialize_two_view(
        uv1, uv2, valid, K, jax.random.PRNGKey(3))
    assert res is None
