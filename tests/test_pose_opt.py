import numpy as np
import jax.numpy as jnp

from ar_orbslam2_tpu.core import lie
from ar_orbslam2_tpu.core.camera import Camera
from ar_orbslam2_tpu.estimation.pose_opt import pose_optimization


def setup_problem(rng, n=300, noise_px=0.5, outlier_frac=0.2,
                  perturb=(0.05, 0.03), cam=None):
    cam = cam or Camera(fx=520, fy=520, cx=320, cy=240)
    xw = rng.uniform([-2, -1.5, 3], [2, 1.5, 8], (n, 3)).astype(np.float32)
    R_gt = np.asarray(lie.so3_exp(jnp.asarray(
        rng.normal(0, 0.2, 3).astype(np.float32))))
    t_gt = rng.normal(0, 0.3, 3).astype(np.float32)
    xc = xw @ R_gt.T + t_gt
    uv = np.stack([520 * xc[:, 0] / xc[:, 2] + 320,
                   520 * xc[:, 1] / xc[:, 2] + 240], 1).astype(np.float32)
    uv += rng.normal(0, noise_px, uv.shape).astype(np.float32)
    n_out = int(n * outlier_frac)
    out_ids = rng.choice(n, n_out, replace=False)
    uv[out_ids] += rng.uniform(15, 80, (n_out, 2)).astype(np.float32) * \
        rng.choice([-1, 1], (n_out, 2))
    # perturbed init
    dx = np.concatenate([rng.normal(0, perturb[0], 3),
                         rng.normal(0, perturb[1], 3)]).astype(np.float32)
    dR, dt = lie.se3_exp(jnp.asarray(dx))
    R0, t0 = lie.se3_mul(dR, dt, jnp.asarray(R_gt), jnp.asarray(t_gt))
    return cam, xw, uv, R_gt, t_gt, R0, t0, out_ids


def test_pose_opt_recovers_gt(rng):
    cam, xw, uv, R_gt, t_gt, R0, t0, out_ids = setup_problem(rng)
    n = len(xw)
    res = pose_optimization(
        R0, t0, jnp.asarray(xw), jnp.asarray(uv),
        jnp.zeros(n, jnp.int32), jnp.ones(n, bool), cam)
    R, t = np.asarray(res["R"]), np.asarray(res["t"])
    # rotation error (deg) and translation error
    cos = np.clip((np.trace(R.T @ R_gt) - 1) / 2, -1, 1)
    assert np.degrees(np.arccos(cos)) < 0.2
    assert np.linalg.norm(t - t_gt) < 0.01
    # outliers rejected
    inlier = np.asarray(res["inlier"])
    assert not inlier[out_ids].any() or inlier[out_ids].mean() < 0.05
    assert int(res["n_inliers"]) > 0.7 * n


def test_pose_opt_with_large_outlier_fraction(rng):
    cam, xw, uv, R_gt, t_gt, R0, t0, out_ids = setup_problem(
        rng, outlier_frac=0.4, perturb=(0.02, 0.02))
    n = len(xw)
    res = pose_optimization(
        R0, t0, jnp.asarray(xw), jnp.asarray(uv),
        jnp.zeros(n, jnp.int32), jnp.ones(n, bool), cam)
    R, t = np.asarray(res["R"]), np.asarray(res["t"])
    cos = np.clip((np.trace(R.T @ R_gt) - 1) / 2, -1, 1)
    assert np.degrees(np.arccos(cos)) < 0.5
    assert np.linalg.norm(t - t_gt) < 0.03


def test_pose_opt_respects_valid_mask(rng):
    cam, xw, uv, R_gt, t_gt, R0, t0, _ = setup_problem(rng, outlier_frac=0.0)
    n = len(xw)
    # corrupt the second half but mark it invalid
    uv2 = uv.copy()
    uv2[n // 2:] += 500.0
    valid = np.zeros(n, bool)
    valid[:n // 2] = True
    res = pose_optimization(
        R0, t0, jnp.asarray(xw), jnp.asarray(uv2),
        jnp.zeros(n, jnp.int32), jnp.asarray(valid), cam)
    t = np.asarray(res["t"])
    assert np.linalg.norm(t - t_gt) < 0.01
    assert int(res["n_inliers"]) <= n // 2


def test_pose_opt_stereo_residual(rng):
    cam = Camera(fx=520, fy=520, cx=320, cy=240, bf=40.0)
    _, xw, uv, R_gt, t_gt, R0, t0, out_ids = setup_problem(
        rng, cam=cam, outlier_frac=0.1)
    n = len(xw)
    xc = xw @ R_gt.T + t_gt
    uv_right = (520 * xc[:, 0] / xc[:, 2] + 320 - 40.0 / xc[:, 2]).astype(
        np.float32)
    res = pose_optimization(
        R0, t0, jnp.asarray(xw), jnp.asarray(uv),
        jnp.zeros(n, jnp.int32), jnp.ones(n, bool), cam,
        uv_right=jnp.asarray(uv_right))
    t = np.asarray(res["t"])
    assert np.linalg.norm(t - t_gt) < 0.02
