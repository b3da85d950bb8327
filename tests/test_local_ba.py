import numpy as np
import jax.numpy as jnp

from ar_orbslam2_tpu.core import lie
from ar_orbslam2_tpu.core.camera import Camera
from ar_orbslam2_tpu.estimation.local_ba import bundle_adjust


def build_ba_problem(rng, n_cams=8, n_pts=400, opp=6, noise_px=0.4,
                     outlier_frac=0.05, perturb_cam=0.03, perturb_pt=0.05,
                     bf=0.0):
    cam = Camera(fx=500, fy=500, cx=320, cy=240, bf=bf)
    pts_gt = rng.uniform([-3, -2, 4], [3, 2, 10], (n_pts, 3)).astype(np.float32)
    # cameras on an arc looking at +z
    cam_R, cam_t = [], []
    for i in range(n_cams):
        a = (i / max(n_cams - 1, 1) - 0.5) * 0.6
        w = np.array([0.02 * np.sin(3 * a), a * 0.3, 0.0], np.float32)
        R = np.asarray(lie.so3_exp(jnp.asarray(w)))
        t = np.array([-1.5 * a, 0.05 * np.sin(5 * a), 0.1 * a], np.float32)
        cam_R.append(R)
        cam_t.append(t)
    cam_R = np.stack(cam_R)
    cam_t = np.stack(cam_t)
    # observations: each point seen by `opp` random cameras
    obs_cam = np.stack([rng.choice(n_cams, opp, replace=False)
                        for _ in range(n_pts)]).astype(np.int32)
    xc = np.einsum("poij,pj->poi", cam_R[obs_cam], pts_gt) + cam_t[obs_cam]
    uv = np.stack([500 * xc[..., 0] / xc[..., 2] + 320,
                   500 * xc[..., 1] / xc[..., 2] + 240], -1).astype(np.float32)
    uv += rng.normal(0, noise_px, uv.shape).astype(np.float32)
    n_out = int(n_pts * opp * outlier_frac)
    oi = rng.integers(0, n_pts, n_out)
    oj = rng.integers(0, opp, n_out)
    uv[oi, oj] += (rng.uniform(15, 60, (n_out, 2))
                   * rng.choice([-1, 1], (n_out, 2))).astype(np.float32)
    uvr = None
    if bf > 0:
        uvr = (500 * xc[..., 0] / xc[..., 2] + 320 - bf / xc[..., 2]
               ).astype(np.float32)
    # perturb initial state (keep first two cameras exact: gauge anchors)
    cam_R0, cam_t0 = cam_R.copy(), cam_t.copy()
    for i in range(2, n_cams):
        dx = np.concatenate([rng.normal(0, perturb_cam, 3),
                             rng.normal(0, perturb_cam, 3)]).astype(np.float32)
        dR, dt = lie.se3_exp(jnp.asarray(dx))
        R2, t2 = lie.se3_mul(dR, dt, jnp.asarray(cam_R[i]),
                             jnp.asarray(cam_t[i]))
        cam_R0[i], cam_t0[i] = np.asarray(R2), np.asarray(t2)
    pts0 = pts_gt + rng.normal(0, perturb_pt, pts_gt.shape).astype(np.float32)
    fixed = np.zeros(n_cams, bool)
    fixed[:2] = True
    return dict(cam=cam, cam_R_gt=cam_R, cam_t_gt=cam_t, pts_gt=pts_gt,
                cam_R0=cam_R0, cam_t0=cam_t0, pts0=pts0, fixed=fixed,
                obs_cam=obs_cam, uv=uv, uvr=uvr,
                outliers=(oi, oj))


def run_ba(p, **kw):
    n_cams = len(p["cam_R0"])
    n_pts, opp = p["obs_cam"].shape
    return bundle_adjust(
        jnp.asarray(p["cam_R0"]), jnp.asarray(p["cam_t0"]),
        jnp.asarray(p["fixed"]), jnp.ones(n_cams, bool),
        jnp.asarray(p["pts0"]), jnp.ones(n_pts, bool),
        jnp.asarray(p["obs_cam"]), jnp.asarray(p["uv"]),
        jnp.zeros((n_pts, opp), jnp.int32), jnp.ones((n_pts, opp), bool),
        p["cam"],
        obs_uvr=None if p["uvr"] is None else jnp.asarray(p["uvr"]), **kw)


def pose_errors(res, p):
    R = np.asarray(res["cam_R"])
    t = np.asarray(res["cam_t"])
    rot = []
    for i in range(len(R)):
        cos = np.clip((np.trace(R[i].T @ p["cam_R_gt"][i]) - 1) / 2, -1, 1)
        rot.append(np.degrees(np.arccos(cos)))
    return np.array(rot), np.linalg.norm(t - p["cam_t_gt"], axis=1)


def test_local_ba_converges(rng):
    p = build_ba_problem(rng)
    res = run_ba(p)
    rot_err, t_err = pose_errors(res, p)
    assert rot_err.max() < 0.1, rot_err
    assert t_err.max() < 0.01, t_err
    pt_err = np.linalg.norm(np.asarray(res["pts"]) - p["pts_gt"], axis=1)
    assert np.median(pt_err) < 0.05
    # outliers flagged
    oi, oj = p["outliers"]
    inl = np.asarray(res["obs_inlier"])
    assert inl[oi, oj].mean() < 0.1
    assert inl.mean() > 0.7


def test_local_ba_improves_vs_init(rng):
    p = build_ba_problem(rng, perturb_cam=0.05, perturb_pt=0.2)
    res = run_ba(p)
    rot_err, t_err = pose_errors(res, p)
    # initial translation error was ~0.05-0.1; must shrink by >5x
    assert t_err[2:].max() < 0.02
    pt_err = np.linalg.norm(np.asarray(res["pts"]) - p["pts_gt"], axis=1)
    assert np.median(pt_err) < 0.06


def test_local_ba_fixed_cameras_stay_fixed(rng):
    p = build_ba_problem(rng)
    res = run_ba(p)
    np.testing.assert_array_equal(np.asarray(res["cam_R"])[:2],
                                  p["cam_R0"][:2])
    np.testing.assert_array_equal(np.asarray(res["cam_t"])[:2],
                                  p["cam_t0"][:2])


def test_local_ba_stereo(rng):
    p = build_ba_problem(rng, bf=50.0, outlier_frac=0.0)
    res = run_ba(p)
    rot_err, t_err = pose_errors(res, p)
    assert rot_err.max() < 0.1
    assert t_err.max() < 0.01


def test_local_ba_handles_padding(rng):
    p = build_ba_problem(rng, n_cams=6, n_pts=200)
    # pad cameras and points with invalid entries
    CP, PP = 8, 256
    cam_R = np.tile(np.eye(3, dtype=np.float32), (CP, 1, 1))
    cam_t = np.zeros((CP, 3), np.float32)
    cam_R[:6] = p["cam_R0"]
    cam_t[:6] = p["cam_t0"]
    cam_valid = np.arange(CP) < 6
    fixed = np.zeros(CP, bool)
    fixed[:2] = True
    pts = np.zeros((PP, 3), np.float32)
    pts[:200] = p["pts0"]
    pt_valid = np.arange(PP) < 200
    opp = p["obs_cam"].shape[1]
    obs_cam = np.full((PP, opp), -1, np.int32)
    obs_cam[:200] = p["obs_cam"]
    uv = np.zeros((PP, opp, 2), np.float32)
    uv[:200] = p["uv"]
    obs_valid = np.zeros((PP, opp), bool)
    obs_valid[:200] = True
    res = bundle_adjust(
        jnp.asarray(cam_R), jnp.asarray(cam_t), jnp.asarray(fixed),
        jnp.asarray(cam_valid), jnp.asarray(pts), jnp.asarray(pt_valid),
        jnp.asarray(obs_cam), jnp.asarray(uv),
        jnp.zeros((PP, opp), jnp.int32), jnp.asarray(obs_valid), p["cam"])
    R = np.asarray(res["cam_R"])
    t = np.asarray(res["cam_t"])
    assert np.isfinite(R).all() and np.isfinite(t).all()
    rot = []
    for i in range(6):
        cos = np.clip((np.trace(R[i].T @ p["cam_R_gt"][i]) - 1) / 2, -1, 1)
        rot.append(np.degrees(np.arccos(cos)))
    assert max(rot) < 0.2
    # padded cameras untouched
    np.testing.assert_allclose(R[6:], np.tile(np.eye(3), (2, 1, 1)),
                               atol=1e-6)
