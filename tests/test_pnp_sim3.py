"""Unit tests: DLT-PnP RANSAC, Horn Sim3 RANSAC, Sim3 GN, pose graph."""
import jax
import jax.numpy as jnp
import numpy as np

from ar_orbslam2_tpu.core import lie
from ar_orbslam2_tpu.core.camera import Camera
from ar_orbslam2_tpu.estimation.pnp import pnp_ransac
from ar_orbslam2_tpu.estimation.pose_graph import optimize_essential_graph
from ar_orbslam2_tpu.estimation.sim3_solver import (horn_sim3,
                                                    optimize_sim3,
                                                    sim3_ransac)

CAM = Camera(fx=500.0, fy=500.0, cx=320.0, cy=240.0)


def _pose(seed=0):
    rng = np.random.default_rng(seed)
    w = rng.normal(0, 0.2, 3).astype(np.float32)
    R = np.asarray(lie.so3_exp(jnp.asarray(w)))
    t = rng.normal(0, 0.3, 3).astype(np.float32)
    t[2] = abs(t[2])
    return R, t


def test_pnp_ransac_recovers_pose():
    rng = np.random.default_rng(1)
    N = 256
    xw = rng.uniform([-2, -2, 3], [2, 2, 8], (N, 3)).astype(np.float32)
    R, t = _pose(2)
    xc = xw @ R.T + t
    uv = np.stack([500 * xc[:, 0] / xc[:, 2] + 320,
                   500 * xc[:, 1] / xc[:, 2] + 240], -1).astype(np.float32)
    uv += rng.normal(0, 0.3, uv.shape)
    # 20% outliers
    n_out = N // 5
    uv[:n_out] = rng.uniform([0, 0], [640, 480], (n_out, 2))
    out = pnp_ransac(jnp.asarray(xw), jnp.asarray(uv),
                     jnp.zeros(N, jnp.int32), jnp.ones(N, bool),
                     CAM, jax.random.PRNGKey(0))
    assert bool(out["ok"])
    assert int(out["n_inliers"]) > 0.7 * (N - n_out)
    assert np.abs(np.asarray(out["R"]) - R).max() < 0.02
    assert np.abs(np.asarray(out["t"]) - t).max() < 0.05


def test_horn_sim3_exact():
    rng = np.random.default_rng(3)
    p2 = rng.normal(0, 1, (10, 3)).astype(np.float32)
    R, t = _pose(4)
    s = 1.7
    p1 = s * p2 @ R.T + t
    Rh, th, sh = horn_sim3(jnp.asarray(p1), jnp.asarray(p2))
    assert abs(float(sh) - s) < 1e-3
    assert np.abs(np.asarray(Rh) - R).max() < 1e-3
    assert np.abs(np.asarray(th) - t).max() < 1e-2


def test_sim3_ransac_and_refine():
    rng = np.random.default_rng(5)
    N = 128
    # landmarks in camera-2 frame, visible
    p2 = rng.uniform([-2, -2, 3], [2, 2, 8], (N, 3)).astype(np.float32)
    Rg, tg = _pose(6)
    sg = 1.3
    p1 = sg * p2 @ Rg.T + tg
    p1[:, 2] = np.abs(p1[:, 2]) + 2.0   # keep in front
    # recompute consistent p2 from p1 (invert)
    p2 = ((p1 - tg) @ Rg) / sg

    def proj(p):
        return np.stack([500 * p[:, 0] / p[:, 2] + 320,
                         500 * p[:, 1] / p[:, 2] + 240], -1).astype(np.float32)

    uv1, uv2 = proj(p1), proj(p2)
    # corrupt 25%
    n_out = N // 4
    p1c = p1.copy()
    p1c[:n_out] += rng.normal(0, 2.0, (n_out, 3))
    out = sim3_ransac(CAM, jnp.asarray(p1c), jnp.asarray(p2),
                      jnp.asarray(uv1), jnp.asarray(uv2),
                      jnp.zeros(N, jnp.int32), jnp.zeros(N, jnp.int32),
                      jnp.ones(N, bool), jax.random.PRNGKey(1))
    assert bool(out["ok"])
    assert abs(float(out["s12"]) - sg) < 0.05
    ref = optimize_sim3(CAM, out["R12"], out["t12"], out["s12"],
                        jnp.asarray(p1c), jnp.asarray(p2),
                        jnp.asarray(uv1), jnp.asarray(uv2),
                        jnp.zeros(N, jnp.int32), jnp.zeros(N, jnp.int32),
                        jnp.ones(N, bool))
    assert int(ref["n_inliers"]) >= N - n_out - 5
    assert abs(float(ref["s12"]) - sg) < 0.02
    assert np.abs(np.asarray(ref["R12"]) - Rg).max() < 0.02


def test_pose_graph_corrects_drift():
    """Chain of keyframes with accumulated drift + one loop edge back to
    the start: essential-graph GN should pull the chain back."""
    K = 12
    rng = np.random.default_rng(7)
    # ground truth: circle
    Rs_gt, ts_gt = [], []
    for i in range(K):
        a = 2 * np.pi * i / K
        Rw = np.asarray(lie.so3_exp(jnp.asarray([0.0, a, 0.0],
                                                jnp.float32)))
        cw = np.array([np.cos(a), 0.0, np.sin(a)], np.float32) * 3.0
        Rs_gt.append(Rw)
        ts_gt.append(-(Rw @ cw))
    Rs_gt = np.stack(Rs_gt).astype(np.float32)
    ts_gt = np.stack(ts_gt).astype(np.float32)

    # odometry edges from ground truth (relative S_ji, scale 1)
    edges = [(i, i + 1) for i in range(K - 1)] + [(K - 1, 0)]
    ei = np.array([e[0] for e in edges], np.int32)
    ej = np.array([e[1] for e in edges], np.int32)
    eR, et, es = [], [], []
    for i, j in edges:
        Rj, tj = Rs_gt[j], ts_gt[j]
        Ri, ti = Rs_gt[i], ts_gt[i]
        Rji = Rj @ Ri.T
        tji = tj - Rji @ ti
        eR.append(Rji)
        et.append(tji)
        es.append(1.0)

    # initial estimates: drifted chain (noise grows along the chain)
    R0 = Rs_gt.copy()
    t0 = ts_gt.copy()
    for i in range(1, K):
        dw = rng.normal(0, 0.02 * i, 3).astype(np.float32)
        Rn = np.asarray(lie.so3_exp(jnp.asarray(dw)))
        R0[i] = Rn @ R0[i]
        t0[i] = t0[i] + rng.normal(0, 0.05 * i, 3).astype(np.float32)
    s0 = np.ones(K, np.float32)

    fixed = np.zeros(K, bool)
    fixed[0] = True
    out = optimize_essential_graph(
        jnp.asarray(R0), jnp.asarray(t0), jnp.asarray(s0),
        jnp.ones(K, bool), jnp.asarray(fixed),
        jnp.asarray(ei), jnp.asarray(ej),
        jnp.asarray(np.stack(eR), jnp.float32),
        jnp.asarray(np.stack(et), jnp.float32),
        jnp.asarray(np.asarray(es), jnp.float32),
        jnp.ones(len(edges), bool), n_iters=20)
    Rf = np.asarray(out["R"])
    tf = np.asarray(out["t"])
    err_before = np.linalg.norm(t0 - ts_gt, axis=1).max()
    err_after = np.linalg.norm(tf - ts_gt, axis=1).max()
    assert err_after < 0.05 * max(err_before, 1e-9)
    assert np.abs(Rf - Rs_gt).max() < 0.02
    assert np.abs(np.asarray(out["s"]) - 1.0).max() < 0.02
