"""Sim(3) estimation for loop closure — Horn's method, batched RANSAC.

TPU-native redesign of Sim3Solver (src/Sim3Solver.cc, SURVEY.md §2.1) +
Optimizer::OptimizeSim3 (src/Optimizer.cc:≈950): the reference's early-exit
RANSAC over Horn's closed-form 3-point similarity becomes a fixed batch of
vmapped Horn solves scored in one two-way reprojection pass; the g2o
bidirectional Sim3 optimization becomes a Gauss-Newton loop on the 7-dof
tangent with Huber IRLS weights.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core import camera as cam_mod
from ..core import lie

CHI2_2DOF_99 = 9.210   # parity: Sim3Solver mvnMaxError (9.21 sigma^2)


def horn_sim3(p1, p2, fix_scale=False):
    """Closed-form similarity S12 (p1 ~ s R p2 + t) from paired 3D points.

    Parity: Sim3Solver::ComputeSim3 (Horn 1987, quaternion method).
    p1, p2: (N, 3). Returns (R, t, s).
    """
    c1 = p1.mean(0)
    c2 = p2.mean(0)
    q1 = p1 - c1
    q2 = p2 - c2
    M = q2.T @ q1                     # note: maps 2 -> 1
    # Horn's 4x4 N matrix from M
    Sxx, Sxy, Sxz = M[0, 0], M[0, 1], M[0, 2]
    Syx, Syy, Syz = M[1, 0], M[1, 1], M[1, 2]
    Szx, Szy, Szz = M[2, 0], M[2, 1], M[2, 2]
    N = jnp.array([
        [Sxx + Syy + Szz, Syz - Szy, Szx - Sxz, Sxy - Syx],
        [Syz - Szy, Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz],
        [Szx - Sxz, Sxy + Syx, -Sxx + Syy - Szz, Syz + Szy],
        [Sxy - Syx, Szx + Sxz, Syz + Szy, -Sxx - Syy + Szz]])
    w, V = jnp.linalg.eigh(N)
    q = V[:, -1]                      # (w, x, y, z)
    R = lie.quat_to_rot(jnp.array([q[1], q[2], q[3], q[0]]))
    if fix_scale:
        s = jnp.float32(1.0)
    else:
        # s12 = <q1, R q2> / |q2|^2 (the reference's nom/den)
        rq2 = q2 @ R.T
        s = jnp.sum(q1 * rq2) / jnp.maximum(jnp.sum(q2 * q2), 1e-12)
    t = c1 - s * (R @ c2)
    return R, t, s


@partial(jax.jit, static_argnames=("cam", "n_hyp", "fix_scale",
                                   "scale_factor"))
def sim3_ransac(cam, p1, p2, uv1, uv2, oct1, oct2, valid, key,
                n_hyp=256, fix_scale=False, scale_factor=1.2):
    """RANSAC Sim3 between two keyframes from matched landmark pairs.

    Args:
      p1/p2: (N,3) matched landmark positions in CAMERA coords of KF1/KF2.
      uv1/uv2: (N,2) observed keypoints in each image; oct1/oct2 levels.
      valid: (N,) bool real matches.
    Returns dict(R12, t12, s12, inlier (N,), n_inliers, ok).
    """
    N = p1.shape[0]
    p = valid.astype(jnp.float32)
    p = p / jnp.maximum(p.sum(), 1.0)
    samples = jax.random.choice(key, N, (n_hyp, 3), replace=True, p=p)

    def solve(s_idx):
        return horn_sim3(p1[s_idx], p2[s_idx], fix_scale=fix_scale)

    Rs, ts, ss = jax.vmap(solve)(samples)

    # two-way reprojection check (Sim3Solver::CheckInliers)
    sig1 = scale_factor ** (2.0 * oct1.astype(jnp.float32))
    sig2 = scale_factor ** (2.0 * oct2.astype(jnp.float32))

    def score(R, t, s):
        # p2 -> cam1: S12 p2
        x1 = s * (p2 @ R.T) + t
        uv1_hat = cam_mod.project(cam, x1)
        e1 = jnp.sum((uv1_hat - uv1) ** 2, -1)
        # p1 -> cam2: S21 = (1/s) R^T (p1 - t)
        x2 = ((p1 - t) @ R) / jnp.maximum(s, 1e-12)
        uv2_hat = cam_mod.project(cam, x2)
        e2 = jnp.sum((uv2_hat - uv2) ** 2, -1)
        inl = (e1 < CHI2_2DOF_99 * sig1) & (e2 < CHI2_2DOF_99 * sig2) \
            & (x1[..., 2] > 0) & (x2[..., 2] > 0) & valid
        return inl

    inls = jax.vmap(score)(Rs, ts, ss)
    counts = jnp.sum(inls.astype(jnp.int32), -1)
    finite = (jnp.all(jnp.isfinite(Rs), (-1, -2)) & jnp.all(
        jnp.isfinite(ts), -1) & jnp.isfinite(ss) & (ss > 1e-6))
    counts = jnp.where(finite, counts, -1)
    best = jnp.argmax(counts)
    return dict(R12=Rs[best], t12=ts[best], s12=ss[best],
                inlier=inls[best], n_inliers=counts[best],
                ok=counts[best] >= 6)


@partial(jax.jit, static_argnames=("cam", "n_iters", "fix_scale",
                                   "scale_factor"))
def optimize_sim3(cam, R0, t0, s0, p1, p2, uv1, uv2, oct1, oct2, valid,
                  n_iters=10, fix_scale=False, scale_factor=1.2,
                  chi2_th=10.0):
    """Gauss-Newton refinement of S12 with bidirectional residuals.

    Parity: Optimizer::OptimizeSim3 (EdgeSim3ProjectXYZ +
    EdgeInverseSim3ProjectXYZ, Huber, chi2 gate 10).
    Returns dict(R12, t12, s12, inlier, n_inliers).
    """
    sig1 = scale_factor ** (-2.0 * oct1.astype(jnp.float32))
    sig2 = scale_factor ** (-2.0 * oct2.astype(jnp.float32))

    def residuals(v):
        R, t, s = lie.sim3_exp(v)
        Rc, tc, sc = lie.sim3_mul(R, t, s, R0, t0, s0)
        x1 = sc * (p2 @ Rc.T) + tc
        r1 = cam_mod.project(cam, x1) - uv1
        Ri, ti, si = lie.sim3_inv(Rc, tc, sc)
        x2 = si * (p1 @ Ri.T) + ti
        r2 = cam_mod.project(cam, x2) - uv2
        return r1, r2, x1[..., 2], x2[..., 2]

    def chi2(r1, r2):
        return (jnp.sum(r1 * r1, -1) * sig1, jnp.sum(r2 * r2, -1) * sig2)

    def body(carry, _):
        v, inlier = carry

        def stack_res(vv):
            r1, r2, z1, z2 = residuals(vv)
            return jnp.concatenate([r1.reshape(-1), r2.reshape(-1)])

        r = stack_res(v)
        J = jax.jacfwd(stack_res)(v)                  # (4N, 7)
        r1, r2, z1, z2 = residuals(v)
        c1, c2 = chi2(r1, r2)
        w1 = jnp.where(inlier & valid & (z1 > 0), sig1, 0.0)
        w2 = jnp.where(inlier & valid & (z2 > 0), sig2, 0.0)
        w = jnp.concatenate([jnp.repeat(w1, 2), jnp.repeat(w2, 2)])
        JW = J * w[:, None]
        Hm = JW.T @ J + 1e-6 * jnp.eye(7)
        if fix_scale:
            # zero out the scale dof (last tangent coordinate)
            mask = jnp.ones(7).at[6].set(0.0)
            Hm = Hm * mask[:, None] * mask[None, :] \
                + (1.0 - mask)[:, None] * (1.0 - mask)[None, :]
            b = (JW.T @ r) * mask
        else:
            b = JW.T @ r
        dv = -jnp.linalg.solve(Hm, b)
        v_new = lie.sim3_log(*lie.sim3_mul(*lie.sim3_exp(dv),
                                           *lie.sim3_exp(v)))
        r1n, r2n, z1n, z2n = residuals(v_new)
        c1n, c2n = chi2(r1n, r2n)
        inlier_new = (c1n < chi2_th) & (c2n < chi2_th) & (z1n > 0) \
            & (z2n > 0)
        return (v_new, inlier_new), None

    v0 = jnp.zeros(7, jnp.float32)
    r1, r2, z1, z2 = residuals(v0)
    c1, c2 = chi2(r1, r2)
    inl0 = (c1 < chi2_th) & (c2 < chi2_th) & valid
    (v, inlier), _ = jax.lax.scan(body, (v0, inl0), None, length=n_iters)
    R, t, s = lie.sim3_mul(*lie.sim3_exp(v), R0, t0, s0)
    inlier = inlier & valid
    return dict(R12=R, t12=t, s12=s, inlier=inlier,
                n_inliers=jnp.sum(inlier.astype(jnp.int32)))
