"""Motion-only bundle adjustment (pose-only Levenberg-Marquardt on SE3).

TPU-native replacement for Optimizer::PoseOptimization
(src/Optimizer.cc:≈230, SURVEY.md §2.1) which the reference runs twice per
frame via g2o. Redesign: the g2o edge graph becomes dense per-point
residual/Jacobian arrays; Huber becomes IRLS weights; the 4 rounds x 10 LM
iterations with chi2 inlier re-classification per round are kept exactly
(they define the tracking behavior), but each round is a fused lax loop —
one jit, zero host round-trips.

Pose convention: Tcw with LEFT-multiplicative tangent update
T <- exp(xi) * T, xi = (rho, omega).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core import lie
from ..core.robust import CHI2_2DOF, CHI2_3DOF, huber_weight


def reproj_residual_jac(R, t, xw, cam):
    """Residuals' building blocks for pose-only GN.

    Returns (xc, J_xc) where J_xc (N, 3, 6) = d(xc)/d(xi) for the left
    update xc' = exp(xi) applied to (R xw + t): J = [I | -hat(xc)].
    """
    xc = (xw @ R.T) + t
    N = xw.shape[0]
    I = jnp.broadcast_to(jnp.eye(3, dtype=xw.dtype), (N, 3, 3))
    J = jnp.concatenate([I, -lie.hat(xc)], axis=-1)       # (N,3,6)
    return xc, J


def _solve6(H, b, n_iters=10):
    """6x6 SPD solve as Jacobi-preconditioned CG (pure vector ops).

    jnp.linalg.solve lowers to a LAPACK-style custom call that
    de-optimizes the surrounding compiled loop on TPU (bisect-measured
    ~0.3 ms per call); pose optimization makes ~80 such solves per
    frame. CG is exact in <=6 steps for a 6x6 SPD system.
    """
    Minv = 1.0 / jnp.maximum(jnp.diagonal(H), 1e-12)

    def body(carry, _):
        x, r, z, p = carry
        Hp = H @ p
        rz = jnp.dot(r, z)
        alpha = rz / jnp.maximum(jnp.dot(p, Hp), 1e-20)
        x = x + alpha * p
        r2 = r - alpha * Hp
        z2 = Minv * r2
        beta = jnp.dot(r2, z2) / jnp.maximum(rz, 1e-20)
        return (x, r2, z2, z2 + beta * p), None

    z0 = Minv * b
    (x, _, _, _), _ = jax.lax.scan(
        body, (jnp.zeros_like(b), b, z0, z0), None, length=n_iters)
    return x


def _proj_jacobian(cam, xc):
    """d(u,v)/d(xc): (N, 2, 3)."""
    x, y = xc[..., 0], xc[..., 1]
    z = jnp.maximum(xc[..., 2], 1e-6)
    iz = 1.0 / z
    iz2 = iz * iz
    zero = jnp.zeros_like(z)
    row_u = jnp.stack([cam.fx * iz, zero, -cam.fx * x * iz2], -1)
    row_v = jnp.stack([zero, cam.fy * iz, -cam.fy * y * iz2], -1)
    return jnp.stack([row_u, row_v], -2)


@partial(jax.jit, static_argnames=("cam", "n_rounds", "n_iters"))
def pose_optimization(R0, t0, xw, uv, octave, valid, cam,
                      uv_right=None, n_rounds=4, n_iters=10,
                      scale_factor=1.2, chi2_mono=CHI2_2DOF,
                      chi2_stereo=CHI2_3DOF):
    """Optimize Tcw from 3D-2D matches, with per-round outlier gating.

    Args:
      R0, t0: initial world->camera pose.
      xw: (N, 3) matched landmark positions.
      uv: (N, 2) observed (undistorted) keypoints.
      octave: (N,) keypoint pyramid level -> information 1/scale^(2*oct).
      valid: (N,) bool — which rows are real matches.
      uv_right: optional (N,) right-image u for stereo points (NaN/neg for
        mono points); enables the 3-dof stereo residual like the reference's
        EdgeStereoSE3ProjectXYZOnlyPose.
    Returns:
      dict(R, t, inlier (N,) bool, n_inliers, chi2).
    """
    inv_sigma2 = scale_factor ** (-2.0 * octave.astype(jnp.float32))
    has_stereo = uv_right is not None
    if has_stereo:
        stereo_mask = (uv_right > 0) & valid
    else:
        uv_right = jnp.zeros(uv.shape[0], uv.dtype)
        stereo_mask = jnp.zeros(uv.shape[0], bool)

    def residuals(R, t):
        xc, J_xi = reproj_residual_jac(R, t, xw, cam)
        z = jnp.maximum(xc[..., 2], 1e-6)
        u = cam.fx * xc[..., 0] / z + cam.cx
        v = cam.fy * xc[..., 1] / z + cam.cy
        r_uv = jnp.stack([u, v], -1) - uv                # (N,2)
        Jp = _proj_jacobian(cam, xc)                     # (N,2,3)
        J_uv = Jp @ J_xi                                 # (N,2,6)
        # stereo third residual: u_r = u - bf/z
        u_r = u - cam.bf / z
        r_r = jnp.where(stereo_mask, u_r - uv_right, 0.0)
        # d(u_r)/d(xc) = d(u)/d(xc) + [0, 0, bf/z^2]
        J_r3 = Jp[:, 0, :] + jnp.stack(
            [jnp.zeros_like(z), jnp.zeros_like(z), cam.bf / (z * z)], -1)
        J_r = (J_r3[:, None, :] @ J_xi)[:, 0, :]         # (N,6)
        J_r = jnp.where(stereo_mask[:, None], J_r, 0.0)
        r = jnp.concatenate([r_uv, r_r[:, None]], -1)    # (N,3)
        J = jnp.concatenate([J_uv, J_r[:, None, :]], -2)  # (N,3,6)
        behind = xc[..., 2] <= 0.0
        return r, J, behind

    def edge_chi2(r):
        c2 = jnp.sum(r * r, -1) * inv_sigma2
        return c2

    chi2_th = jnp.where(stereo_mask, chi2_stereo, chi2_mono)

    def run_round(R, t, inlier, rjac, use_huber):
        # rjac = residuals/Jacobian AT the current accepted state: one
        # model evaluation per LM iteration (the trial evaluation is
        # reused when accepted — same scheme as the Schur BA engine).
        # Early exit (device while_loop): stop the round once an accepted
        # step's update norm falls below tol — LM with a good velocity-
        # model init converges in 2-4 iterations, and loop iterations
        # dominate the measured device time of the tracking megastep.
        def cond(carry):
            i, R, t, lam, rjac, done = carry
            return (i < n_iters) & (~done)

        def body(carry):
            i, R, t, lam, rjac, done = carry
            r, J, behind = rjac
            c2 = edge_chi2(r)
            delta2 = jnp.where(stereo_mask, chi2_stereo, chi2_mono)
            w_huber = jnp.where(use_huber, huber_weight(c2, delta2), 1.0)
            w = inv_sigma2 * w_huber * inlier * valid * (~behind)
            # normal equations: H (6,6), b (6,)
            JW = J * w[:, None, None]
            Hmat = jnp.einsum("nri,nrj->ij", JW, J)
            bvec = jnp.einsum("nri,nr->i", JW, r)
            Hd = Hmat + lam * jnp.diag(jnp.diag(Hmat)) + 1e-8 * jnp.eye(6)
            dx = -_solve6(Hd, bvec)
            R_new, t_new = lie.se3_mul(*lie.se3_exp(dx), R, t)
            # accept if total weighted chi2 decreased. Behind-camera
            # points are PENALIZED rather than masked: a wild step that
            # throws points behind the camera must read as a cost
            # increase, not a free lunch (see local_ba.lm_step).
            rjac_new = residuals(R_new, t_new)
            r_new, _, behind_new = rjac_new
            mask = inlier * valid
            BEHIND_PENALTY = jnp.float32(1e6)
            cost_old = jnp.sum(
                jnp.where(behind, BEHIND_PENALTY,
                          edge_chi2(r) * w_huber) * mask)
            c2n = edge_chi2(r_new)
            w_hn = jnp.where(use_huber, huber_weight(c2n, delta2), 1.0)
            cost_new = jnp.sum(
                jnp.where(behind_new, BEHIND_PENALTY, c2n * w_hn) * mask)
            accept = cost_new < cost_old
            R = jnp.where(accept, R_new, R)
            t = jnp.where(accept, t_new, t)
            rjac = jax.tree.map(lambda a, b: jnp.where(accept, a, b),
                                rjac_new, rjac)
            lam = jnp.where(accept, lam * 0.5, lam * 4.0)
            done = (accept & (jnp.max(jnp.abs(dx)) < 1e-5)) \
                | ((~accept) & (lam >= 1e6))
            return (i + 1, R, t, jnp.clip(lam, 1e-9, 1e6), rjac, done)

        _, R, t, _, rjac, _ = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), R, t, jnp.float32(1e-3), rjac, jnp.bool_(False)))
        # re-classify inliers at round end (reference: per-round chi2 gate)
        r, _, behind = rjac
        c2 = edge_chi2(r)
        inlier = (c2 <= chi2_th) & (~behind) & valid
        return R, t, inlier, rjac

    R, t = R0, t0
    inlier = valid
    rjac = residuals(R, t)
    for rnd in range(n_rounds):
        use_huber = jnp.asarray(rnd < 2)   # reference drops the kernel after 2 rounds
        R, t, inlier, rjac = run_round(R, t, inlier, rjac, use_huber)

    r, _, behind = rjac
    c2 = jnp.where(inlier, edge_chi2(r), 0.0)
    return dict(R=R, t=t, inlier=inlier,
                n_inliers=jnp.sum(inlier.astype(jnp.int32)),
                chi2=jnp.sum(c2))


def compact_rows(mask, M):
    """Fixed-size compaction of the True rows of a boolean mask.

    Returns (gather_idx (M,) in-range for jnp.take, scatter_idx (M,) =
    row index for valid slots / N for padding (use mode='drop'),
    sel_valid (M,) bool). Rows keep their original order; if more than M
    rows are set, the extras are dropped. Pure O(N) scatter — no sort.
    """
    N = mask.shape[0]
    pos = jnp.cumsum(mask.astype(jnp.int32)) - 1
    dest = jnp.where(mask, pos, M)
    gather_idx = jnp.zeros((M,), jnp.int32).at[dest].set(
        jnp.arange(N, dtype=jnp.int32), mode="drop")
    count = jnp.sum(mask.astype(jnp.int32))
    sel_valid = jnp.arange(M, dtype=jnp.int32) < count
    scatter_idx = jnp.where(sel_valid, gather_idx, N)
    return gather_idx, scatter_idx, sel_valid


def pose_optimization_compact(R0, t0, xw, uv, octave, valid, cam, M,
                              uv_right=None, **kw):
    """pose_optimization over only the `valid` rows, compacted to a
    fixed size M before the LM loops.

    The padded observation arrays at the call sites (4096-slot landmark
    bundles, 1024-slot keypoint sets) carry mostly invalid rows; the LM
    iteration cost is linear in the row count, so compacting to the
    realistic match count (M = 512-1024) cuts the dominant device cost
    of per-frame tracking ~4x. Results are identical up to dropped rows
    beyond M. Returns the same dict with `inlier` scattered back to the
    full row space.
    """
    N = xw.shape[0]
    gi, si, sel = compact_rows(valid, M)
    res = pose_optimization(
        R0, t0, jnp.take(xw, gi, axis=0), jnp.take(uv, gi, axis=0),
        jnp.take(octave, gi, axis=0), sel, cam,
        uv_right=None if uv_right is None
        else jnp.take(uv_right, gi, axis=0), **kw)
    inlier = jnp.zeros((N,), bool).at[si].set(
        res["inlier"] & sel, mode="drop")
    return dict(res, inlier=inlier)
