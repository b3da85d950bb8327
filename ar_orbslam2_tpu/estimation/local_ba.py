"""Bundle adjustment with dense-blocked Schur complement.

TPU-native replacement for g2o's sparse LM BlockSolver + the reference's
Optimizer::LocalBundleAdjustment / BundleAdjustment (src/Optimizer.cc:≈450,
≈40 — SURVEY.md §2.2 "the single biggest native-replacement item").

Redesign for the MXU:
  * the camera/landmark hypergraph becomes fixed-shape observation tables
    grouped per landmark: obs_cam[P, OPP], obs_uv[P, OPP, 2], ...
  * per-edge Jacobians/Huber weights are batched einsums;
  * landmark blocks Hpp (3x3) are inverted in closed form (batched);
  * the camera-reduced (Schur) system S = Hcc - W Hpp^-1 W^T is assembled
    with one einsum per landmark chunk + scatter-add into [C, C, 6, 6];
  * S is solved DENSE (6C x 6C) with Jacobi equilibration — local windows
    have C <= 64 cameras, so the solve is microscopic on the MXU;
  * Levenberg damping with accept/reject, all inside one jit.

The same engine runs global BA (all keyframes, first camera fixed) — the
reference's GlobalBundleAdjustemnt(sic) — by passing the whole map.

Distribution (parallel/dist_ba.py) shards the landmark axis P over the
device mesh: Hcc/S contributions are psum-reduced (the reduce-scatter /
all-gather pattern of SURVEY.md §5.7); landmark back-substitution stays
local. This module is the single-device kernel of that design.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core import lie
from ..core.robust import CHI2_2DOF, CHI2_3DOF, huber_weight
from . import ba_core


@partial(jax.jit, static_argnames=("cam", "n_iters_1", "n_iters_2"))
def bundle_adjust(cam_R, cam_t, cam_fixed, cam_valid,
                  pts, pt_valid,
                  obs_cam, obs_uv, obs_octave, obs_valid,
                  cam, obs_uvr=None,
                  n_iters_1=5, n_iters_2=10, scale_factor=1.2):
    """Levenberg-Marquardt BA over (cameras, landmarks).

    Args:
      cam_R (C,3,3), cam_t (C,3): world->camera poses (updated in place).
      cam_fixed (C,) bool: poses held constant (gauge / boundary cameras).
      cam_valid (C,) bool: padding mask.
      pts (P,3), pt_valid (P,): landmarks.
      obs_cam (P,OPP) int32: camera index of each observation (-1 pad).
      obs_uv (P,OPP,2), obs_octave (P,OPP), obs_valid (P,OPP) bool.
      obs_uvr (P,OPP) or None: stereo right-u (<0 => mono observation).
      n_iters_1 / n_iters_2: LM iterations before / after the mid-way
        chi2 outlier strip (parity with LocalBundleAdjustment's 5 + 10).
    Returns:
      dict(cam_R, cam_t, pts, obs_inlier (P,OPP) bool, cost).
    """
    C = cam_R.shape[0]
    P, OPP = obs_cam.shape
    oc = jnp.maximum(obs_cam, 0)
    # one-hot camera broadcast table, built ONCE and reused across every
    # LM iteration (TPU gathers of ~200k small blocks serialize; this
    # keeps the loop on the MXU). Falls back to gathers when the table
    # would exceed the memory budget (huge global BAs).
    use_oh = P * OPP * C * 4 <= 512 * 1024 * 1024
    oh = ba_core.obs_one_hot(oc, C) if use_oh else None
    inv_sigma2 = scale_factor ** (-2.0 * obs_octave.astype(jnp.float32))
    if obs_uvr is None:
        obs_uvr = jnp.full((P, OPP), -1.0, jnp.float32)
    stereo = obs_uvr > 0
    chi2_th = jnp.where(stereo, CHI2_3DOF, CHI2_2DOF)
    # static per-call camera masks (don't change inside the LM loop)
    cam_valid_o = jnp.einsum("poc,c->po", oh,
                             cam_valid.astype(jnp.float32)) \
        if use_oh else cam_valid[oc].astype(jnp.float32)
    cam_fixed_o = jnp.einsum("poc,c->po", oh,
                             cam_fixed.astype(jnp.float32)) \
        if use_oh else cam_fixed[oc].astype(jnp.float32)

    def residuals(R_all, t_all, X):
        """r (P,OPP,3), Jc (P,OPP,3,6), Jp (P,OPP,3,3), behind (P,OPP)."""
        return ba_core.ba_residuals(cam, R_all, t_all, X, oc,
                                    obs_uv, obs_uvr, stereo, oh=oh)

    def edge_chi2(r):
        return jnp.sum(r * r, -1) * inv_sigma2

    def lm_step(R_all, t_all, X, inlier, lam, rjac, use_huber):
        # rjac: residuals/Jacobians AT the current accepted state, carried
        # from the previous iteration's evaluation — each LM iteration
        # evaluates the model exactly ONCE (at the trial point)
        r, Jc, Jpt, behind = rjac
        c2 = edge_chi2(r)
        w_h = jnp.where(use_huber, huber_weight(c2, chi2_th), 1.0)
        w = inv_sigma2 * w_h * inlier * obs_valid * (~behind) \
            * pt_valid[:, None] * cam_valid_o
        # fixed cameras: their residuals constrain POINTS but produce no
        # camera gradient -> zero their Jc
        Jcz = jnp.where(cam_fixed_o[..., None, None] > 0, 0.0, Jc)

        blocks = ba_core.schur_blocks(r, Jcz, Jpt, w, oc, C, lam, oh=oh)
        dx_c = ba_core.solve_camera_system(
            blocks["S"], blocks["b_s"], cam_valid & (~cam_fixed), lam)
        dx_p = ba_core.backsub_points(blocks, dx_c, oc, oh=oh)

        dR, dt = lie.se3_exp(dx_c)
        R_new, t_new = lie.se3_mul(dR, dt, R_all, t_all)
        R_new = jnp.where(cam_fixed[:, None, None], R_all, R_new)
        t_new = jnp.where(cam_fixed[:, None], t_all, t_new)
        X_new = jnp.where(pt_valid[:, None], X + dx_p, X)

        # accept / reject on robustified cost (the trial evaluation is
        # REUSED as the next iteration's model when accepted).
        # Behind-camera observations are PENALIZED, not masked out of the
        # cost: masking made a divergent step that threw every point
        # behind the cameras score cost 0 and get ACCEPTED (observed
        # live: one such step wiped the whole map via the outlier erase).
        mask = inlier * obs_valid * pt_valid[:, None] * cam_valid_o
        rjac_new = residuals(R_new, t_new, X_new)
        r2, _, _, behind2 = rjac_new
        c2n = edge_chi2(r2)
        w_hn = jnp.where(use_huber, huber_weight(c2n, chi2_th), 1.0)
        BEHIND_PENALTY = jnp.float32(1e6)
        cost_old = jnp.sum(jnp.where(behind, BEHIND_PENALTY, c2 * w_h)
                           * mask)
        cost_new = jnp.sum(jnp.where(behind2, BEHIND_PENALTY, c2n * w_hn)
                           * mask)
        accept = cost_new < cost_old
        R_all = jnp.where(accept, R_new, R_all)
        t_all = jnp.where(accept, t_new, t_all)
        X = jnp.where(accept, X_new, X)
        rjac = jax.tree.map(lambda a, b: jnp.where(accept, a, b)
                            if a.dtype != bool
                            else jnp.where(accept, a, b),
                            rjac_new, rjac)
        lam = jnp.clip(jnp.where(accept, lam * 0.4, lam * 5.0), 1e-7, 1e4)
        # converged: an accepted step barely moved the robust cost
        done = accept & (cost_old - cost_new < 1e-5 * (cost_old + 1e-6))
        return R_all, t_all, X, lam, rjac, done

    def run_phase(carry, n_iters, use_huber):
        # early-exit while_loop: LM typically converges in ~5 iterations
        # and the iteration cost dominates the mapping stage's device time
        def cond(c):
            i, done = c[0], c[-1]
            return (i < n_iters) & (~done)

        def body(c):
            i, R_all, t_all, X, inlier, lam, rjac, _ = c
            R_all, t_all, X, lam, rjac, done = lm_step(
                R_all, t_all, X, inlier, lam, rjac, use_huber)
            return (i + 1, R_all, t_all, X, inlier, lam, rjac, done)

        out = jax.lax.while_loop(
            cond, body, (jnp.int32(0),) + carry + (jnp.bool_(False),))
        return out[1:-1]

    inlier = obs_valid
    rjac = residuals(cam_R, cam_t, pts)
    carry = (cam_R, cam_t, pts, inlier, jnp.float32(1e-4), rjac)
    carry = run_phase(carry, n_iters_1, jnp.asarray(True))
    # mid-way outlier strip (parity: LocalBundleAdjustment chi2 gate)
    R_all, t_all, X, _, lam, rjac = carry
    r, _, _, behind = rjac
    inlier = (edge_chi2(r) <= chi2_th) & (~behind) & obs_valid
    carry = (R_all, t_all, X, inlier, lam, rjac)
    carry = run_phase(carry, n_iters_2, jnp.asarray(True))
    R_all, t_all, X, inlier, lam, rjac = carry

    r, _, _, behind = rjac            # residuals at the final state
    c2 = edge_chi2(r)
    inlier = (c2 <= chi2_th) & (~behind) & obs_valid
    cost = jnp.sum(jnp.where(inlier, c2, 0.0))
    return dict(cam_R=R_all, cam_t=t_all, pts=X, obs_inlier=inlier,
                cost=cost)
