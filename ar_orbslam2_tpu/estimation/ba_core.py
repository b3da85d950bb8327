"""Shared building blocks of the Schur-complement BA engine.

Single home for the residual/Jacobian math and the landmark-marginalised
(Schur) system assembly used by both the single-device engine
(estimation/local_ba.py — parity: Optimizer::{Local,}BundleAdjustment,
src/Optimizer.cc:≈450/≈40) and the landmark-sharded distributed engine
(parallel/dist_ba.py — SURVEY.md §5.7: landmark blocks local per device,
camera-reduced system summed over the mesh).

Observation layout is grouped per landmark: obs_cam (P, OPP) int32 camera
index with -1 padding, obs_uv (P, OPP, 2), etc. All functions are
fixed-shape and jit/shard_map friendly.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import lie


def ba_residuals(cam, R_all, t_all, X, oc, obs_uv, obs_uvr, stereo):
    """Per-observation residuals + Jacobians.

    Returns:
      r (P,OPP,3): [du, dv, du_right] (third row zero for mono obs).
      Jc (P,OPP,3,6): d r / d xi_cam (left-mult SE3 perturbation).
      Jpt (P,OPP,3,3): d r / d X.
      behind (P,OPP) bool: point behind the camera.
    """
    P, OPP = oc.shape
    Rg = R_all[oc]                      # (P,OPP,3,3)
    tg = t_all[oc]
    xc = jnp.einsum("poij,pj->poi", Rg, X) + tg
    z = jnp.maximum(xc[..., 2], 1e-6)
    u = cam.fx * xc[..., 0] / z + cam.cx
    v = cam.fy * xc[..., 1] / z + cam.cy
    r_uv = jnp.stack([u - obs_uv[..., 0], v - obs_uv[..., 1]], -1)
    u_r = u - cam.bf / z
    r_r = jnp.where(stereo, u_r - obs_uvr, 0.0)
    r = jnp.concatenate([r_uv, r_r[..., None]], -1)
    x, y = xc[..., 0], xc[..., 1]
    iz = 1.0 / z
    iz2 = iz * iz
    zero = jnp.zeros_like(z)
    Jp_row_u = jnp.stack([cam.fx * iz, zero, -cam.fx * x * iz2], -1)
    Jp_row_v = jnp.stack([zero, cam.fy * iz, -cam.fy * y * iz2], -1)
    Jp_row_r = Jp_row_u + jnp.stack([zero, zero, cam.bf * iz2], -1)
    Jp_row_r = jnp.where(stereo[..., None], Jp_row_r, 0.0)
    Jproj = jnp.stack([Jp_row_u, Jp_row_v, Jp_row_r], -2)  # (P,OPP,3,3)
    # d xc / d xi (camera, left perturbation) = [I | -hat(xc)]
    I3 = jnp.broadcast_to(jnp.eye(3, dtype=X.dtype), (P, OPP, 3, 3))
    Jxi = jnp.concatenate([I3, -lie.hat(xc)], -1)          # (P,OPP,3,6)
    Jc = Jproj @ Jxi                                       # (P,OPP,3,6)
    Jpt = Jproj @ Rg                                       # d xc / d X = R
    return r, Jc, Jpt, xc[..., 2] <= 0.0


def schur_blocks(r, Jc, Jpt, w, oc, n_cam, lam):
    """Assemble the landmark-marginalised camera system from one landmark
    block (the whole problem single-device, or this device's shard).

    Returns dict with the pieces that must be SUMMED across landmark
    shards (S, b_s, Hcc diag handled inside S) plus the local pieces
    needed for back-substitution (Hpp_inv, Wb, b_p).
    """
    C = n_cam
    P, OPP = oc.shape
    JcW = Jc * w[..., None, None]
    JptW = Jpt * w[..., None, None]
    Hcc = jnp.zeros((C, 6, 6)).at[oc].add(
        jnp.einsum("pori,porj->poij", JcW, Jc))
    b_c = jnp.zeros((C, 6)).at[oc].add(
        jnp.einsum("pori,por->poi", JcW, r))
    Hpp = jnp.einsum("pori,porj->pij", JptW, Jpt)          # (P,3,3)
    b_p = jnp.einsum("pori,por->pi", JptW, r)              # (P,3)
    Wb = jnp.einsum("pori,porj->poij", JcW, Jpt)           # (P,OPP,6,3)

    Hpp_d = Hpp + (lam * jax.vmap(jnp.diag)(
        jax.vmap(jnp.diag)(Hpp)) + 1e-6 * jnp.eye(3))
    Hpp_inv = jnp.linalg.inv(Hpp_d)
    Y = jnp.einsum("poij,pjk->poik", Wb, Hpp_inv)          # (P,OPP,6,3)

    # Schur: S[ci,cj] -= Y_i @ W_j^T for observation pairs of one point.
    # The pairwise tensor is (B,OPP,OPP,6,6) per chunk — materializing it
    # for ALL P at once OOMs HBM (P=2048, OPP=48 -> 19 GB with remat
    # copies, caught live on a v5e), so accumulate over P-chunks with a
    # scan: each chunk is ~40 MB and the MXU stays busy.
    B = min(P, 128)
    if P % B:
        B = P                      # non-power-of-two P: single chunk
    n_chunks = max(P // B, 1)

    def chunk_body(S_acc, chunk):
        Y_c, Wb_c, oc_c = chunk
        T = jnp.einsum("boik,bqjk->boqij", Y_c, Wb_c)      # (B,OPP,OPP,6,6)
        ci = jnp.broadcast_to(oc_c[:, :, None], (B, OPP, OPP))
        cj = jnp.broadcast_to(oc_c[:, None, :], (B, OPP, OPP))
        return S_acc.at[ci, cj].add(-T), None

    S0 = jnp.zeros((C, C, 6, 6))
    S, _ = jax.lax.scan(
        chunk_body, S0,
        (Y.reshape(n_chunks, B, OPP, 6, 3),
         Wb.reshape(n_chunks, B, OPP, 6, 3),
         oc.reshape(n_chunks, B, OPP)))
    S = S.at[jnp.arange(C), jnp.arange(C)].add(Hcc)
    b_s = b_c - jnp.zeros((C, 6)).at[oc].add(
        jnp.einsum("poik,pk->poi", Y, b_p))
    return dict(S=S, b_s=b_s, Hpp_inv=Hpp_inv, Wb=Wb, b_p=b_p)


def solve_camera_system(S, b_s, cam_free, lam):
    """Dense solve of the reduced camera system with Levenberg damping and
    Jacobi equilibration; fixed/padded cameras clamped to identity rows.

    S (C,C,6,6), b_s (C,6), cam_free (C,) bool -> dx_c (C,6).
    """
    C = b_s.shape[0]
    Sd = jnp.transpose(S, (0, 2, 1, 3)).reshape(6 * C, 6 * C)
    diag = jnp.diagonal(Sd)
    Sd = Sd + jnp.diag(lam * diag)
    free6 = jnp.repeat(cam_free.astype(Sd.dtype), 6)
    Sd = Sd * free6[:, None] * free6[None, :] + jnp.diag(1.0 - free6)
    d = jnp.sqrt(jnp.maximum(jnp.abs(jnp.diagonal(Sd)), 1e-8))
    Sd = Sd / d[:, None] / d[None, :]
    rhs = (-b_s.reshape(-1) * free6) / d
    return (jnp.linalg.solve(Sd, rhs) / d).reshape(C, 6)


def backsub_points(blocks, dx_c, oc):
    """Landmark update given camera step: dx_p = Hpp^-1 (-b_p - W^T dx_c)."""
    Wt_dxc = jnp.einsum("poij,poi->pj", blocks["Wb"], dx_c[oc])
    return jnp.einsum("pij,pj->pi", blocks["Hpp_inv"],
                      -blocks["b_p"] - Wt_dxc)
