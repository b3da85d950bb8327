"""Batched RANSAC PnP — pose from 3D-2D matches on the MXU.

TPU-native redesign of PnPsolver (src/PnPsolver.cc, SURVEY.md §2.1): the
reference wraps EPnP (4 control points, Gauss-Newton betas) in an adaptive
early-exit RANSAC because per-hypothesis CPU cost matters; on TPU we run a
FIXED batch of a few hundred DLT-PnP hypotheses as one vmapped computation
(batched 12x12 eigensolves + one (H, N) reprojection pass) and take the
argmax-inlier hypothesis — no data-dependent control flow, identical
robust-estimation semantics. Final polish is motion-only BA
(pose_optimization), exactly as Tracking::Relocalization does.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core import camera as cam_mod

CHI2_2DOF = 5.991
MIN_SAMPLE = 6          # DLT minimal-ish sample (vs EPnP's 4)


def _dlt_pose(X, xn):
    """DLT projection-matrix fit for one sample: X (S,3), xn (S,2)
    normalized image coords -> (R (3,3), t (3,))."""
    S = X.shape[0]
    ones = jnp.ones((S, 1), X.dtype)
    zeros = jnp.zeros((S, 4), X.dtype)
    Xh = jnp.concatenate([X, ones], -1)                       # (S,4)
    rows_u = jnp.concatenate([Xh, zeros, -xn[:, 0:1] * Xh], -1)
    rows_v = jnp.concatenate([zeros, Xh, -xn[:, 1:2] * Xh], -1)
    A = jnp.concatenate([rows_u, rows_v], 0)                  # (2S,12)
    AtA = A.T @ A
    w, V = jnp.linalg.eigh(AtA)
    p = V[:, 0]
    P = p.reshape(3, 4)
    # overall sign: the mean sample depth (P row 3 . [X,1]) must be > 0
    depth_mean = jnp.mean(Xh @ P[2])
    P = P * jnp.where(depth_mean < 0, -1.0, 1.0)
    M = P[:, :3]
    # orthogonalize M ~ s R: R = U diag(1,1,det) V^T, s = mean singular val
    U, sv, Vt = jnp.linalg.svd(M)
    d = jnp.linalg.det(U @ Vt)
    D = jnp.diag(jnp.stack([jnp.ones_like(d), jnp.ones_like(d), d]))
    R = U @ D @ Vt
    s = jnp.maximum(jnp.mean(sv), 1e-12)
    t = P[:, 3] / s
    return R, t


@partial(jax.jit, static_argnames=("cam", "n_hyp", "scale_factor"))
def pnp_ransac(xw, uv, octave, valid, cam, key, n_hyp=256,
               scale_factor=1.2):
    """Robust pose from 3D-2D matches.

    Args:
      xw (N,3) landmark positions; uv (N,2) observed pixels; octave (N,)
      pyramid level (per-scale chi2 gate, parity with PnPsolver's
      mvMaxError); valid (N,) bool.
    Returns dict(R, t, inlier (N,) bool, n_inliers, ok).
    """
    N = xw.shape[0]
    p = valid.astype(jnp.float32)
    p = p / jnp.maximum(p.sum(), 1.0)
    samples = jax.random.choice(key, N, (n_hyp, MIN_SAMPLE), replace=True,
                                p=p)
    Kinv = jnp.linalg.inv(cam.K)
    ones = jnp.ones(uv.shape[:-1] + (1,), uv.dtype)
    xn = (jnp.concatenate([uv, ones], -1) @ Kinv.T)[..., :2]

    Rs, ts = jax.vmap(lambda s: _dlt_pose(xw[s], xn[s]))(samples)

    # score every hypothesis against every match: (H, N) chi2
    xc = jnp.einsum("hij,nj->hni", Rs, xw) + ts[:, None, :]
    uv_hat = cam_mod.project(cam, xc)
    err2 = jnp.sum((uv_hat - uv[None]) ** 2, -1)
    sigma2 = scale_factor ** (2.0 * octave.astype(jnp.float32))
    inl = (err2 < CHI2_2DOF * sigma2[None, :]) & (xc[..., 2] > 0) \
        & valid[None, :]
    scores = jnp.sum(inl.astype(jnp.int32), -1)
    finite = jnp.all(jnp.isfinite(Rs), (-1, -2)) & jnp.all(
        jnp.isfinite(ts), -1)
    scores = jnp.where(finite, scores, -1)
    best = jnp.argmax(scores)
    return dict(R=Rs[best], t=ts[best], inlier=inl[best],
                n_inliers=scores[best],
                ok=scores[best] >= MIN_SAMPLE + 4)
