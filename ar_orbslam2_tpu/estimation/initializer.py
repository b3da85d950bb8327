"""Two-view monocular initialization: parallel H/F RANSAC + reconstruction.

TPU-native redesign of Initializer (src/Initializer.cc, SURVEY.md §2.1).
The reference runs two CPU threads, one fitting homographies and one
fundamental matrices, each an early-exit RANSAC loop. Here each model is a
single vmapped hypothesis batch (fixed iteration count, argmax score) — the
TPU idiom for RANSAC — and the model choice RH = SH/(SH+SF) > 0.40, the
chi-square scoring gates (3.841 / 5.991), and the cheirality/parallax
checks of ReconstructF/ReconstructH are kept semantically identical.

The 8-point/DLT solvers run on normalized coordinates (Hartley
conditioning) for f32 stability; scores are computed in pixels like the
reference (sigma = 1 px).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core import geometry

TH_F = 3.841          # 1-dof chi2 gate for epipolar distance
TH_SCORE = 5.991      # scoring offset (both models) and H gate
MIN_PARALLAX_DEG = 1.0
MIN_TRIANGULATED = 50


def _normalize(pts, valid):
    """Hartley normalization over valid points: returns (pts_n, T 3x3)."""
    w = valid.astype(pts.dtype)
    n = jnp.maximum(jnp.sum(w), 1.0)
    mean = jnp.sum(pts * w[:, None], 0) / n
    d = jnp.abs(pts - mean) * w[:, None]
    meandev = jnp.sum(d, 0) / n
    s = 1.0 / jnp.maximum(meandev, 1e-6)
    pts_n = (pts - mean) * s
    T = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]],
                  pts.dtype)
    T = T.at[0, 0].set(s[0]).at[1, 1].set(s[1])
    T = T.at[0, 2].set(-mean[0] * s[0]).at[1, 2].set(-mean[1] * s[1])
    return pts_n, T


def _smallest_eigvec(AtA):
    _, V = jnp.linalg.eigh(AtA)
    return V[..., :, 0]


def _compute_f(p1, p2, w=None):
    """8-point F from (K,2),(K,2) normalized points (optionally weighted —
    used for the all-inlier refit). F: p2' F p1 = 0."""
    x1, y1 = p1[:, 0], p1[:, 1]
    x2, y2 = p2[:, 0], p2[:, 1]
    one = jnp.ones_like(x1)
    A = jnp.stack([x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2,
                   x1, y1, one], -1)                     # (K,9)
    Aw = A if w is None else A * w[:, None]
    f = _smallest_eigvec(A.T @ Aw)
    F = f.reshape(3, 3)
    # enforce rank 2
    U, S, Vt = jnp.linalg.svd(F)
    S = S.at[2].set(0.0)
    return (U * S[None, :]) @ Vt


def _compute_h(p1, p2, w=None):
    """DLT homography from (K,2),(K,2): p2 ~ H p1 (optionally weighted)."""
    x1, y1 = p1[:, 0], p1[:, 1]
    x2, y2 = p2[:, 0], p2[:, 1]
    one = jnp.ones_like(x1)
    zero = jnp.zeros_like(x1)
    r1 = jnp.stack([zero, zero, zero, -x1, -y1, -one,
                    y2 * x1, y2 * y1, y2], -1)
    r2 = jnp.stack([x1, y1, one, zero, zero, zero,
                    -x2 * x1, -x2 * y1, -x2], -1)
    A = jnp.concatenate([r1, r2], 0)                     # (2K,9)
    Aw = A if w is None else A * jnp.concatenate([w, w])[:, None]
    h = _smallest_eigvec(A.T @ Aw)
    return h.reshape(3, 3)


def _score_f(F, uv1, uv2, valid, sigma2=1.0):
    """Symmetric epipolar chi2 score (CheckFundamental parity)."""
    d2_21 = geometry.epipolar_sq_dist(F, uv1, uv2) / sigma2
    d2_12 = geometry.epipolar_sq_dist(jnp.swapaxes(F, 0, 1), uv2, uv1) / sigma2
    ok = (d2_21 <= TH_F) & (d2_12 <= TH_F) & valid
    score = jnp.where(d2_21 <= TH_F, TH_SCORE - d2_21, 0.0) + \
        jnp.where(d2_12 <= TH_F, TH_SCORE - d2_12, 0.0)
    return jnp.sum(score * valid), ok


def _apply_h(Hm, uv):
    ones = jnp.ones(uv.shape[:-1] + (1,), uv.dtype)
    p = jnp.concatenate([uv, ones], -1) @ Hm.T
    w = jnp.where(jnp.abs(p[..., 2]) < 1e-9, 1e-9, p[..., 2])
    return p[..., :2] / w[..., None]


def _score_h(Hm, uv1, uv2, valid, sigma2=1.0):
    """Symmetric transfer chi2 score (CheckHomography parity)."""
    Hinv = jnp.linalg.inv(Hm + 1e-12 * jnp.eye(3))
    e21 = jnp.sum((_apply_h(Hm, uv1) - uv2) ** 2, -1) / sigma2
    e12 = jnp.sum((_apply_h(Hinv, uv2) - uv1) ** 2, -1) / sigma2
    ok = (e21 <= TH_SCORE) & (e12 <= TH_SCORE) & valid
    score = jnp.where(e21 <= TH_SCORE, TH_SCORE - e21, 0.0) + \
        jnp.where(e12 <= TH_SCORE, TH_SCORE - e12, 0.0)
    return jnp.sum(score * valid), ok


@partial(jax.jit, static_argnames=("n_hyp",))
def ransac_fh(uv1, uv2, valid, key, n_hyp=256):
    """Batched RANSAC for F and H simultaneously.

    Returns dict(F, H, score_f, score_h, inliers_f, inliers_h).
    """
    logits = jnp.where(valid, 0.0, -1e9)
    idx = jax.random.categorical(key, logits, shape=(n_hyp, 8))
    p1n, T1 = _normalize(uv1, valid)
    p2n, T2 = _normalize(uv2, valid)

    def one_hyp(ids):
        s1 = p1n[ids]
        s2 = p2n[ids]
        Fn = _compute_f(s1, s2)
        F = T2.T @ Fn @ T1
        F = F / jnp.maximum(jnp.abs(F[2, 2]), 1e-9)
        Hn = _compute_h(s1, s2)
        Hm = jnp.linalg.inv(T2) @ Hn @ T1
        Hm = Hm / jnp.where(jnp.abs(Hm[2, 2]) < 1e-9, 1e-9, Hm[2, 2])
        sf, _ = _score_f(F, uv1, uv2, valid)
        sh, _ = _score_h(Hm, uv1, uv2, valid)
        return F, Hm, sf, sh

    Fs, Hs, sf, sh = jax.vmap(one_hyp)(idx)
    bf = jnp.argmax(sf)
    bh = jnp.argmax(sh)
    F, Hm = Fs[bf], Hs[bh]
    score_f, inl_f = _score_f(F, uv1, uv2, valid)
    score_h, inl_h = _score_h(Hm, uv1, uv2, valid)

    # All-inlier least-squares refit (two passes). The reference instead
    # relies on full BA immediately after init; refitting here gives the BA
    # a far better starting pose for the same wall-clock (one 9x9 eigh).
    for _ in range(2):
        Fr = T2.T @ _compute_f(p1n, p2n, inl_f.astype(uv1.dtype)) @ T1
        Fr = Fr / jnp.maximum(jnp.abs(Fr[2, 2]), 1e-9)
        sfr, inl_fr = _score_f(Fr, uv1, uv2, valid)
        better_f = sfr > score_f
        F = jnp.where(better_f, Fr, F)
        score_f = jnp.where(better_f, sfr, score_f)
        inl_f = jnp.where(better_f, inl_fr, inl_f)

        Hr = jnp.linalg.inv(T2) @ _compute_h(p1n, p2n,
                                             inl_h.astype(uv1.dtype)) @ T1
        Hr = Hr / jnp.where(jnp.abs(Hr[2, 2]) < 1e-9, 1e-9, Hr[2, 2])
        shr, inl_hr = _score_h(Hr, uv1, uv2, valid)
        better_h = shr > score_h
        Hm = jnp.where(better_h, Hr, Hm)
        score_h = jnp.where(better_h, shr, score_h)
        inl_h = jnp.where(better_h, inl_hr, inl_h)

    return dict(F=F, H=Hm, score_f=score_f, score_h=score_h,
                inliers_f=inl_f, inliers_h=inl_h)


@jax.jit
def check_rt_batch(Rs, ts, uv1, uv2, inlier, K, sigma2=1.0):
    """Score candidate (R, t) relative poses by cheirality (CheckRT parity).

    For each candidate: triangulate all inlier matches in view1 frame
    (identity) vs (R, t); count points with positive depth in both views,
    parallax cos < 0.99998, and reprojection chi2 < 4*sigma2 in both.
    Returns (n_good (C,), parallax_deg (C,), xw (C, N, 3), good (C, N)).
    """
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    xn1 = jnp.stack([(uv1[:, 0] - cx) / fx, (uv1[:, 1] - cy) / fy], -1)
    xn2 = jnp.stack([(uv2[:, 0] - cx) / fx, (uv2[:, 1] - cy) / fy], -1)
    I = jnp.eye(3, dtype=uv1.dtype)
    z3 = jnp.zeros(3, uv1.dtype)
    th2 = 4.0 * sigma2

    def one(R, t):
        xw = geometry.triangulate_linear(I, z3, R, t, xn1, xn2)
        finite = jnp.all(jnp.isfinite(xw), -1)
        z1 = xw[:, 2]
        xc2 = xw @ R.T + t
        z2 = xc2[:, 2]
        c1 = z3                                      # center 1 at origin
        c2 = geometry.camera_center(R, t)
        pcos = geometry.parallax_cos(c1, c2, xw)
        # reprojection errors (pixels)
        u1 = fx * xw[:, 0] / jnp.where(z1 == 0, 1e-9, z1) + cx
        v1 = fy * xw[:, 1] / jnp.where(z1 == 0, 1e-9, z1) + cy
        e1 = (u1 - uv1[:, 0]) ** 2 + (v1 - uv1[:, 1]) ** 2
        u2 = fx * xc2[:, 0] / jnp.where(z2 == 0, 1e-9, z2) + cx
        v2 = fy * xc2[:, 1] / jnp.where(z2 == 0, 1e-9, z2) + cy
        e2 = (u2 - uv2[:, 0]) ** 2 + (v2 - uv2[:, 1]) ** 2
        good = (finite & inlier & (pcos < 0.99998)
                & (z1 > 0) & (z2 > 0) & (e1 < th2) & (e2 < th2))
        n_good = jnp.sum(good.astype(jnp.int32))
        # parallax statistic: ~50th best (reference takes min(50, n)-th)
        pang = jnp.degrees(jnp.arccos(jnp.clip(pcos, -1.0, 1.0)))
        pang = jnp.where(good, pang, 0.0)
        k = jnp.minimum(50, jnp.maximum(n_good, 1))
        topk = jax.lax.top_k(pang, 50)[0]
        parallax = topk[jnp.minimum(k - 1, 49)]
        return n_good, parallax, xw, good

    return jax.vmap(one)(Rs, ts)


def _faugeras_hypotheses(A):
    """Faugeras SVD decomposition of a calibrated homography A = K^-1 H K
    into 8 (R, t, n) motion hypotheses (ReconstructH parity). NumPy host
    code — runs once per initialization attempt on a single 3x3.
    """
    U, w, Vt = np.linalg.svd(A.astype(np.float64))
    V = Vt.T
    s = np.linalg.det(U) * np.linalg.det(Vt)
    d1, d2, d3 = w
    if d1 / d2 < 1.00001 or d2 / d3 < 1.00001:
        return []  # degenerate (pure rotation-ish); reference returns false
    hyps = []
    aux1 = np.sqrt((d1 * d1 - d2 * d2) / (d1 * d1 - d3 * d3))
    aux3 = np.sqrt((d2 * d2 - d3 * d3) / (d1 * d1 - d3 * d3))
    x1s = [aux1, aux1, -aux1, -aux1]
    x3s = [aux3, -aux3, aux3, -aux3]
    # case d' > 0
    sin_t = np.sqrt((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3)) / ((d1 + d3) * d2)
    cos_t = (d2 * d2 + d1 * d3) / ((d1 + d3) * d2)
    for x1, x3 in zip(x1s, x3s):
        st = sin_t * (1 if x1 * x3 >= 0 else -1) * np.sign(x1 * x3 if x1 * x3 != 0 else 1)
        Rp = np.array([[cos_t, 0, -st], [0, 1, 0], [st, 0, cos_t]])
        # sign fix: epsilon terms
        eps1 = 1.0 if x1 >= 0 else -1.0
        eps3 = 1.0 if x3 >= 0 else -1.0
        st_signed = eps1 * eps3 * sin_t
        Rp = np.array([[cos_t, 0, -st_signed], [0, 1, 0],
                       [st_signed, 0, cos_t]])
        tp = np.array([x1, 0, -x3]) * (d1 - d3)
        np_ = np.array([x1, 0, x3])
        R = s * U @ Rp @ Vt
        t = U @ tp
        n = V @ np_
        if n[2] < 0:
            n = -n
        hyps.append((R, t / (np.linalg.norm(t) + 1e-12), n))
    # case d' < 0
    sin_p = np.sqrt((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3)) / ((d1 - d3) * d2)
    cos_p = (d1 * d3 - d2 * d2) / ((d1 - d3) * d2)
    for x1, x3 in zip(x1s, x3s):
        eps1 = 1.0 if x1 >= 0 else -1.0
        eps3 = 1.0 if x3 >= 0 else -1.0
        sp = eps1 * eps3 * sin_p
        Rp = np.array([[cos_p, 0, sp], [0, -1, 0], [sp, 0, -cos_p]])
        tp = np.array([x1, 0, x3]) * (d1 + d3)
        np_ = np.array([x1, 0, x3])
        R = s * U @ Rp @ Vt
        t = U @ tp
        n = V @ np_
        if n[2] < 0:
            n = -n
        hyps.append((R, t / (np.linalg.norm(t) + 1e-12), n))
    return hyps


def initialize_two_view(uv1, uv2, valid, K, key, n_hyp=256, sigma=1.0):
    """Full monocular initialization (Initializer::Initialize parity).

    Args:
      uv1, uv2: (N, 2) matched undistorted pixel coords (row i of uv1
        matches row i of uv2); valid: (N,) bool mask of real matches.
      K: 3x3 intrinsics (numpy or jax). key: jax PRNG key.
    Returns:
      None on failure, else dict(R21, t21, xw (N,3), good (N,) bool) —
      pose of view 2 w.r.t. view 1 (world = view 1 frame), triangulated
      points for good matches, unit-norm translation.
    """
    uv1 = jnp.asarray(uv1, jnp.float32)
    uv2 = jnp.asarray(uv2, jnp.float32)
    valid = jnp.asarray(valid)
    K = jnp.asarray(K, jnp.float32)
    out = ransac_fh(uv1, uv2, valid, key, n_hyp=n_hyp)
    sf = float(out["score_f"])
    sh = float(out["score_h"])
    if sf <= 0 and sh <= 0:
        return None
    rh = sh / max(sh + sf, 1e-9)

    if rh > 0.40:
        A = np.linalg.inv(np.asarray(K)) @ np.asarray(out["H"]) @ np.asarray(K)
        hyps = _faugeras_hypotheses(A)
        if not hyps:
            return None
        Rs = jnp.asarray(np.stack([h[0] for h in hyps]), jnp.float32)
        ts = jnp.asarray(np.stack([h[1] for h in hyps]), jnp.float32)
        inl = out["inliers_h"]
    else:
        E = K.T @ out["F"] @ K
        R1, R2, t = geometry.decompose_essential(E)
        Rs = jnp.stack([R1, R1, R2, R2])
        ts = jnp.stack([t, -t, t, -t])
        inl = out["inliers_f"]

    out_b = check_rt_batch(Rs, ts, uv1, uv2, inl, K, sigma2=sigma * sigma)
    # ONE batched readback (per-array np.asarray paid a ~14 ms transfer
    # floor each on the live transport)
    import jax as _jax
    n_good, parallax, xws, goods, Rs, ts, n_inl = _jax.device_get(
        out_b + (Rs, ts, jnp.sum(inl.astype(jnp.int32))))
    best = int(np.argmax(n_good))
    max_good = int(n_good[best])
    n_inl = int(n_inl)
    n_similar = int((n_good > 0.7 * max_good).sum())
    # reference gates: enough points, unambiguous winner, enough parallax
    if (max_good < MIN_TRIANGULATED or max_good < 0.5 * n_inl  # noqa: W504
            or n_similar > 1 or parallax[best] < MIN_PARALLAX_DEG):
        return None
    return dict(R21=np.asarray(Rs[best]), t21=np.asarray(ts[best]),
                xw=np.asarray(xws[best]), good=np.asarray(goods[best]),
                used_model="H" if rh > 0.40 else "F", rh=rh)
