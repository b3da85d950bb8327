"""Lie groups SO(3) / SE(3) / Sim(3) for TPU.

TPU-native replacement for the reference's g2o manifold types
(reference: Thirdparty/g2o/g2o/types/se3quat.h, sim3.h — SURVEY.md §2.2).
Everything is pure-functional float32 JAX, safe for `jax.vmap`/`jax.jit`,
with small-angle Taylor branches expressed as `jnp.where` (no data-dependent
control flow, so XLA compiles a single fused program).

Conventions
-----------
* Rotations are 3x3 matrices ``R``; rigid transforms are ``(R, t)`` pairs
  mapping points as ``x' = R @ x + t``  (same as the reference's Tcw).
* Tangent vectors: SO3 ``omega`` (3,), SE3 ``xi = (rho, omega)`` (6,) with
  translation part FIRST (g2o order is [omega, upsilon]; we pick
  [rho, omega] and keep it consistent everywhere), Sim3 ``(rho, omega,
  sigma)`` (7,) with log-scale last.
* Quaternions are ``(x, y, z, w)`` to match TUM trajectory format.
"""
from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-6


def hat(w):
    """so(3) hat operator: (..., 3) -> (..., 3, 3) skew matrix."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack([
        jnp.stack([z, -wz, wy], -1),
        jnp.stack([wz, z, -wx], -1),
        jnp.stack([-wy, wx, z], -1),
    ], -2)


def vee(W):
    """Inverse of hat: (..., 3, 3) -> (..., 3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], -1)


def _sinc(theta):
    """sin(theta)/theta with Taylor fallback."""
    small = jnp.abs(theta) < _EPS
    th = jnp.where(small, 1.0, theta)
    return jnp.where(small, 1.0 - theta * theta / 6.0, jnp.sin(th) / th)


def so3_exp(omega):
    """Rodrigues: (..., 3) -> (..., 3, 3).

    theta is only sqrt-ed on the guarded branch (sqrt(0) has an infinite
    derivative; unguarded it NaN-poisons every jacfwd/jacrev through this
    function — the GN solvers differentiate through here).
    """
    theta2 = jnp.sum(omega * omega, -1)
    small = theta2 < _EPS * _EPS
    t2 = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(t2)
    W = hat(omega)
    W2 = W @ W
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / t2)
    I = jnp.broadcast_to(jnp.eye(3, dtype=omega.dtype), W.shape)
    return I + a[..., None, None] * W + b[..., None, None] * W2


def so3_log(R):
    """Rotation matrix -> axis-angle vector via the quaternion.

    The classic trace/arccos formula is catastrophically imprecise in f32
    near theta = pi (arccos near -1) — observed live on TPU. Shepperd's
    quaternion extraction (rot_to_quat) is stable for every angle, and
    theta = 2*atan2(|xyz|, w) is well-conditioned everywhere.
    """
    q = rot_to_quat(R)
    xyz, w = q[..., :3], q[..., 3]
    # shortest arc: force w >= 0
    sgn = jnp.where(w < 0, -1.0, 1.0)
    xyz = xyz * sgn[..., None]
    w = w * sgn
    n = jnp.linalg.norm(xyz, axis=-1)
    theta = 2.0 * jnp.arctan2(n, w)
    small = n < _EPS
    factor = jnp.where(small, 2.0 / jnp.maximum(w, _EPS),
                       theta / jnp.where(small, 1.0, n))
    return xyz * factor[..., None]


def _V_coeffs(theta2):
    """Coefficients (b, c) of V = I + b*W + c*W^2 for SE3 exp."""
    small = theta2 < _EPS * _EPS
    t2 = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(t2)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / t2)
    c = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0,
                  (theta - jnp.sin(theta)) / (t2 * theta))
    return b, c


def se3_exp(xi):
    """SE3 exponential. xi = (rho, omega) (..., 6) -> (R, t)."""
    rho, omega = xi[..., :3], xi[..., 3:]
    R = so3_exp(omega)
    W = hat(omega)
    W2 = W @ W
    b, c = _V_coeffs(jnp.sum(omega * omega, -1))
    I = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)
    V = I + b[..., None, None] * W + c[..., None, None] * W2
    t = (V @ rho[..., None])[..., 0]
    return R, t


def se3_log(R, t):
    """Inverse of se3_exp: (R, t) -> xi (..., 6)."""
    omega = so3_log(R)
    theta2 = jnp.sum(omega * omega, -1)
    W = hat(omega)
    W2 = W @ W
    # V^-1 = I - W/2 + k * W^2,  k = (1 - theta*cos(th/2)/(2 sin(th/2))) / th^2
    small = theta2 < _EPS * _EPS
    t2 = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(t2)
    half = theta * 0.5
    cot = half * jnp.cos(half) / jnp.where(jnp.abs(jnp.sin(half)) < _EPS, 1.0,
                                           jnp.sin(half))
    k = jnp.where(small, 1.0 / 12.0 + theta2 / 720.0, (1.0 - cot) / t2)
    I = jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), W.shape)
    Vinv = I - 0.5 * W + k[..., None, None] * W2
    rho = (Vinv @ t[..., None])[..., 0]
    return jnp.concatenate([rho, omega], -1)


def se3_inv(R, t):
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -(Rt @ t[..., None])[..., 0]


def se3_mul(Ra, ta, Rb, tb):
    """(Ra, ta) ∘ (Rb, tb): first apply b, then a."""
    return Ra @ Rb, (Ra @ tb[..., None])[..., 0] + ta


def se3_apply(R, t, x):
    """Apply transform to points x (..., 3)."""
    return (R @ x[..., None])[..., 0] + t


def se3_matrix(R, t):
    """(R, t) -> 4x4 homogeneous matrix."""
    bottom = jnp.zeros(R.shape[:-2] + (1, 4), R.dtype).at[..., 0, 3].set(1.0)
    top = jnp.concatenate([R, t[..., None]], -1)
    return jnp.concatenate([top, bottom], -2)


# ---------------------------------------------------------------------------
# Sim(3)  — similarity transforms x' = s * R @ x + t
# (reference parity: g2o Sim3 used by LoopClosing / OptimizeEssentialGraph)
# ---------------------------------------------------------------------------

def _sim3_W(omega, sigma, n_terms=24):
    """W(omega, sigma) = int_0^1 e^{sigma u} exp(u hat(omega)) du.

    Since sigma*I commutes with hat(omega), this is exactly the phi_1
    matrix function phi1(M) = sum_n M^n/(n+1)! of M = sigma*I + hat(omega),
    evaluated as a truncated Horner series: branch-free, smooth (safe under
    jacfwd/jacrev — the closed-form A/B/C coefficients catastrophically
    cancel in f32 near theta=0 / sigma=0 and NaN the GN solvers), and
    accurate to f32 eps for |theta| <= pi with 24 terms.
    """
    M = hat(omega) + sigma[..., None, None] * jnp.broadcast_to(
        jnp.eye(3, dtype=omega.dtype), omega.shape[:-1] + (3, 3))
    I = jnp.broadcast_to(jnp.eye(3, dtype=omega.dtype), M.shape)
    import math
    P = I * (1.0 / math.factorial(n_terms + 1))
    for n in range(n_terms - 1, -1, -1):
        P = I * (1.0 / math.factorial(n + 1)) + M @ P
    return P


def sim3_exp(v):
    """Sim3 exponential. v = (rho, omega, sigma) (..., 7) -> (R, t, s).

    t = W(omega, sigma) @ rho (Strasdat's thesis / Sophus sim3), with W
    evaluated as the phi_1 series of sigma*I + hat(omega) — see _sim3_W.
    """
    rho, omega, sigma = v[..., :3], v[..., 3:6], v[..., 6]
    s = jnp.exp(sigma)
    R = so3_exp(omega)
    Wm = _sim3_W(omega, sigma)
    t = (Wm @ rho[..., None])[..., 0]
    return R, t, s


def sim3_log(R, t, s):
    """Inverse of sim3_exp via 3x3 solve of W rho = t (robust, no coeff
    inverse). W is the phi_1 series (_sim3_W), which is well-conditioned
    (eigenvalues (e^z - 1)/z of z = sigma +/- i*theta, bounded away from 0
    for |theta| < pi)."""
    omega = so3_log(R)
    sigma = jnp.log(s)
    W = _sim3_W(omega, sigma)
    rho = jnp.linalg.solve(W, t[..., None])[..., 0]
    return jnp.concatenate([rho, omega, sigma[..., None]], -1)


def sim3_inv(R, t, s):
    Rt = jnp.swapaxes(R, -1, -2)
    s_inv = 1.0 / s
    return Rt, -s_inv[..., None] * (Rt @ t[..., None])[..., 0], s_inv


def sim3_mul(Ra, ta, sa, Rb, tb, sb):
    """Compose: apply b then a. (sR t) form: x -> sa*Ra*(sb*Rb x + tb) + ta."""
    return Ra @ Rb, sa[..., None] * (Ra @ tb[..., None])[..., 0] + ta, sa * sb


def sim3_apply(R, t, s, x):
    return s[..., None] * (R @ x[..., None])[..., 0] + t


# ---------------------------------------------------------------------------
# Quaternions (x, y, z, w) — for trajectory IO (TUM format parity,
# reference: src/System.cc SaveKeyFrameTrajectoryTUM)
# ---------------------------------------------------------------------------

def rot_to_quat(R):
    """Rotation matrix -> unit quaternion (x, y, z, w), Shepperd's method."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    # four candidate constructions; pick numerically best by largest pivot
    qw = jnp.stack([1.0 + tr, 1.0 + m00 - m11 - m22,
                    1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22], -1)
    qw = jnp.sqrt(jnp.maximum(qw, 1e-12)) * 0.5
    w0, x1, y2, z3 = qw[..., 0], qw[..., 1], qw[..., 2], qw[..., 3]
    cand = jnp.stack([
        jnp.stack([(m21 - m12) / (4 * w0), (m02 - m20) / (4 * w0),
                   (m10 - m01) / (4 * w0), w0], -1),
        jnp.stack([x1, (m01 + m10) / (4 * x1), (m02 + m20) / (4 * x1),
                   (m21 - m12) / (4 * x1)], -1),
        jnp.stack([(m01 + m10) / (4 * y2), y2, (m12 + m21) / (4 * y2),
                   (m02 - m20) / (4 * y2)], -1),
        jnp.stack([(m02 + m20) / (4 * z3), (m12 + m21) / (4 * z3), z3,
                   (m10 - m01) / (4 * z3)], -1),
    ], -2)
    best = jnp.argmax(qw, -1)
    q = jnp.take_along_axis(cand, best[..., None, None].repeat(4, -1), -2)[..., 0, :]
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_to_rot(q):
    """Unit quaternion (x, y, z, w) -> rotation matrix."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    n = x * x + y * y + z * z + w * w
    sf = 2.0 / jnp.where(n < 1e-12, 1.0, n)
    xx, yy, zz = x * x * sf, y * y * sf, z * z * sf
    xy, xz, yz = x * y * sf, x * z * sf, y * z * sf
    wx, wy, wz = w * x * sf, w * y * sf, w * z * sf
    return jnp.stack([
        jnp.stack([1.0 - yy - zz, xy - wz, xz + wy], -1),
        jnp.stack([xy + wz, 1.0 - xx - zz, yz - wx], -1),
        jnp.stack([xz - wy, yz + wx, 1.0 - xx - yy], -1),
    ], -2)


def project_so3(R):
    """Nearest rotation matrix (Frobenius) via SVD — numpy, host-side.

    Per-frame pose chaining in float32 (velocity composition + repeated
    exp-retraction in pose optimization) accumulates orthonormality error
    GEOMETRICALLY (~x2/frame observed); projecting at the pose-write
    boundaries (Frame.set_pose, BA write-back) keeps R^T a valid inverse.
    Works on (..., 3, 3) batches.
    """
    import numpy as np
    R = np.asarray(R, np.float64)
    # A single NaN/Inf slot (diverged BA camera) must not raise LinAlgError
    # for the whole batch: substitute identity for the SVD, then restore
    # NaN so downstream isfinite write-back guards still skip those slots.
    finite = np.isfinite(R).all(axis=(-1, -2))
    R_safe = np.where(finite[..., None, None], np.nan_to_num(R), np.eye(3))
    U, _, Vt = np.linalg.svd(R_safe)
    det = np.linalg.det(U @ Vt)
    D = np.ones(R.shape[:-2] + (3,))
    D[..., 2] = np.sign(det)
    out = (U * D[..., None, :]) @ Vt
    out = np.where(finite[..., None, None], out, np.nan)
    return out.astype(np.float32)
