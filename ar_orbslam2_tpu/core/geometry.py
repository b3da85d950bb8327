"""Multi-view geometry primitives: triangulation, epipolar tests, parallax.

TPU-native equivalents of the reference's scattered geometry code
(Initializer::Triangulate src/Initializer.cc:≈390, epipolar check in
ORBmatcher::CheckDistEpipolarLine, LocalMapping::CreateNewMapPoints
triangulation gates src/LocalMapping.cc:≈220). All functions are
batch-first: correspondences come in as (N, 2)/(N, 3) arrays and the
whole batch is processed with fused linear algebra (no per-point loops).
"""
from __future__ import annotations

import jax.numpy as jnp


def _smallest_eigvec(AtA):
    """Eigenvector of the smallest eigenvalue of a symmetric matrix.

    eigh is ascending, so column 0. Batched-friendly; preferred over SVD on
    TPU (symmetric eigendecomposition lowers better than general SVD).
    """
    _, V = jnp.linalg.eigh(AtA)
    return V[..., :, 0]


def triangulate_linear(R1, t1, R2, t2, xn1, xn2):
    """DLT triangulation of N correspondences in normalized coords.

    Args:
      R1, t1 / R2, t2: world->camera transforms for the two views.
      xn1, xn2: (N, 2) normalized image coords (undistorted, K removed).
    Returns:
      xw: (N, 3) world points.
    Parity: Initializer::Triangulate (SVD of the 4x4 DLT system); here the
    smallest eigenvector of A^T A, batched over N.
    """
    P1 = jnp.concatenate([R1, t1[:, None]], axis=1)        # (3,4)
    P2 = jnp.concatenate([R2, t2[:, None]], axis=1)
    rows = []
    for P, xn in ((P1, xn1), (P2, xn2)):
        rows.append(xn[..., 0:1] * P[2] - P[0])            # (N,4)
        rows.append(xn[..., 1:2] * P[2] - P[1])
    A = jnp.stack(rows, -2)                                # (N,4,4)
    # Inhomogeneous solve: X = (x,y,z,1); A[:, :3] x = -A[:, 3]. Better f32
    # conditioning than the homogeneous eigenvector (no squared scale dof);
    # points at infinity are gated out downstream anyway (depth checks).
    M = A[..., :3]
    b = -A[..., 3]
    MtM = jnp.swapaxes(M, -1, -2) @ M
    Mtb = (jnp.swapaxes(M, -1, -2) @ b[..., None])[..., 0]
    # Tikhonov keeps degenerate (zero-parallax) systems finite — scaled by
    # the matrix trace so it works at any coordinate magnitude; such points
    # fail the parallax/depth gates later. (1e-9 absolute was observed to
    # still produce NaNs on TPU f32; trace-relative does not.)
    tr = (MtM[..., 0, 0] + MtM[..., 1, 1] + MtM[..., 2, 2])[..., None, None]
    MtM = MtM + (1e-7 * tr + 1e-10) * jnp.eye(3, dtype=A.dtype)
    return jnp.linalg.solve(MtM, Mtb[..., None])[..., 0]


def depth_in_view(R, t, xw):
    """z-coordinate of world points in a camera frame."""
    return (R @ xw[..., None])[..., 0][..., 2] + t[2]


def parallax_cos(c1, c2, xw):
    """Cosine of the ray angle between camera centers c1, c2 and points xw."""
    r1 = xw - c1
    r2 = xw - c2
    n1 = jnp.linalg.norm(r1, axis=-1)
    n2 = jnp.linalg.norm(r2, axis=-1)
    return jnp.sum(r1 * r2, -1) / jnp.maximum(n1 * n2, 1e-12)


def camera_center(R, t):
    """World-frame optical center of a world->camera transform."""
    return -(jnp.swapaxes(R, -1, -2) @ t[..., None])[..., 0]


def essential_from_pose(R, t):
    """E = [t]x R for relative pose (view1 -> view2)."""
    tx, ty, tz = t[..., 0], t[..., 1], t[..., 2]
    z = jnp.zeros_like(tx)
    Tx = jnp.stack([jnp.stack([z, -tz, ty], -1),
                    jnp.stack([tz, z, -tx], -1),
                    jnp.stack([-ty, tx, z], -1)], -2)
    return Tx @ R


def fundamental_from_pose(R12, t12, K1, K2):
    """F between two views given relative pose and intrinsics.
    Parity: ORBmatcher / LocalMapping ComputeF12."""
    E = essential_from_pose(R12, t12)
    return jnp.linalg.inv(K2).T @ E @ jnp.linalg.inv(K1)


def epipolar_sq_dist(F12, uv1, uv2):
    """Squared distance of uv2 to the epipolar line of uv1 (pixels^2).

    Parity: ORBmatcher::CheckDistEpipolarLine (src/ORBmatcher.cc) which
    gates at 3.84 * sigma^2 per pyramid level.
    """
    ones1 = jnp.ones(uv1.shape[:-1] + (1,), uv1.dtype)
    ones2 = jnp.ones(uv2.shape[:-1] + (1,), uv2.dtype)
    x1 = jnp.concatenate([uv1, ones1], -1)
    l = x1 @ F12.T                                        # line in image 2
    num = jnp.sum(jnp.concatenate([uv2, ones2], -1) * l, -1)
    den = l[..., 0] ** 2 + l[..., 1] ** 2
    return num * num / jnp.maximum(den, 1e-12)


def decompose_essential(E):
    """E -> (R1, R2, t) candidate decomposition (4 hypotheses: (R1,±t),(R2,±t)).
    Parity: Initializer::DecomposeE."""
    U, _, Vt = jnp.linalg.svd(E)
    # enforce proper rotations
    d1 = jnp.sign(jnp.linalg.det(U @ Vt))
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    R1 = R1 * jnp.where(jnp.linalg.det(R1) < 0, -1.0, 1.0)
    R2 = R2 * jnp.where(jnp.linalg.det(R2) < 0, -1.0, 1.0)
    t = U[..., :, 2]
    t = t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-12)
    del d1
    return R1, R2, t
