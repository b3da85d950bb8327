"""New-landmark creation kernels: epipolar search + gated triangulation.

TPU-native redesign of LocalMapping::CreateNewMapPoints
(src/LocalMapping.cc:≈220) and ORBmatcher::SearchForTriangulation
(src/ORBmatcher.cc — the epipolar-constrained KF-KF search): instead of a
per-feature loop over shared vocabulary nodes, we form the full keypoint x
keypoint Hamming matrix on the MXU and mask it with the epipolar band,
then run every triangulation gate (parallax / depth / reprojection /
scale-consistency — same thresholds as the reference) as a batched, masked
computation. One call handles one KF pair; the host vmaps/loops over the
covisible neighbor set.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core import camera as cam_mod
from ..core import geometry
from ..ops import hamming as H

INVALID = H.DESC_BITS + 1
CHI2_2DOF = 5.991
CHI2_1DOF = 3.84


@partial(jax.jit, static_argnames=("cam", "scale_factor"))
def epipolar_search(cam, R1, t1, R2, t2,
                    uv1, signs1, oct1, free1,
                    uv2, signs2, oct2, free2,
                    angles1=None, angles2=None,
                    scale_factor=1.2, th=H.TH_LOW):
    """Match unbound features of KF1 against KF2 along epipolar lines.

    Parity: ORBmatcher::SearchForTriangulation — descriptor distance
    < TH_LOW, point-to-epipolar-line distance < 3.84 sigma^2 (octave of
    the KF2 keypoint), epipole-proximity rejection, rotation consistency,
    mutual best. `free*` masks features not yet bound to a landmark.

    Returns (idx (N1,) int32 into KF2 or -1, dist (N1,)).
    """
    # relative pose 1->2 and fundamental matrix
    R12 = R2 @ R1.T                      # camera1 -> camera2 ... (R2 R1^T)
    t12 = t2 - (R12 @ t1[..., None])[..., 0]
    F12 = geometry.fundamental_from_pose(R12, t12, cam.K, cam.K)

    D = H.hamming_matrix(signs1, signs2, free1, free2, invalid_dist=INVALID)
    ep_sq = geometry.epipolar_sq_dist(F12, uv1[:, None, :], uv2[None, :, :])
    sigma2_2 = scale_factor ** (2.0 * oct2.astype(jnp.float32))
    in_band = ep_sq < CHI2_1DOF * sigma2_2[None, :]
    # epipole of camera 1 in image 2: project camera-1 center into KF2
    c1w = geometry.camera_center(R1, t1)
    e2 = cam_mod.project(cam, (R2 @ c1w) + t2)
    d_epi_sq = jnp.sum((uv2 - e2[None, :]) ** 2, -1)
    far_from_epipole = d_epi_sq >= 100.0 * scale_factor ** oct2.astype(
        jnp.float32)
    mask = in_band & far_from_epipole[None, :]
    D = jnp.where(mask, D, INVALID)
    idx, dist = H.best_match(D, th=th, nn_ratio=1.0)
    idx_back, _ = H.best_match(jnp.swapaxes(D, 0, 1), th=th, nn_ratio=1.0)
    idx = H.mutual_filter(idx, idx_back)
    if angles1 is not None and angles2 is not None:
        idx = H.rotation_consistency(angles1, angles2, idx)
    return idx, dist


@partial(jax.jit, static_argnames=("cam", "scale_factor"))
def triangulate_candidates(cam, R1, t1, R2, t2,
                           uv1, oct1, uv2, oct2, idx,
                           scale_factor=1.2,
                           cos_parallax_max=0.9998):
    """Triangulate matched pairs and apply the reference's creation gates.

    Parity: the gate cascade inside LocalMapping::CreateNewMapPoints —
    ray-parallax cos < 0.9998, positive depth in both views, reprojection
    chi2 < 5.991 sigma^2 per view, and scale-consistency
    (distance ratio within 1.5*scaleFactor of the octave scale ratio).

    Args:
      idx: (N1,) match into KF2 per KF1 feature (-1 = none).
    Returns dict(xw (N1,3), good (N1,) bool).
    """
    matched = idx >= 0
    j = jnp.maximum(idx, 0)
    uv2m = uv2[j]
    oct2m = oct2[j]

    Kinv = jnp.linalg.inv(cam.K)
    ones = jnp.ones(uv1.shape[:-1] + (1,), uv1.dtype)
    xn1 = (jnp.concatenate([uv1, ones], -1) @ Kinv.T)[..., :2]
    xn2 = (jnp.concatenate([uv2m, ones], -1) @ Kinv.T)[..., :2]

    # parallax between viewing rays (world frame)
    r1 = jnp.concatenate([xn1, ones], -1) @ R1          # = R1^T xn1
    r2 = jnp.concatenate([xn2, ones], -1) @ R2
    cosp = jnp.sum(r1 * r2, -1) / jnp.maximum(
        jnp.linalg.norm(r1, axis=-1) * jnp.linalg.norm(r2, axis=-1), 1e-9)

    xw = geometry.triangulate_linear(R1, t1, R2, t2, xn1, xn2)
    z1 = geometry.depth_in_view(R1, t1, xw)
    z2 = geometry.depth_in_view(R2, t2, xw)

    uv1_hat = cam_mod.project(cam, (xw @ R1.T) + t1)
    uv2_hat = cam_mod.project(cam, (xw @ R2.T) + t2)
    s2_1 = scale_factor ** (2.0 * oct1.astype(jnp.float32))
    s2_2 = scale_factor ** (2.0 * oct2m.astype(jnp.float32))
    e1 = jnp.sum((uv1_hat - uv1) ** 2, -1)
    e2 = jnp.sum((uv2_hat - uv2m) ** 2, -1)
    reproj_ok = (e1 < CHI2_2DOF * s2_1) & (e2 < CHI2_2DOF * s2_2)

    c1 = geometry.camera_center(R1, t1)
    c2 = geometry.camera_center(R2, t2)
    d1 = jnp.linalg.norm(xw - c1, axis=-1)
    d2 = jnp.linalg.norm(xw - c2, axis=-1)
    ratio_dist = d2 / jnp.maximum(d1, 1e-9)
    ratio_oct = (scale_factor ** oct1.astype(jnp.float32)
                 / scale_factor ** oct2m.astype(jnp.float32))
    rf = 1.5 * scale_factor
    scale_ok = ((ratio_dist * rf >= ratio_oct)
                & (ratio_dist <= ratio_oct * rf))

    good = (matched & (cosp > 0) & (cosp < cos_parallax_max)
            & (z1 > 0) & (z2 > 0) & reproj_ok & scale_ok
            & jnp.all(jnp.isfinite(xw), -1))
    return dict(xw=xw, good=good, cos_parallax=cosp)
