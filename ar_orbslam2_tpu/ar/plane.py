"""Dominant-plane detection from tracked landmarks — batched RANSAC.

TPU-native redesign of ViewerAR::DetectPlane + struct Plane
(Examples/ROS/ORB_SLAM2/src/AR/ViewerAR.cc:≈450, SURVEY.md §2.3): the
reference's 50-iteration loop over 3-point plane fits becomes one vmapped
hypothesis batch; selection by the 20th-percentile point-plane distance and
the final inlier cut at 1.4x that value mirror the reference's vote logic.
The Plane carries T_pw (plane -> world) so virtual objects sit on it
(glTpw parity).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("n_hyp",))
def plane_ransac(points, valid, key, n_hyp=64, inlier_factor=1.4):
    """RANSAC 3-point plane fit over tracked map points.

    Returns dict(normal (3,), d (offset), inlier (N,) bool, score).
    Plane: n·x + d = 0, |n| = 1.
    """
    N = points.shape[0]
    p = valid.astype(jnp.float32)
    p = p / jnp.maximum(p.sum(), 1.0)
    samples = jax.random.choice(key, N, (n_hyp, 3), replace=True, p=p)

    def fit(s_idx):
        a, b, c = points[s_idx[0]], points[s_idx[1]], points[s_idx[2]]
        n = jnp.cross(b - a, c - a)
        norm = jnp.linalg.norm(n)
        n = n / jnp.maximum(norm, 1e-12)
        return n, -jnp.dot(n, a), norm > 1e-9

    ns, ds, ok = jax.vmap(fit)(samples)
    dist = jnp.abs(points @ ns.T + ds[None, :])          # (N, H)
    big = jnp.float32(1e9)
    dist = jnp.where(valid[:, None] & ok[None, :], dist, big)
    n_valid = jnp.maximum(jnp.sum(valid), 1)
    # 20th-percentile distance per hypothesis (reference's vote metric)
    k = jnp.maximum((0.2 * n_valid).astype(jnp.int32), 3)
    sorted_d = jnp.sort(dist, axis=0)
    score = sorted_d[k, jnp.arange(dist.shape[1])]
    best = jnp.argmin(score)
    # floor keeps the threshold positive for exactly-coplanar (noise-free)
    # points, where the best 20th-percentile distance is 0
    th = inlier_factor * score[best] + 1e-4
    inlier = (dist[:, best] < th) & valid
    return dict(normal=ns[best], d=ds[best], inlier=inlier,
                score=score[best], th=th)


@dataclass
class Plane:
    """World-frame plane + anchor pose (parity: struct Plane / glTpw)."""
    normal: np.ndarray          # (3,) unit, world frame
    origin: np.ndarray          # (3,) a point on the plane (inlier centroid)
    T_pw: np.ndarray            # (4,4) plane -> world

    @staticmethod
    def from_fit(normal, d, points, inlier, cam_center=None):
        normal = np.asarray(normal, np.float64)
        inl = np.asarray(inlier)
        pts = np.asarray(points)[inl]
        origin = pts.mean(0) if len(pts) else -d * normal
        # orient the normal toward the camera (reference flips by view dir)
        if cam_center is not None and \
                np.dot(normal, np.asarray(cam_center) - origin) < 0:
            normal = -normal
        # build T_pw: plane y-axis = normal (objects stand "up")
        up = normal / max(np.linalg.norm(normal), 1e-12)
        ref = np.array([1.0, 0.0, 0.0])
        if abs(np.dot(ref, up)) > 0.9:
            ref = np.array([0.0, 0.0, 1.0])
        x = np.cross(ref, up)
        x /= max(np.linalg.norm(x), 1e-12)
        z = np.cross(x, up)
        T = np.eye(4)
        T[:3, 0], T[:3, 1], T[:3, 2], T[:3, 3] = x, up, z, origin
        return Plane(normal=up, origin=origin, T_pw=T)


def detect_plane(points, valid, cam_center=None, seed=0, n_hyp=64,
                 min_inliers=20):
    """Host wrapper: fit + refine. Returns Plane or None.

    Parity: ViewerAR::DetectPlane(Tcw, vMPs, 50 iters).
    """
    out = plane_ransac(jnp.asarray(points, jnp.float32),
                       jnp.asarray(valid), jax.random.PRNGKey(seed),
                       n_hyp=n_hyp)
    inlier = np.asarray(out["inlier"])
    if int(inlier.sum()) < min_inliers:
        return None
    # least-squares refine over inliers (SVD of centered points)
    pts = np.asarray(points)[inlier].astype(np.float64)
    c = pts.mean(0)
    _, _, Vt = np.linalg.svd(pts - c, full_matrices=False)
    n = Vt[-1]
    return Plane.from_fit(n, -np.dot(n, c), points, inlier, cam_center)
