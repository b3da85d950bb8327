"""Stereo feature matching — row-banded Hamming search on the MXU.

TPU-native redesign of Frame::ComputeStereoMatches (src/Frame.cc:≈420,
SURVEY.md §2.1): the reference walks per-row candidate lists with a SAD
subpixel refinement; here the full left x right Hamming matrix is masked by
the epipolar row band (|v_l - v_r| <= 2 * scale(octave)) and the disparity
window (0 < u_l - u_r <= max_disparity), one matmul for the whole frame.
Depth = bf / disparity, right-u coordinate parity with mvuRight/mvDepth.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import hamming as H


@partial(jax.jit, static_argnames=("scale_factor",))
def match_stereo(uv_l, signs_l, oct_l, valid_l,
                 uv_r, signs_r, oct_r, valid_r,
                 max_disparity, scale_factor=1.2, th=H.TH_HIGH):
    """Match left keypoints to right keypoints along epipolar rows.

    Returns (uvr (N,) right-u per left kp or -1, idx (N,) right index).
    """
    D = H.hamming_matrix(signs_l, signs_r, valid_l, valid_r,
                         invalid_dist=H.DESC_BITS + 1)
    dv = jnp.abs(uv_l[:, None, 1] - uv_r[None, :, 1])
    band = 2.0 * scale_factor ** oct_l.astype(jnp.float32)
    disp = uv_l[:, None, 0] - uv_r[None, :, 0]
    in_band = (dv <= band[:, None]) & (disp > 0.1) & (disp <= max_disparity)
    # octave agreement +-1 (the reference gates levels via candidate lists)
    in_oct = jnp.abs(oct_l[:, None] - oct_r[None, :]) <= 1
    D = jnp.where(in_band & in_oct, D, H.DESC_BITS + 1)
    idx, dist = H.best_match(D, th=th, nn_ratio=1.0)
    idx_back, _ = H.best_match(jnp.swapaxes(D, 0, 1), th=th, nn_ratio=1.0)
    idx = H.mutual_filter(idx, idx_back)
    uvr = jnp.where(idx >= 0, uv_r[jnp.maximum(idx, 0), 0], -1.0)
    return uvr, idx


@partial(jax.jit, static_argnames=("window", "search"))
def refine_stereo_subpixel(img_l, img_r, uv_l, uvr, valid,
                           window=5, search=5):
    """SAD subpixel refinement of matched right-u coordinates.

    Parity: the correlation pass of Frame::ComputeStereoMatches
    (src/Frame.cc:≈420) — an 11x11 center-normalized window around the
    left keypoint slides ±5 px over the right image at the matched
    location; the best SAD column is refined with parabola interpolation
    (deltaR = (d- − d+) / (2(d- + d+ − 2 d0))). Deviation: runs on the
    level-0 images for all octaves (the reference uses the keypoint's
    pyramid level); matches whose SAD minimum sits on the search border
    or whose parabola step exceeds 1 px are rejected like the reference.

    Returns refined uvr (N,) with -1 where rejected/invalid.
    """
    W = 2 * window + 1
    S = 2 * search + 1
    h, w = img_l.shape
    il = img_l.astype(jnp.float32)
    ir = img_r.astype(jnp.float32)

    def one(u, v, ur, ok):
        ui = jnp.clip(jnp.round(u).astype(jnp.int32), window, w - window - 1)
        vi = jnp.clip(jnp.round(v).astype(jnp.int32), window, h - window - 1)
        uri = jnp.clip(jnp.round(ur).astype(jnp.int32),
                       window + search, w - window - search - 1)
        patch = jax.lax.dynamic_slice(il, (vi - window, ui - window),
                                      (W, W))
        patch = patch - patch[window, window]
        strip = jax.lax.dynamic_slice(
            ir, (vi - window, uri - window - search), (W, W + 2 * search))
        sads = jnp.stack([
            jnp.sum(jnp.abs(patch - (strip[:, s:s + W]
                                     - strip[window, s + window])))
            for s in range(S)])
        best = jnp.argmin(sads)
        interior = (best > 0) & (best < S - 1)
        bc = jnp.clip(best, 1, S - 2)
        d_m, d_0, d_p = sads[bc - 1], sads[bc], sads[bc + 1]
        denom = d_m + d_p - 2.0 * d_0
        delta = (d_m - d_p) / jnp.maximum(2.0 * denom, 1e-6)
        good = ok & interior & (jnp.abs(delta) <= 1.0) & (denom > 0)
        ur_new = (uri + (bc - search)).astype(jnp.float32) + delta
        return jnp.where(good, ur_new, jnp.where(ok, ur, -1.0))

    return jax.vmap(one)(uv_l[:, 0], uv_l[:, 1], uvr, valid & (uvr > 0))


def stereo_frame_features(slam, left_u8, right_u8, max_disparity=None,
                          subpixel=True):
    """Extract ORB on both images and stereo-match (+ SAD subpixel).

    Returns (features dict for the LEFT image, uvr (P,), depth (P,)).
    """
    fl = slam._extract(left_u8)
    fr = slam._extract(right_u8)
    cam = slam.cam
    if max_disparity is None:
        max_disparity = max(cam.bf / max(cam.fx * 0.02, 1e-6), 64.0)
    uvr_dev, _ = match_stereo(
        jnp.asarray(fl["uv"]), H.to_signs(fl["desc_bits"]),
        jnp.asarray(fl["octave"]), jnp.asarray(fl["valid"]),
        jnp.asarray(fr["uv"]), H.to_signs(fr["desc_bits"]),
        jnp.asarray(fr["octave"]), jnp.asarray(fr["valid"]),
        float(max_disparity))
    if subpixel:
        uvr_dev = refine_stereo_subpixel(
            jnp.asarray(left_u8), jnp.asarray(right_u8),
            jnp.asarray(fl["uv"]), uvr_dev, jnp.asarray(fl["valid"]))
    uvr = np.asarray(uvr_dev)
    disp = fl["uv"][:, 0] - uvr
    good = (uvr > 0) & (disp > 0.1)
    depth = np.where(good, cam.bf / np.maximum(disp, 0.1), -1.0)
    feats = dict(uv=fl["uv"], desc=fl["desc_bits"], octave=fl["octave"],
                 valid=fl["valid"], angle=fl["angle"])
    return feats, np.where(good, uvr, -1.0).astype(np.float32), \
        depth.astype(np.float32)
