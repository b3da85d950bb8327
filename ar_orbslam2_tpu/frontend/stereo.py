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


def stereo_frame_features(slam, left_u8, right_u8, max_disparity=None):
    """Extract ORB on both images and stereo-match.

    Returns (features dict for the LEFT image, uvr (P,), depth (P,)).
    """
    fl = slam._extract(left_u8)
    fr = slam._extract(right_u8)
    cam = slam.cam
    if max_disparity is None:
        max_disparity = max(cam.bf / max(cam.fx * 0.02, 1e-6), 64.0)
    uvr, _ = match_stereo(
        jnp.asarray(fl["uv"]), H.to_signs(fl["desc_bits"]),
        jnp.asarray(fl["octave"]), jnp.asarray(fl["valid"]),
        jnp.asarray(fr["uv"]), H.to_signs(fr["desc_bits"]),
        jnp.asarray(fr["octave"]), jnp.asarray(fr["valid"]),
        float(max_disparity))
    uvr = np.asarray(uvr)
    disp = fl["uv"][:, 0] - uvr
    good = (uvr > 0) & (disp > 0.1)
    depth = np.where(good, cam.bf / np.maximum(disp, 0.1), -1.0)
    feats = dict(uv=fl["uv"], desc=fl["desc_bits"], octave=fl["octave"],
                 valid=fl["valid"], angle=fl["angle"])
    return feats, np.where(good, uvr, -1.0).astype(np.float32), \
        depth.astype(np.float32)
