"""ORB frontend vs the OpenCV oracle (SURVEY.md §4: per-kernel unit tests
with cv2/numpy oracles on synthetic data; agreement thresholds, not
bit-exactness — though the descriptor is near-bit-exact by construction).
"""
import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from ar_orbslam2_tpu.core.camera import Camera
from ar_orbslam2_tpu.data.synthetic import render_plane_sequence
from ar_orbslam2_tpu.frontend.orb import (
    OrbConfig, brief_descriptors, extract_orb, fast_score_map,
    features_per_level, gaussian_blur7, ic_angles)
from ar_orbslam2_tpu.ops import hamming as H

CAM = Camera(fx=500, fy=500, cx=320, cy=240, width=640, height=480)


@pytest.fixture(scope="module")
def img():
    imgs, _, _ = render_plane_sequence(CAM, n_frames=1)
    return imgs[0]


@pytest.fixture(scope="module")
def img_pair():
    imgs, R, t = render_plane_sequence(CAM, n_frames=8, motion=0.3)
    return imgs[0], imgs[7]


def test_fast_matches_opencv(img):
    score = np.asarray(fast_score_map(jnp.asarray(img, jnp.float32), 20.0))
    ours = set(zip(*np.nonzero(score > 0)))
    det = cv2.FastFeatureDetector_create(20, nonmaxSuppression=False)
    kps = det.detect(img, None)
    cv = {(int(round(k.pt[1])), int(round(k.pt[0]))) for k in kps
          if 3 <= k.pt[0] < 637 and 3 <= k.pt[1] < 477}
    inter = len(ours & cv)
    # identical decision rule -> sets should agree almost exactly
    assert inter / max(len(cv), 1) > 0.99, (len(ours), len(cv), inter)
    assert inter / max(len(ours), 1) > 0.99


def test_fast_score_is_max_threshold(img):
    s20 = np.asarray(fast_score_map(jnp.asarray(img, jnp.float32), 20.0))
    s7 = np.asarray(fast_score_map(jnp.asarray(img, jnp.float32), 7.0))
    # corner at t=20 iff score(t=7) > 20
    np.testing.assert_array_equal(s20 > 0, s7 > 20)


def test_blur_matches_opencv(img):
    ours = np.asarray(gaussian_blur7(jnp.asarray(img, jnp.float32)))
    cv = cv2.GaussianBlur(img.astype(np.float32), (7, 7), 2,
                          borderType=cv2.BORDER_REFLECT_101)
    assert np.abs(ours - cv).max() < 1e-2


def test_descriptor_bit_parity_with_opencv(img):
    orb = cv2.ORB_create(nfeatures=300, nlevels=1, edgeThreshold=19)
    kps, desc_cv = orb.detectAndCompute(img, None)
    ys = jnp.asarray([int(round(k.pt[1])) for k in kps])
    xs = jnp.asarray([int(round(k.pt[0])) for k in kps])
    angs = jnp.asarray([k.angle for k in kps], jnp.float32)
    blur = gaussian_blur7(jnp.asarray(img, jnp.float32))
    bits = np.asarray(brief_descriptors(blur, ys, xs, angs))
    ham = np.unpackbits(H.pack_bits(bits) ^ np.stack(desc_cv), axis=1).sum(1)
    # same pattern, same blur, same rotation -> only rounding noise
    assert ham.mean() < 10, ham.mean()
    assert np.median(ham) <= 6


def test_ic_angle_parity_with_opencv(img):
    orb = cv2.ORB_create(nfeatures=300, nlevels=1, edgeThreshold=19)
    kps = orb.detect(img, None)
    ys = jnp.asarray([int(round(k.pt[1])) for k in kps])
    xs = jnp.asarray([int(round(k.pt[0])) for k in kps])
    ours = np.asarray(ic_angles(jnp.asarray(img, jnp.float32), ys, xs))
    cv = np.array([k.angle for k in kps])
    d = np.abs((ours - cv + 180) % 360 - 180)
    assert np.median(d) < 2.0, np.median(d)


def test_extract_shapes_and_distribution(img):
    cfg = OrbConfig(n_features=400, n_levels=4)
    out = extract_orb(img, cfg)
    assert out["uv"].shape == (400, 2)
    assert out["desc_bits"].shape == (400, 256)
    v = np.asarray(out["valid"])
    assert v.sum() > 350
    q = features_per_level(cfg)
    assert sum(q) == 400
    oct_ = np.asarray(out["octave"])[v]
    counts = np.bincount(oct_, minlength=4)
    # geometric budget split roughly respected
    assert counts[0] > counts[3]
    uv = np.asarray(out["uv"])[v]
    assert uv[:, 0].min() >= 0 and uv[:, 0].max() < 640
    # spatial spread: keypoints should cover most of the image quarters
    qx = (uv[:, 0] > 320).astype(int) * 2 + (uv[:, 1] > 240).astype(int)
    assert len(np.unique(qx)) == 4


def test_two_frame_matching_geometric_consistency(img_pair):
    im1, im2 = img_pair
    cfg = OrbConfig(n_features=400, n_levels=4)
    o1 = extract_orb(im1, cfg)
    o2 = extract_orb(im2, cfg)
    s1 = H.to_signs(o1["desc_bits"])
    s2 = H.to_signs(o2["desc_bits"])
    idx, _ = __import__(
        "ar_orbslam2_tpu.matching.matcher", fromlist=["m"]
    ).search_brute_force(s1, o1["valid"], s2, o2["valid"], nn_ratio=0.8)
    idx = np.asarray(idx)
    m = idx >= 0
    assert m.sum() > 60, m.sum()
    uv1 = np.asarray(o1["uv"])[m]
    uv2 = np.asarray(o2["uv"])[idx[m]]
    Hm, inl = cv2.findHomography(uv1, uv2, cv2.RANSAC, 3.0)
    assert inl.mean() > 0.7, inl.mean()
