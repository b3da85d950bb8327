import numpy as np
import jax.numpy as jnp

from ar_orbslam2_tpu.ops import hamming as H
from ar_orbslam2_tpu.matching import matcher
from ar_orbslam2_tpu.core.camera import Camera
from ar_orbslam2_tpu.data import synthetic


def np_hamming(a_bits, b_bits):
    return (a_bits[:, None, :] != b_bits[None, :, :]).sum(-1)


def test_pack_unpack_roundtrip(rng):
    bits = (rng.random((17, 256)) < 0.5).astype(np.uint8)
    packed = H.pack_bits(bits)
    assert packed.shape == (17, 32)
    np.testing.assert_array_equal(H.unpack_bits(packed), bits)


def test_hamming_matrix_matches_numpy(rng):
    a = (rng.random((64, 256)) < 0.5).astype(np.uint8)
    b = (rng.random((48, 256)) < 0.5).astype(np.uint8)
    D = H.hamming_matrix(H.to_signs(a), H.to_signs(b))
    np.testing.assert_array_equal(np.asarray(D), np_hamming(a, b))


def test_hamming_validity_masks(rng):
    a = (rng.random((8, 256)) < 0.5).astype(np.uint8)
    va = np.array([True] * 4 + [False] * 4)
    D = H.hamming_matrix(H.to_signs(a), H.to_signs(a),
                         jnp.asarray(va), jnp.asarray(va))
    D = np.asarray(D)
    assert (D[4:] > 256).all() and (D[:, 4:] > 256).all()
    assert (np.diag(D)[:4] == 0).all()


def test_best_match_ratio(rng):
    a = (rng.random((32, 256)) < 0.5).astype(np.uint8)
    # b = a with slight noise, so best match is the identity pairing
    flip = rng.random((32, 256)) < 0.02
    b = a ^ flip.astype(np.uint8)
    idx, dist = H.best_match(H.hamming_matrix(H.to_signs(a), H.to_signs(b)),
                             th=50, nn_ratio=0.9)
    np.testing.assert_array_equal(np.asarray(idx), np.arange(32))
    assert np.asarray(dist).max() <= 15


def test_rotation_consistency(rng):
    n = 100
    idx = jnp.arange(n, dtype=jnp.int32)
    ang_a = rng.uniform(0, 360, n).astype(np.float32)
    # consistent global rotation of 30 deg except 8 outliers
    ang_b = (ang_a - 30.0) % 360
    out = rng.choice(n, 8, replace=False)
    ang_b[out] = (ang_b[out] + 120) % 360
    kept = np.asarray(H.rotation_consistency(jnp.asarray(ang_a),
                                             jnp.asarray(ang_b), idx))
    assert (kept[out] == -1).all()
    inl = np.setdiff1d(np.arange(n), out)
    assert (kept[inl] == inl).mean() > 0.95


def _scene_obs(seed=0, n_frames=8):
    cam = Camera(fx=500, fy=500, cx=320, cy=240)
    scene = synthetic.make_scene(n_landmarks=800, n_frames=n_frames, seed=seed)
    return cam, scene


def test_search_for_initialization_on_synthetic():
    cam, scene = _scene_obs()
    o1 = synthetic.observe_frame(scene, 0, cam, max_kp=512)
    o2 = synthetic.observe_frame(scene, 1, cam, max_kp=512)
    idx, dist = matcher.search_for_initialization(
        jnp.asarray(o1["uv"]), H.to_signs(o1["desc"]), jnp.asarray(o1["valid"]),
        jnp.asarray(o2["uv"]), H.to_signs(o2["desc"]), jnp.asarray(o2["valid"]),
        window=120.0)
    idx = np.asarray(idx)
    matched = idx >= 0
    assert matched.sum() > 100
    # verify against ground-truth landmark ids
    gt1 = o1["landmark_id"]
    gt2 = o2["landmark_id"]
    correct = gt1[matched] == gt2[idx[matched]]
    assert correct.mean() > 0.98


def test_search_by_projection_frame_on_synthetic():
    cam, scene = _scene_obs(seed=3)
    f = 4
    o_last = synthetic.observe_frame(scene, f - 1, cam, max_kp=512)
    o_cur = synthetic.observe_frame(scene, f, cam, max_kp=512)
    # last frame's "map points" = landmarks at GT positions
    last_xw = scene.landmarks[np.maximum(o_last["landmark_id"], 0)]
    idx, _ = matcher.search_by_projection_frame(
        cam, jnp.asarray(scene.R_cw[f]), jnp.asarray(scene.t_cw[f]),
        jnp.asarray(last_xw), H.to_signs(o_last["desc"]),
        jnp.asarray(o_last["octave"]), jnp.asarray(o_last["valid"]),
        jnp.asarray(o_cur["uv"]), H.to_signs(o_cur["desc"]),
        jnp.asarray(o_cur["octave"]), jnp.asarray(o_cur["valid"]),
        th_radius=15.0)
    idx = np.asarray(idx)
    matched = idx >= 0
    assert matched.sum() > 80
    correct = (o_last["landmark_id"][matched]
               == o_cur["landmark_id"][idx[matched]])
    assert correct.mean() > 0.98


def test_search_brute_force_identity(rng):
    a = (rng.random((256, 256)) < 0.5).astype(np.uint8)
    perm = rng.permutation(256)
    b = a[perm]
    idx, _ = matcher.search_brute_force(
        H.to_signs(a), jnp.ones(256, bool), H.to_signs(b), jnp.ones(256, bool))
    # a[i] should match b at position where perm == i
    expect = np.argsort(perm)
    np.testing.assert_array_equal(np.asarray(idx), expect)
