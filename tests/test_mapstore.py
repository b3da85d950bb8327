import numpy as np

from ar_orbslam2_tpu.mapstore import MapStore, MapConfig
from ar_orbslam2_tpu.ops import hamming as H


def small_cfg():
    return MapConfig(max_keyframes=16, max_map_points=256, max_kp=64,
                     max_obs=8)


def add_kf(store, rng, n_kp=32):
    uv = rng.uniform(0, 640, (n_kp, 2)).astype(np.float32)
    desc = H.pack_bits((rng.random((n_kp, 256)) < 0.5).astype(np.uint8))
    octv = np.zeros(n_kp, np.int32)
    return store.add_keyframe(np.eye(3, dtype=np.float32),
                              np.zeros(3, np.float32),
                              uv, desc, octv, np.ones(n_kp, bool))


def test_keyframe_and_point_lifecycle(rng):
    s = MapStore(small_cfg())
    k0 = add_kf(s, rng)
    k1 = add_kf(s, rng)
    assert s.n_keyframes() == 2
    ids = s.add_map_points(rng.standard_normal((5, 3)).astype(np.float32),
                           H.pack_bits((rng.random((5, 256)) < 0.5
                                        ).astype(np.uint8)), first_kf=k0)
    assert s.n_map_points() == 5
    for i, mp in enumerate(ids):
        s.add_observation(int(mp), k0, i)
        s.add_observation(int(mp), k1, i)
    assert (s.mp_nobs[ids] == 2).all()
    assert (s.kf_mp[k0, :5] == ids).all()
    # erase one observation -> falls to 1 observer -> point dies
    s.erase_observation(int(ids[0]), k0)
    assert not s.mp_valid[ids[0]]
    assert s.kf_mp[k1, 0] == -1
    # freed slot is reused
    new = s.add_map_points(np.zeros((1, 3), np.float32),
                           np.zeros((1, 32), np.uint8))
    assert new[0] == ids[0]


def test_covisibility_and_parent(rng):
    s = MapStore(small_cfg())
    kfs = [add_kf(s, rng) for _ in range(3)]
    pts = s.add_map_points(rng.standard_normal((36, 3)).astype(np.float32),
                           H.pack_bits((rng.random((36, 256)) < 0.5
                                        ).astype(np.uint8)))
    # kf0 sees 0..19, kf1 sees 0..35, kf2 sees 20..35:
    # kf0&kf1 share 20, kf1&kf2 share 16, kf0&kf2 share 0
    for i in range(20):
        s.add_observation(int(pts[i]), kfs[0], i)
    for i in range(36):
        s.add_observation(int(pts[i]), kfs[1], i)
    for i in range(20, 36):
        s.add_observation(int(pts[i]), kfs[2], i)
    for k in kfs:
        s.update_connections(k)
    assert s.covis[kfs[0], kfs[1]] == 20
    assert s.covis[kfs[1], kfs[2]] == 16
    assert s.covis[kfs[0], kfs[2]] == 0  # below threshold 15 (6 shared)
    assert s.kf_parent[kfs[1]] == kfs[0]
    cov = s.covisible_keyframes(kfs[1])
    assert list(cov) == [kfs[0], kfs[2]]


def test_distinctive_descriptor_and_normal(rng):
    s = MapStore(small_cfg())
    k0 = add_kf(s, rng)
    k1 = add_kf(s, rng)
    k2 = add_kf(s, rng)
    k3 = add_kf(s, rng)
    s.kf_t[k1] = np.array([1.0, 0, 0], np.float32)
    s.kf_t[k2] = np.array([0, 1.0, 0], np.float32)
    mp = int(s.add_map_points(np.array([[0, 0, 4.0]], np.float32),
                              np.zeros((1, 32), np.uint8))[0])
    # four observations; `base` is the unique medoid (disjoint flip ranges)
    base = (rng.random(256) < 0.5).astype(np.uint8)
    d0 = base.copy()
    d0[:50] ^= 1
    d2 = base.copy()
    d2[100:130] ^= 1
    d3 = base.copy()
    d3[200:220] ^= 1
    for k, bits, ft in ((k0, d0, 3), (k1, base, 4), (k2, d2, 5), (k3, d3, 6)):
        s.kf_desc[k, ft] = H.pack_bits(bits[None])[0]
        s.add_observation(mp, k, ft)
    s.compute_distinctive_descriptors(mp)
    np.testing.assert_array_equal(s.mp_desc[mp], H.pack_bits(base[None])[0])
    s.update_normal_and_depth(mp)
    n = s.mp_normal[mp]
    assert np.linalg.norm(n) > 0.99
    assert n[2] > 0.8          # roughly towards +z
    assert s.mp_dmax[mp] > s.mp_dmin[mp] > 0


def test_erase_keyframe_reconnects_children(rng):
    s = MapStore(small_cfg())
    kfs = [add_kf(s, rng) for _ in range(3)]
    pts = s.add_map_points(rng.standard_normal((20, 3)).astype(np.float32),
                           H.pack_bits((rng.random((20, 256)) < 0.5
                                        ).astype(np.uint8)))
    for i in range(20):
        for k in kfs:
            s.add_observation(int(pts[i]), k, i)
    for k in kfs:
        s.update_connections(k)
    assert s.kf_parent[kfs[1]] == kfs[0]
    # children of kf1
    assert s.kf_parent[kfs[2]] in (kfs[0], kfs[1])
    s.kf_parent[kfs[2]] = kfs[1]
    s.erase_keyframe(kfs[1])
    assert not s.kf_valid[kfs[1]]
    assert s.kf_parent[kfs[2]] != kfs[1]
    # observations were detached
    assert (s.mp_obs_kf[pts[:20]] != kfs[1]).all()


def test_replace_map_point(rng):
    s = MapStore(small_cfg())
    k0 = add_kf(s, rng)
    k1 = add_kf(s, rng)
    a, b = s.add_map_points(rng.standard_normal((2, 3)).astype(np.float32),
                            np.zeros((2, 32), np.uint8))
    s.add_observation(int(a), k0, 0)
    s.add_observation(int(a), k1, 1)
    s.add_observation(int(b), k1, 2)
    s.replace_map_point(int(a), int(b))
    assert not s.mp_valid[a]
    # b inherits k0's observation; k1 keeps its own binding of b
    assert s.kf_mp[k0, 0] == b
    assert s.kf_mp[k1, 2] == b
    assert s.kf_mp[k1, 1] == -1


def test_local_map_and_gather(rng):
    s = MapStore(small_cfg())
    k0 = add_kf(s, rng)
    pts = s.add_map_points(rng.standard_normal((10, 3)).astype(np.float32),
                           H.pack_bits((rng.random((10, 256)) < 0.5
                                        ).astype(np.uint8)))
    for i in range(10):
        s.add_observation(int(pts[i]), k0, i)
    local = s.local_map_points(np.array([k0]))
    assert set(local) == set(pts.tolist())
    bundle = s.gather_map_points(local, pad_to=16)
    assert bundle["pos"].shape == (16, 3)
    assert bundle["valid"].sum() == 10
