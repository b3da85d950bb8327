"""Settings YAML parity, dataset list parsing, map checkpoint roundtrip."""
import numpy as np

from ar_orbslam2_tpu.mapstore.checkpoint import load_map, save_map
from ar_orbslam2_tpu.mapstore.map import MapConfig, MapStore
from ar_orbslam2_tpu.utils.config import load_settings

TUM1_YAML = """%YAML:1.0
# Camera Parameters (reference TUM1.yaml field names)
Camera.fx: 517.306408
Camera.fy: 516.469215
Camera.cx: 318.643040
Camera.cy: 255.313989
Camera.k1: 0.262383
Camera.k2: -0.953104
Camera.p1: -0.005358
Camera.p2: 0.002628
Camera.k3: 1.163314
Camera.fps: 30.0
Camera.RGB: 1
ORBextractor.nFeatures: 1000
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 8
ORBextractor.iniThFAST: 20
ORBextractor.minThFAST: 7
Viewer.KeyFrameSize: 0.05
"""


def test_load_settings_reference_yaml(tmp_path):
    p = tmp_path / "TUM1.yaml"
    p.write_text(TUM1_YAML)
    st = load_settings(str(p))
    assert abs(st.camera.fx - 517.306408) < 1e-6
    assert abs(st.camera.k3 - 1.163314) < 1e-6
    assert st.camera.has_distortion
    assert st.n_features == 1000
    assert st.n_levels == 8
    assert st.ini_th_fast == 20
    assert st.fps == 30.0


def test_map_checkpoint_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    s = MapStore(MapConfig(max_keyframes=8, max_map_points=64, max_kp=16,
                           max_obs=4))
    uv = rng.uniform(0, 640, (16, 2)).astype(np.float32)
    desc = rng.integers(0, 256, (16, 32)).astype(np.uint8)
    octv = np.zeros(16, np.int32)
    valid = np.ones(16, bool)
    k0 = s.add_keyframe(np.eye(3, dtype=np.float32),
                        np.zeros(3, np.float32), uv, desc, octv, valid,
                        timestamp=1.5)
    k1 = s.add_keyframe(np.eye(3, dtype=np.float32),
                        np.ones(3, np.float32), uv, desc, octv, valid)
    ids = s.add_map_points(rng.normal(0, 1, (5, 3)).astype(np.float32),
                           desc[:5], first_kf=k0)
    for i, m in enumerate(ids):
        s.add_observation(int(m), k0, i)
        s.add_observation(int(m), k1, i)
    s.update_connections(k1)
    s.kf_loop_edges[k0] = {k1}
    path = str(tmp_path / "map.npz")
    save_map(s, path)
    s2 = load_map(path)
    assert s2.n_keyframes() == 2
    assert s2.n_map_points() == 5
    assert np.allclose(s2.kf_t[k1], 1.0)
    assert s2.kf_loop_edges == {k0: {k1}}
    assert (s2.mp_obs_kf[ids] == s.mp_obs_kf[ids]).all()
    assert len(s2.mp_free) == 64 - 5
    # new allocations still work after load
    more = s2.add_map_points(np.zeros((2, 3), np.float32), desc[:2])
    assert s2.mp_valid[more].all()


def test_dataset_list_parsers(tmp_path):
    from ar_orbslam2_tpu.data import datasets
    seq = tmp_path / "seq"
    seq.mkdir()
    (seq / "rgb.txt").write_text(
        "# comment\n1.0 rgb/0.png\n1.05 rgb/1.png\n")
    (seq / "depth.txt").write_text("1.01 depth/0.png\n1.06 depth/1.png\n")
    ts, paths = datasets.load_tum_monocular(str(seq))
    assert len(ts) == 2 and paths[0].endswith("rgb/0.png")
    ts2, rgb, dep = datasets.load_tum_rgbd(str(seq))
    assert len(ts2) == 2 and dep[1].endswith("depth/1.png")
    kseq = tmp_path / "00"
    kseq.mkdir()
    (kseq / "times.txt").write_text("0.0\n0.1\n0.2\n")
    ts3, left = datasets.load_kitti(str(kseq))
    assert len(ts3) == 3 and left[2].endswith("image_0/000002.png")
