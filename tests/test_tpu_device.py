"""On-TPU test tier (VERDICT r2 next-step #7).

These run on the REAL chip only:  AR_TPU_TESTS=1 pytest tests/test_tpu_device.py
(the default suite invocation forces the CPU mesh and auto-skips these).

Covers the two things the CPU mesh cannot: (a) the Mosaic compile path of
the fused Pallas matcher agrees with the XLA fallback on device, and
(b) the fused per-frame megastep reaches a recompile-free steady state.
"""
import os

import numpy as np
import pytest

import jax

pytestmark = pytest.mark.skipif(
    os.environ.get("AR_TPU_TESTS") != "1"
    or jax.default_backend() not in ("tpu",),
    reason="real-TPU tier: run with AR_TPU_TESTS=1 on a TPU backend")


def test_pallas_matcher_matches_xla_on_device():
    """fused_windowed_top2 Mosaic kernel == XLA fallback, on chip."""
    import jax.numpy as jnp

    from ar_orbslam2_tpu.ops.pallas_hamming import fused_windowed_top2

    rng = np.random.default_rng(3)
    n, m = 512, 1024
    q_signs = (rng.integers(0, 2, (n, 256)) * 2 - 1).astype(np.int8)
    kp_signs = (rng.integers(0, 2, (m, 256)) * 2 - 1).astype(np.int8)
    # half the keypoints share descriptors with queries (real matches)
    kp_signs[:n // 2] = q_signs[:n // 2]
    q_uv = rng.uniform(0, 640, (n, 2)).astype(np.float32)
    kp_uv = q_uv[rng.integers(0, n, m)] + rng.normal(0, 2, (m, 2)) \
        .astype(np.float32)
    kp_uv[:n // 2] = q_uv[:n // 2] + rng.normal(0, 1, (n // 2, 2))
    radius = np.full(n, 8.0, np.float32)
    olo = np.full(n, -1, np.int32)
    ohi = np.full(n, 8, np.int32)
    q_valid = np.ones(n, bool)
    kp_oct = np.zeros(m, np.int32)
    kp_valid = np.ones(m, bool)

    args = [jax.numpy.asarray(a) for a in
            (q_signs, q_uv, radius, olo, ohi, q_valid,
             kp_signs, kp_uv, kp_oct, kp_valid)]
    idx_p, d_p = fused_windowed_top2(*args, th=100, nn_ratio=0.9,
                                     mutual=True, force="pallas")
    idx_x, d_x = fused_windowed_top2(*args, th=100, nn_ratio=0.9,
                                     mutual=True, force="xla")
    idx_p, idx_x = np.asarray(idx_p), np.asarray(idx_x)
    agree = (idx_p == idx_x).mean()
    assert agree > 0.995, f"pallas/xla agreement {agree:.3f}"
    matched = idx_p >= 0
    assert matched.sum() > n // 4


def test_fused_megastep_no_recompile_steady_state():
    """After warmup, ordinary tracked frames must hit the jit cache —
    zero recompiles (fixed shapes are the whole design contract)."""
    from ar_orbslam2_tpu.core.camera import Camera
    from ar_orbslam2_tpu.data import synthetic
    from ar_orbslam2_tpu.system import fused as fused_mod
    from ar_orbslam2_tpu.system.slam import SlamConfig, SlamSystem

    cam = Camera(fx=500.0, fy=500.0, cx=320.0, cy=240.0,
                 width=640, height=480)
    imgs, _, _ = synthetic.render_plane_sequence(cam, n_frames=16, seed=0,
                                                 motion=0.3)
    slam = SlamSystem(cam, SlamConfig())
    for i in range(10):                       # init + warmup + first KFs
        slam.track_monocular(imgs[i], timestamp=i / 30.0)
    assert slam.tracking.state == "OK"
    n_compiles_before = fused_mod.track_megastep._cache_size()
    import time
    times = []
    for i in range(10, 16):
        t0 = time.perf_counter()
        slam.track_monocular(imgs[i], timestamp=i / 30.0)
        times.append(time.perf_counter() - t0)
    assert fused_mod.track_megastep._cache_size() == n_compiles_before, \
        "megastep recompiled in steady state"
    ordinary = sorted(times)[:4]
    assert np.median(ordinary) < 0.5, \
        f"steady frame too slow: {np.median(ordinary)*1e3:.0f} ms"
