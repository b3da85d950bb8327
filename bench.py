"""Headline benchmark: END-TO-END SLAM tracking frames/s on one chip.

Measures the FULL per-frame pipeline of SlamSystem.track_monocular on
rendered 640x480 images — ORB extraction (pyramid FAST + rotated BRIEF),
motion-model projective matching, motion-only BA, local-map tracking, and
the amortized keyframe mapping work (triangulation, fusion, local BA) —
i.e. exactly what the reference's per-frame timing loop measures
(Examples/Monocular/mono_tum.cc timing of System::TrackMonocular).

Steady-state only: the first WARMUP frames absorb jit compilation and map
bootstrap, then the remaining frames are timed wall-clock.

Baseline: reference ORB-SLAM2 tracks ~30 fps on an i7 for 640x480 mono
with extraction included (BASELINE.md). vs_baseline = fps / 30.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import sys
import time

REF_CPU_FPS = 30.0
N_FRAMES = 150
WARMUP = 45


def main():
    import numpy as np

    from ar_orbslam2_tpu.core.camera import Camera
    from ar_orbslam2_tpu.data import synthetic
    from ar_orbslam2_tpu.system.slam import SlamConfig, SlamSystem

    cam = Camera(fx=500.0, fy=500.0, cx=320.0, cy=240.0,
                 width=640, height=480)
    t0 = time.perf_counter()
    imgs, _, _ = synthetic.render_plane_sequence(
        cam, n_frames=N_FRAMES, seed=0, motion=0.6)
    print(f"[bench] rendered {N_FRAMES} frames in "
          f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)

    slam = SlamSystem(cam, SlamConfig())
    t0 = time.perf_counter()
    for i in range(WARMUP):
        slam.track_monocular(imgs[i], timestamp=i / 30.0)
    print(f"[bench] warmup ({WARMUP} frames incl. compile): "
          f"{time.perf_counter() - t0:.1f}s; state={slam.tracking.state} "
          f"kf={slam.store.n_keyframes()} mp={slam.store.n_map_points()}",
          file=sys.stderr)

    t0 = time.perf_counter()
    n_ok = 0
    for i in range(WARMUP, N_FRAMES):
        T = slam.track_monocular(imgs[i], timestamp=i / 30.0)
        n_ok += T is not None
    dt = time.perf_counter() - t0
    n = N_FRAMES - WARMUP
    fps = n / dt
    print(f"[bench] steady state: {n} frames in {dt:.2f}s "
          f"({1000 * dt / n:.1f} ms/frame), {n_ok} tracked OK, "
          f"kf={slam.store.n_keyframes()} mp={slam.store.n_map_points()}",
          file=sys.stderr)

    print(json.dumps({
        "metric": "e2e_tracking_fps",
        "value": round(fps, 2),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / REF_CPU_FPS, 2),
    }))


if __name__ == "__main__":
    main()
