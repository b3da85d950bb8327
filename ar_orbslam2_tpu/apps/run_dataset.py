"""Dataset runner CLI — mono/stereo/RGB-D over TUM / KITTI / EuRoC.

Parity with the reference example executables (mono_tum, mono_kitti,
mono_euroc, stereo_kitti, rgbd_tum — SURVEY.md §2.3), one CLI:

  python -m ar_orbslam2_tpu.apps.run_dataset tum <settings.yaml> <seq_dir>
  python -m ar_orbslam2_tpu.apps.run_dataset kitti <settings.yaml> <seq_dir> [--stereo]
  python -m ar_orbslam2_tpu.apps.run_dataset tum-rgbd <settings.yaml> <seq_dir>
  python -m ar_orbslam2_tpu.apps.run_dataset euroc <settings.yaml> <seq_dir>
"""
from __future__ import annotations

import argparse

import numpy as np

from ..data import datasets
from ..utils.config import load_settings
from .common import build_system, precompile, run_sequence


def _enable_compile_cache():
    """Persistent jit cache: dataset reruns skip the multi-minute compile.
    TPU-only — XLA:CPU AOT entries are machine-feature-sensitive and
    poison forced-CPU runs on heterogeneous hosts."""
    import os

    import jax
    if jax.default_backend() != "cpu":
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("dataset", choices=["tum", "kitti", "tum-rgbd", "euroc"])
    ap.add_argument("settings")
    ap.add_argument("seq_dir")
    ap.add_argument("--stereo", action="store_true")
    ap.add_argument("--out", default="trajectory")
    ap.add_argument("--metrics", default=None)
    ap.add_argument("--max-frames", type=int, default=0)
    ap.add_argument("--no-loops", action="store_true")
    ap.add_argument("--chunk", type=int, default=8,
                    help="fused chunk size for mono tracking (0/1 = "
                         "per-frame)")
    ap.add_argument("--async-mapping", action="store_true",
                    help="run the mapping stage on a worker thread "
                         "(reference-style pipeline)")
    ap.add_argument("--no-precompile", action="store_true",
                    help="skip the startup kernel warmup (first frames "
                         "will pay JIT compiles)")
    args = ap.parse_args(argv)

    _enable_compile_cache()
    st = load_settings(args.settings)
    sensor = ("STEREO" if args.stereo else
              "RGBD" if args.dataset == "tum-rgbd" else "MONOCULAR")
    slam = build_system(st, sensor=sensor, enable_loops=not args.no_loops,
                        async_mapping=args.async_mapping)
    if not args.no_precompile and sensor == "MONOCULAR":
        precompile(slam)

    def frames():
        if args.dataset == "tum":
            ts, paths = datasets.load_tum_monocular(args.seq_dir)
            for i, (t, p) in enumerate(zip(ts, paths)):
                if args.max_frames and i >= args.max_frames:
                    return
                yield t, dict(image_u8=datasets._imread_gray(p))
        elif args.dataset == "tum-rgbd":
            ts, rgb, dep = datasets.load_tum_rgbd(args.seq_dir)
            for i, (t, p, q) in enumerate(zip(ts, rgb, dep)):
                if args.max_frames and i >= args.max_frames:
                    return
                import cv2
                d = cv2.imread(q, cv2.IMREAD_UNCHANGED).astype(np.float32)
                d /= max(st.depth_map_factor, 1e-9)
                yield t, dict(image_u8=datasets._imread_gray(p), depth_m=d)
        elif args.dataset == "kitti":
            if args.stereo:
                ts, left, right = datasets.load_kitti(args.seq_dir,
                                                      stereo=True)
                for i, (t, l, r) in enumerate(zip(ts, left, right)):
                    if args.max_frames and i >= args.max_frames:
                        return
                    yield t, dict(left_u8=datasets._imread_gray(l),
                                  right_u8=datasets._imread_gray(r))
            else:
                ts, left = datasets.load_kitti(args.seq_dir)
                for i, (t, p) in enumerate(zip(ts, left)):
                    if args.max_frames and i >= args.max_frames:
                        return
                    yield t, dict(image_u8=datasets._imread_gray(p))
        else:  # euroc
            ts, paths = datasets.load_euroc(args.seq_dir)
            for i, (t, p) in enumerate(zip(ts, paths)):
                if args.max_frames and i >= args.max_frames:
                    return
                yield t, dict(image_u8=datasets._imread_gray(p))

    run_sequence(slam, frames(), metrics_path=args.metrics,
                 traj_prefix=args.out,
                 chunk=args.chunk if sensor == "MONOCULAR" else 0)
    slam.shutdown()
    print(f"keyframes: {slam.store.n_keyframes()} "
          f"map points: {slam.store.n_map_points()}")


if __name__ == "__main__":
    main()
