"""Multi-sequence data-parallel runner (SURVEY §2.5 DP row).

The reference has no multi-sequence story (one process, one map); the
TPU-native framework treats per-sequence SLAM as the data-parallel axis:
each sequence gets its own SlamSystem (own map, own device-resident
tracking state) and sequences are interleaved in chunk-sized slices, so
device work from one sequence's mapper overlaps another's tracking and
the chip stays busy — the single-host analog of running one sequence per
host over DCN (the "KITTI 00+05 config").

Sources: dataset directories (TUM/KITTI/EuRoC autodetected, comma
separated) or --synthetic N for N rendered plane sequences.

  python -m ar_orbslam2_tpu.apps.run_multi <settings.yaml> \
      --synthetic 2 --frames 120 [--chunk 8] [--out-prefix traj_]
  python -m ar_orbslam2_tpu.apps.run_multi <settings.yaml> \
      --seqs /data/kitti/00,/data/kitti/05
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np

from ..utils.config import load_settings
from .common import build_system


def load_sources(args, settings):
    """Returns a list of dicts: name, frames (list of gray u8), ts."""
    out = []
    if args.synthetic:
        from ..core.camera import Camera
        from ..data import synthetic
        cam = settings.camera
        for k in range(args.synthetic):
            imgs, _, _ = synthetic.render_plane_sequence(
                cam, n_frames=args.frames, seed=k, motion=0.6)
            out.append(dict(name=f"synthetic{k}", frames=list(imgs),
                            ts=[i / 30.0 for i in range(len(imgs))]))
        return out
    import os

    from ..data import datasets
    for path in args.seqs.split(","):
        path = path.strip()
        if os.path.exists(os.path.join(path, "rgb.txt")):
            ts, paths = datasets.load_tum_monocular(path)
        elif os.path.isdir(os.path.join(path, "image_0")):
            ts, paths = datasets.load_kitti(path)
        else:
            ts, paths = datasets.load_euroc(path)
        if args.frames:
            ts, paths = ts[:args.frames], paths[:args.frames]
        frames = list(datasets.iter_images(paths))
        out.append(dict(name=path.rstrip("/").split("/")[-1],
                        frames=frames, ts=list(ts)))
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("settings")
    ap.add_argument("--seqs", default="", help="comma-separated seq dirs")
    ap.add_argument("--synthetic", type=int, default=0)
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--out-prefix", default=None)
    args = ap.parse_args(argv)

    st = load_settings(args.settings)
    sources = load_sources(args, st)
    systems = [build_system(st, sensor="MONOCULAR") for _ in sources]
    cursors = [0] * len(sources)
    n_total = sum(len(s["frames"]) for s in sources)

    t0 = time.perf_counter()
    done = False
    while not done:
        done = True
        # round-robin: one chunk per sequence per pass — mapper work of
        # one sequence overlaps tracking dispatches of the next
        for k, (src, slam) in enumerate(zip(sources, systems)):
            i = cursors[k]
            if i >= len(src["frames"]):
                continue
            done = False
            j = min(i + args.chunk, len(src["frames"]))
            slam.track_monocular_batch(src["frames"][i:j],
                                       timestamps=src["ts"][i:j],
                                       chunk=args.chunk)
            cursors[k] = j
    wall = time.perf_counter() - t0

    for src, slam in zip(sources, systems):
        slam.shutdown()
        ok = sum(1 for m in slam.tracking.metrics if m.get("ok"))
        print(f"[{src['name']}] tracked {ok}/{len(src['frames'])} "
              f"kf={slam.store.n_keyframes()} "
              f"mp={slam.store.n_map_points()}", file=sys.stderr)
        if args.out_prefix:
            slam.save_trajectory_tum(f"{args.out_prefix}{src['name']}.txt")
    fps = n_total / max(wall, 1e-9)
    print(f"[multi] {len(sources)} sequences, {n_total} frames in "
          f"{wall:.1f}s = {fps:.1f} aggregate fps", file=sys.stderr)
    return fps


if __name__ == "__main__":
    main()
