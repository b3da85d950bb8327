"""AR demo runner — the fork's headline app, headless.

Parity: ros_mono_ar.cc + ViewerAR (SURVEY.md §3.5): per frame, track
monocular, detect the dominant plane from currently tracked landmarks,
anchor virtual cubes, render the overlay to PNG frames / MP4. A marker
anchor (cv2.aruco) is maintained alongside (SURVEY.md §2.3 fork delta).

  python -m ar_orbslam2_tpu.apps.run_ar <settings.yaml> <tum_seq_dir> \
      --out ar_frames/ [--add-cube-at 30] [--video out.mp4]
"""
from __future__ import annotations

import argparse
import os

import numpy as np

from ..ar.marker import MarkerAnchor
from ..ar.viewer import ViewerAR
from ..data import datasets
from ..utils.config import load_settings
from .common import build_system


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("settings")
    ap.add_argument("seq_dir")
    ap.add_argument("--out", default="ar_frames")
    ap.add_argument("--video", default=None)
    ap.add_argument("--add-cube-at", type=int, default=30,
                    help="frame index at which to 'press Add Cube'")
    ap.add_argument("--cube-size", type=float, default=0.05)
    ap.add_argument("--max-frames", type=int, default=0)
    ap.add_argument("--markers", action="store_true")
    args = ap.parse_args(argv)

    st = load_settings(args.settings)
    slam = build_system(st, sensor="MONOCULAR")
    viewer = ViewerAR(cam=st.camera)
    markers = MarkerAnchor(st.camera) if args.markers else None
    os.makedirs(args.out, exist_ok=True)

    ts, paths = datasets.load_tum_monocular(args.seq_dir)
    writer = None
    for i, (t, p) in enumerate(zip(ts, paths)):
        if args.max_frames and i >= args.max_frames:
            break
        im = datasets._imread_gray(p)
        T = slam.track_monocular(im, timestamp=t)
        frame = slam.last_frame
        rec = slam.tracking.metrics[-1]
        tracked = frame.mp >= 0
        if markers is not None:
            markers.update(im, T)
        if i == args.add_cube_at and T is not None:
            pts = slam.store.mp_pos[np.maximum(frame.mp, 0)]
            viewer.add_cube(pts, tracked, Tcw=T, size=args.cube_size)
        out = viewer.render(im, T, tracked_uv=frame.uv[tracked],
                            state=rec["state"],
                            n_tracked=int(tracked.sum()))
        import cv2
        path = os.path.join(args.out, f"{i:06d}.png")
        cv2.imwrite(path, out)
        if args.video:
            if writer is None:
                writer = cv2.VideoWriter(
                    args.video, cv2.VideoWriter_fourcc(*"mp4v"),
                    st.fps, (out.shape[1], out.shape[0]))
            writer.write(out)
    if writer is not None:
        writer.release()
    print(f"AR frames in {args.out}; cubes: {len(viewer.cubes)}")


if __name__ == "__main__":
    main()
