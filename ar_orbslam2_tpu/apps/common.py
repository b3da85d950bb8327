"""Shared CLI runner plumbing — parity with the reference example mains
(Examples/Monocular/mono_tum.cc etc., SURVEY.md §2.3): load settings, feed
the sequence frame by frame, time each frame, print the median/mean
tracking time, save trajectories."""
from __future__ import annotations

import json
import time

import numpy as np

from ..mapstore.map import MapConfig
from ..system.slam import SlamConfig, SlamSystem
from ..system.tracking import TrackingConfig
from ..utils.config import Settings, load_settings


def build_system(settings: Settings, sensor="MONOCULAR",
                 enable_loops=True) -> SlamSystem:
    tcfg = TrackingConfig(
        max_kp=max(512, 1 << (settings.n_features - 1).bit_length()),
        scale_factor=settings.scale_factor, n_levels=settings.n_levels,
        max_frames_between_kf=int(settings.fps))
    cfg = SlamConfig(sensor=sensor, tracking=tcfg,
                     map=MapConfig(max_kp=tcfg.max_kp),
                     orb_n_features=settings.n_features,
                     enable_loop_closing=enable_loops,
                     depth_threshold=settings.th_depth)
    return SlamSystem(settings.camera, cfg)


def run_sequence(slam: SlamSystem, frames, metrics_path=None,
                 traj_prefix=None, realtime_fps=0.0):
    """frames: iterable of (timestamp, kwargs-for-track_*). Each item is
    (ts, dict(image_u8=...)), (ts, dict(image_u8, depth_m)), or
    (ts, dict(left_u8, right_u8))."""
    times = []
    for ts, kw in frames:
        t0 = time.perf_counter()
        if "left_u8" in kw:
            slam.track_stereo(kw["left_u8"], kw["right_u8"], timestamp=ts)
        elif "depth_m" in kw:
            slam.track_rgbd(kw["image_u8"], kw["depth_m"], timestamp=ts)
        else:
            slam.track_monocular(kw["image_u8"], timestamp=ts)
        dt = time.perf_counter() - t0
        times.append(dt)
        if realtime_fps > 0:
            lag = 1.0 / realtime_fps - dt
            if lag > 0:
                time.sleep(lag)
    times = np.asarray(times)
    print(f"median tracking time: {np.median(times)*1e3:.2f} ms")
    print(f"mean tracking time:   {times.mean()*1e3:.2f} ms")
    if metrics_path:
        with open(metrics_path, "w") as f:
            for rec in slam.tracking.metrics:
                row = {k: v for k, v in rec.items()
                       if k not in ("R", "t")}
                if "t" in rec:
                    row["twc"] = (-(rec["R"].T @ rec["t"])).tolist()
                f.write(json.dumps(row) + "\n")
    if traj_prefix:
        slam.save_keyframe_trajectory_tum(traj_prefix + "_kf_tum.txt")
        slam.save_trajectory_tum(traj_prefix + "_tum.txt")
        slam.save_trajectory_kitti(traj_prefix + "_kitti.txt")
    return times
