"""Diagnose the long-sequence tail-LOST regression (VERDICT r4 weak #1).

Replicates tests/test_slam_long_sequence.py's fixture with per-frame
metric dumps so the failing tail is visible frame by frame.
"""

import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
# NOTE: do NOT enable the persistent compilation cache here — XLA:CPU AOT
# entries are machine-feature-sensitive (observed: +prefer-no-scatter
# mismatch spam + wedged run on this host).

import numpy as np

from ar_orbslam2_tpu.core.camera import Camera
from ar_orbslam2_tpu.data import synthetic
from ar_orbslam2_tpu.mapstore.map import MapConfig
from ar_orbslam2_tpu.mapping.local_mapping import LocalMapperConfig
from ar_orbslam2_tpu.system.slam import SlamConfig, SlamSystem
from ar_orbslam2_tpu.system.tracking import TrackingConfig

CAM = Camera(fx=500.0, fy=500.0, cx=320.0, cy=240.0, width=640, height=480)
N_FRAMES = 150


def _cfg():
    return SlamConfig(
        map=MapConfig(max_keyframes=128, max_map_points=40_000,
                      max_kp=1024),
        tracking=TrackingConfig(max_kp=1024, n_local_mp=4096,
                                max_frames_between_kf=30),
        mapper=LocalMapperConfig(ba_max_points=4096,
                                 n_triangulation_neighbors=5,
                                 n_fuse_neighbors=5),
        enable_loop_closing=False, enable_relocalization=False)


def main():
    imgs, R_cw, t_cw = synthetic.render_plane_sequence(
        CAM, n_frames=N_FRAMES, seed=3, motion=0.6)
    slam = SlamSystem(CAM, _cfg())

    # instrument the KF decision
    from ar_orbslam2_tpu.system.tracking import Tracking
    orig_need = Tracking._need_new_keyframe
    decisions = []

    def need_logged(self, frame, n_inliers):
        out = orig_need(self, frame, n_inliers)
        d = dict(fid=frame.frame_id, n_inl=int(n_inliers),
                 n_ref=self._ref_tracked(),
                 peak=round(self._inl_peak),
                 ref_kf=self.ref_kf,
                 last_kf_fid=self.last_kf_frame_id,
                 need=bool(out))
        decisions.append(d)
        print(d, flush=True)
        return out
    Tracking._need_new_keyframe = need_logged

    poses = slam.track_monocular_batch(list(imgs), chunk=8)
    print("=== KF decisions:")
    for d in decisions:
        print(d)
    print(f"=== created KFs (next_kf): {slam.store.next_kf}")
    n_ok = sum(p is not None for p in poses)
    print(f"\n=== tracked {n_ok}/{N_FRAMES}, final state "
          f"{slam.tracking.state}, kf={slam.store.n_keyframes()} "
          f"mp={slam.store.n_map_points()} resets={slam.tracking.n_resets}")
    for m in slam.tracking.metrics:
        keys = ("frame_id", "state", "ok", "n_inliers", "motion_matches",
                "motion_inliers", "fb_used", "local_visible", "new_kf",
                "n_new_mp", "n_kf", "n_mp", "fused", "chunked")
        print({k: m[k] for k in keys if k in m})


if __name__ == "__main__":
    main()
