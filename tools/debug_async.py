"""Diagnose the pipelined/async tracking path (tests/test_async_pipeline)."""

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

import numpy as np

from ar_orbslam2_tpu.core.camera import Camera
from ar_orbslam2_tpu.data import synthetic
from ar_orbslam2_tpu.eval.ate import ate_rmse
from ar_orbslam2_tpu.mapstore.map import MapConfig
from ar_orbslam2_tpu.mapping.local_mapping import LocalMapperConfig
from ar_orbslam2_tpu.system.slam import SlamConfig, SlamSystem
from ar_orbslam2_tpu.system.tracking import TrackingConfig

CAM = Camera(fx=500.0, fy=500.0, cx=320.0, cy=240.0, width=640, height=480)
N_FRAMES = 60


def _cfg(async_mapping):
    return SlamConfig(
        map=MapConfig(max_keyframes=64, max_map_points=20_000, max_kp=1024),
        tracking=TrackingConfig(max_kp=1024, n_local_mp=2048,
                                max_frames_between_kf=30),
        mapper=LocalMapperConfig(ba_max_points=2048,
                                 n_triangulation_neighbors=5,
                                 n_fuse_neighbors=5),
        enable_loop_closing=False, enable_relocalization=False,
        async_mapping=async_mapping)


def main():
    imgs, R_cw, t_cw = synthetic.render_plane_sequence(
        CAM, n_frames=N_FRAMES, seed=7, motion=0.45)
    gt = -(np.swapaxes(R_cw, -1, -2) @ t_cw[..., None])[..., 0]
    import sys as _sys
    slam = SlamSystem(CAM, _cfg("--sync" not in _sys.argv))

    from ar_orbslam2_tpu.system.fused import FusedFrontend
    orig_refresh = FusedFrontend.refresh_bundle_device
    orig_rebuild = FusedFrontend.rebuild

    def refresh_logged(self, anchor_kf):
        print(f"[refresh_bundle_device] anchor={anchor_kf} "
              f"fe.version={self.version} store={self.store.version}",
              flush=True)
        return orig_refresh(self, anchor_kf)

    def rebuild_logged(self, anchor_kf, *a, **k):
        print(f"[rebuild] anchor={anchor_kf} store.v={self.store.version}",
              flush=True)
        return orig_rebuild(self, anchor_kf, *a, **k)
    FusedFrontend.refresh_bundle_device = refresh_logged
    FusedFrontend.rebuild = rebuild_logged

    from ar_orbslam2_tpu.system.tracking import Tracking
    orig_rkp = Tracking._refresh_kf_pose
    orig_dki = Tracking._deferred_kf_insert

    def rkp_logged(self, frame):
        n = orig_rkp(self, frame)
        print(f"[refresh_kf_pose] frame={frame.frame_id} n_inl={n}",
              flush=True)
        return n

    def dki_logged(self, snaps, j, ts, fid, ids, anchor):
        kf = orig_dki(self, snaps, j, ts, fid, ids, anchor)
        print(f"[deferred_insert] frame={fid} -> kf={kf}", flush=True)
        return kf
    Tracking._refresh_kf_pose = rkp_logged
    Tracking._deferred_kf_insert = dki_logged

    from ar_orbslam2_tpu.mapping.async_mapper import AsyncMapper
    orig_submit = AsyncMapper.submit
    orig_task = AsyncMapper.submit_task

    def submit_logged(self, kf):
        print(f"[am.submit] kf={kf}", flush=True)
        return orig_submit(self, kf)

    def task_logged(self, fn):
        print("[am.submit_task]", flush=True)
        return orig_task(self, fn)
    AsyncMapper.submit = submit_logged
    AsyncMapper.submit_task = task_logged

    poses = slam.track_monocular_batch(list(imgs), chunk=8)
    slam.shutdown()
    n_ok = sum(p is not None for p in poses)
    print(f"=== tracked {n_ok}/{N_FRAMES}, final {slam.tracking.state}, "
          f"kf created {slam.store.next_kf} alive {slam.store.n_keyframes()} "
          f"mp {slam.store.n_map_points()} resets {slam.tracking.n_resets}",
          flush=True)
    est_t, gt_t = [], []
    for p, g in zip(poses, gt):
        if p is None:
            continue
        R_wc = p[:3, :3].T
        est_t.append(-(R_wc @ p[:3, 3]))
        gt_t.append(g)
    est_t = np.asarray(est_t)
    gt_t = np.asarray(gt_t)
    print("ATE(online)", ate_rmse(est_t, gt_t, with_scale=True))
    from ar_orbslam2_tpu.eval.ate import align_umeyama
    s_, R_, tr_ = align_umeyama(est_t, gt_t, True)
    err = np.linalg.norm((s_ * (R_ @ est_t.T)).T + tr_ - gt_t, axis=1)
    print("per-frame err:", np.array2string(err, precision=3,
                                            max_line_width=100), flush=True)
    ts_f, R_wc, t_wc = slam.frame_trajectory()
    idx = np.round(np.asarray(ts_f) * 30.0).astype(int)
    ok = idx < len(gt)
    print("ATE(recomposed)", ate_rmse(t_wc[ok], gt[idx[ok]],
                                      with_scale=True), flush=True)
    ts_k, R_k, t_k = slam.keyframe_trajectory()
    idk = np.round(np.asarray(ts_k) * 30.0).astype(int)
    okk = idk < len(gt)
    print("ATE(keyframes)", ate_rmse(t_k[okk], gt[idk[okk]],
                                     with_scale=True), flush=True)
    sk, Rk_, trk = align_umeyama(t_k[okk], gt[idk[okk]], True)
    kerr = np.linalg.norm((sk * (Rk_ @ t_k[okk].T)).T + trk - gt[idk[okk]],
                          axis=1)
    for fi, e in zip(idk[okk], kerr):
        print(f"  KF frame={fi:3d} err={e:.4f}", flush=True)
    for m in slam.tracking.metrics:
        keys = ("frame_id", "state", "ok", "n_inliers", "motion_matches",
                "motion_inliers", "fb_used", "local_visible", "new_kf",
                "n_kf", "n_mp", "fused", "chunked")
        print({k: m[k] for k in keys if k in m}, flush=True)


if __name__ == "__main__":
    main()
