"""Full-map bundle adjustment gather + run.

Parity: Optimizer::GlobalBundleAdjustemnt (src/Optimizer.cc, sic) and
LoopClosing::RunGlobalBundleAdjustment (src/LoopClosing.cc:≈600): optimize
every keyframe pose + landmark against all observations. Shapes are padded
to power-of-two buckets so repeated global BAs reuse compiled executables.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..estimation.local_ba import bundle_adjust


def _bucket(n, lo=16):
    b = lo
    while b < n:
        b *= 2
    return b


def gather_global(store, obs_bucket=16):
    """Pack the whole map into the fixed-shape BA problem."""
    s = store
    kf_ids = s.keyframe_ids()
    mp_ids = s.map_point_ids()
    C = _bucket(len(kf_ids))
    P = _bucket(len(mp_ids), lo=256)
    O = s.cfg.max_obs

    kf_arr = np.full(C, -1, np.int64)
    kf_arr[:len(kf_ids)] = kf_ids
    sel = np.maximum(kf_arr, 0)
    cam_R = s.kf_R[sel].copy()
    cam_t = s.kf_t[sel].copy()
    cam_valid = kf_arr >= 0
    cam_fixed = ~cam_valid
    cam_fixed[np.nonzero(kf_arr == 0)[0]] = True      # gauge: KF0 fixed

    mp_arr = np.full(P, -1, np.int64)
    mp_arr[:len(mp_ids)] = mp_ids
    selp = np.maximum(mp_arr, 0)
    pts = s.mp_pos[selp].copy()
    pt_valid = mp_arr >= 0

    slot_of = np.full(s.cfg.max_keyframes, -1, np.int64)
    slot_of[kf_ids] = np.arange(len(kf_ids))
    # trim the prefix-compacted observation axis to a FIXED width (same
    # rationale as gather_local_window: BA cost is linear in the
    # observation slots, and a fixed width avoids minting new compiled
    # shapes as the map matures)
    O = min(O, obs_bucket)
    okf = s.mp_obs_kf[selp, :O]
    oft = np.maximum(s.mp_obs_feat[selp, :O], 0)
    obs_cam = np.where(okf >= 0, slot_of[np.maximum(okf, 0)], -1)
    obs_valid = (obs_cam >= 0) & pt_valid[:, None]
    obs_uv = s.kf_uv[np.maximum(okf, 0), oft]
    obs_oct = s.kf_octave[np.maximum(okf, 0), oft]
    obs_uvr = np.where(okf >= 0, s.kf_uvr[np.maximum(okf, 0), oft],
                       -1.0).astype(np.float32)
    return dict(kf_arr=kf_arr, mp_arr=mp_arr, n_kf=len(kf_ids),
                n_mp=len(mp_ids), cam_R=cam_R, cam_t=cam_t,
                cam_fixed=cam_fixed, cam_valid=cam_valid, pts=pts,
                pt_valid=pt_valid, obs_cam=obs_cam.astype(np.int32),
                obs_uv=obs_uv, obs_oct=obs_oct, obs_valid=obs_valid,
                obs_uvr=obs_uvr, obs_kf=okf)


def dispatch_global_ba(g, cam, n_iters=20, distributed=None):
    """Dispatch the full-map BA (async; returns device arrays).

    distributed=None auto-routes: with >1 visible device the landmark axis
    is sharded over the mesh and the camera system psum-reduced
    (parallel/dist_ba.py — the SURVEY §5.7 landmark-sharded Schur design);
    single-device falls back to estimation/local_ba.bundle_adjust.
    """
    import jax
    n_dev = len(jax.devices())
    P = g["pts"].shape[0]
    use_dist = distributed if distributed is not None \
        else (n_dev > 1 and P % n_dev == 0)
    if use_dist:
        from ..parallel import dist_ba
        mesh = dist_ba.make_mesh()
        pts, pt_valid, obs_cam, obs_uv, obs_oct, obs_valid, obs_uvr = \
            dist_ba.shard_point_arrays(
                mesh, g["pts"], g["pt_valid"], g["obs_cam"], g["obs_uv"],
                g["obs_oct"], g["obs_valid"], g["obs_uvr"])
        cam_R, cam_t, cam_fixed, cam_valid = dist_ba.replicate(
            mesh, g["cam_R"], g["cam_t"], g["cam_fixed"], g["cam_valid"])
        return dist_ba.dist_bundle_adjust(
            mesh, cam_R, cam_t, cam_fixed, cam_valid, pts, pt_valid,
            obs_cam, obs_uv, obs_oct, obs_valid, cam, obs_uvr=obs_uvr,
            n_iters=n_iters)
    d = jax.device_put(dict(
        cam_R=g["cam_R"], cam_t=g["cam_t"], cam_fixed=g["cam_fixed"],
        cam_valid=g["cam_valid"], pts=g["pts"], pt_valid=g["pt_valid"],
        obs_cam=g["obs_cam"], obs_uv=g["obs_uv"], obs_oct=g["obs_oct"],
        obs_valid=g["obs_valid"], obs_uvr=g["obs_uvr"]))
    return bundle_adjust(
        d["cam_R"], d["cam_t"], d["cam_fixed"], d["cam_valid"],
        d["pts"], d["pt_valid"], d["obs_cam"], d["obs_uv"],
        d["obs_oct"], d["obs_valid"], cam, obs_uvr=d["obs_uvr"],
        n_iters_1=n_iters // 2, n_iters_2=n_iters - n_iters // 2)


def global_bundle_adjustment(store, cam, n_iters=20, distributed=None):
    """Run full BA and write results back into the store."""
    g = gather_global(store)
    res = dispatch_global_ba(g, cam, n_iters=n_iters,
                             distributed=distributed)
    from ..core.lie import project_so3
    cam_R = project_so3(np.asarray(res["cam_R"]))
    cam_t = np.asarray(res["cam_t"])
    pts = np.asarray(res["pts"])
    s = store
    nk, nm = g["n_kf"], g["n_mp"]
    kf_ids = g["kf_arr"][:nk]
    ok_R = np.isfinite(cam_R[:nk]).all((-1, -2))
    s.kf_R[kf_ids[ok_R]] = cam_R[:nk][ok_R]
    s.kf_t[kf_ids[ok_R]] = cam_t[:nk][ok_R]
    mp_ids = g["mp_arr"][:nm]
    ok_p = np.isfinite(pts[:nm]).all(-1)
    s.mp_pos[mp_ids[ok_p]] = pts[:nm][ok_p]
    s.bump()   # poses/landmarks moved -> invalidate device bundle caches
    return float(np.asarray(res["cost"]))
