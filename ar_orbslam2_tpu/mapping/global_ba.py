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


def gather_global(store, obs_bucket=None):
    """Pack the whole map into the fixed-shape BA problem.

    obs_bucket: cap on the observation axis. Default None = the store's
    full max_obs: global BA runs rarely (loop acceptance / background
    GBA) and must see ALL observations — with prefix-compacted
    insertion-order slots, a 16-wide cap silently dropped exactly the
    late cross-loop re-observations that loop-closure GBA exists to
    optimize (the reference optimizes every observation,
    Optimizer::BundleAdjustment src/Optimizer.cc:≈60). The fixed-16
    width remains the LOCAL window's latency optimization
    (LocalMapperConfig.ba_obs_bucket)."""
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
    # fixed observation width (max_obs unless capped): BA cost is linear
    # in the observation slots, and a fixed width avoids minting new
    # compiled shapes as the map matures
    if obs_bucket is not None:
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


def gather_global_partitioned(store, n_shards):
    """gather_global in the covisibility-partitioned BANDED layout
    (partition.banded_layout): camera axis permuted to covisibility-BFS
    order, landmark axis grouped into n_shards equal-size blocks whose
    camera footprints are contiguous bands, observations in BAND-LOCAL
    camera indices. Feeds dist_ba.dist_bundle_adjust_banded, whose
    per-iteration exchange is n_shards*(6W)^2 instead of (6C)^2 —
    sublinear in the keyframe count for a fixed covisibility window
    (SURVEY §5.7 map-block sharding; scaled-out analog of the
    reference's local-BA covisibility windowing, src/Optimizer.cc:≈450).

    Returns None when the map is empty. The caller decides whether the
    exchange is ECONOMICAL (n_shards * W^2 < C^2) — on small maps the
    dense psum is cheaper, but the banded path stays exact either way."""
    from ..parallel.partition import banded_layout
    s = store
    lay = banded_layout(s, n_shards)
    if lay is None:
        return None
    kf_order = lay["kf_order"]
    n_kf = len(kf_order)
    C = _bucket(n_kf)
    W = min(lay["band_w"], C)
    O = s.cfg.max_obs

    cam_R = np.tile(np.eye(3, dtype=np.float32), (C, 1, 1))
    cam_t = np.zeros((C, 3), np.float32)
    cam_R[:n_kf] = s.kf_R[kf_order]
    cam_t[:n_kf] = s.kf_t[kf_order]
    cam_valid = np.zeros(C, bool)
    cam_valid[:n_kf] = True
    cam_fixed = ~cam_valid
    cam_fixed[np.nonzero(kf_order == 0)[0]] = True    # gauge: KF0 fixed

    pos_of = np.full(s.cfg.max_keyframes, -1, np.int64)
    pos_of[kf_order] = np.arange(n_kf)

    shard_mp = lay["shard_mp"]                        # (n_shards, P_s)
    band_off = lay["band_off"].astype(np.int32)       # (n_shards,)
    mp_arr = shard_mp.reshape(-1)
    P = len(mp_arr)
    selp = np.maximum(mp_arr, 0)
    pts = s.mp_pos[selp].copy()
    pt_valid = mp_arr >= 0

    okf = s.mp_obs_kf[selp, :O]
    oft = np.maximum(s.mp_obs_feat[selp, :O], 0)
    pos = np.where(okf >= 0, pos_of[np.maximum(okf, 0)], -1)
    # band-local camera indices (per shard)
    off_row = np.repeat(band_off, shard_mp.shape[1])[:, None]
    obs_cam = np.where(pos >= 0, pos - off_row, -1).astype(np.int32)
    obs_valid = (pos >= 0) & pt_valid[:, None] \
        & (obs_cam >= 0) & (obs_cam < W)
    obs_cam = np.where(obs_valid, obs_cam, -1)
    obs_uv = s.kf_uv[np.maximum(okf, 0), oft]
    obs_oct = s.kf_octave[np.maximum(okf, 0), oft]
    obs_uvr = np.where(okf >= 0, s.kf_uvr[np.maximum(okf, 0), oft],
                       -1.0).astype(np.float32)
    return dict(kf_order=kf_order, mp_arr=mp_arr, n_kf=n_kf,
                cam_R=cam_R, cam_t=cam_t, cam_fixed=cam_fixed,
                cam_valid=cam_valid, pts=pts, pt_valid=pt_valid,
                obs_cam=obs_cam, obs_uv=obs_uv, obs_oct=obs_oct,
                obs_valid=obs_valid, obs_uvr=obs_uvr,
                band_off=band_off, band_w=W)


def dispatch_global_ba(g, cam, n_iters=20, distributed=None, gp=None):
    """Dispatch the full-map BA (async; returns device arrays).

    distributed=None auto-routes: with >1 visible device the landmark axis
    is sharded over the mesh and the camera system reduced over it
    (parallel/dist_ba.py — the SURVEY §5.7 landmark-sharded Schur design);
    single-device falls back to estimation/local_ba.bundle_adjust.
    gp: optional partitioned layout (gather_global_partitioned); when
    given and the mesh matches, uses the BANDED camera exchange.
    """
    import jax
    n_dev = len(jax.devices())
    P = g["pts"].shape[0]
    use_dist = distributed if distributed is not None \
        else (n_dev > 1 and P % n_dev == 0)
    if use_dist and gp is not None \
            and gp["pts"].shape[0] % n_dev == 0 \
            and len(gp["band_off"]) == n_dev:
        from ..parallel import dist_ba
        mesh = dist_ba.make_mesh()
        pts, pt_valid, obs_cam, obs_uv, obs_oct, obs_valid, obs_uvr = \
            dist_ba.shard_point_arrays(
                mesh, gp["pts"], gp["pt_valid"], gp["obs_cam"],
                gp["obs_uv"], gp["obs_oct"], gp["obs_valid"],
                gp["obs_uvr"])
        (band_off,) = dist_ba.shard_point_arrays(mesh, gp["band_off"])
        cam_R, cam_t, cam_fixed, cam_valid = dist_ba.replicate(
            mesh, gp["cam_R"], gp["cam_t"], gp["cam_fixed"],
            gp["cam_valid"])
        return dist_ba.dist_bundle_adjust_banded(
            mesh, cam_R, cam_t, cam_fixed, cam_valid, pts, pt_valid,
            obs_cam, obs_uv, obs_oct, obs_valid, cam,
            band_off=band_off, band_w=gp["band_w"], obs_uvr=obs_uvr,
            n_iters=n_iters)
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


def global_bundle_adjustment(store, cam, n_iters=20, distributed=None,
                             banded=None):
    """Run full BA and write results back into the store.

    banded: None = auto (use the covisibility-banded exchange when the
    layout is local enough to beat the dense psum); True/False forces."""
    import jax
    n_dev = len(jax.devices())
    use_dist = distributed if distributed is not None else n_dev > 1
    gp = None
    if use_dist and n_dev > 1 and banded is not False:
        gp = gather_global_partitioned(store, n_dev)
        if gp is None and banded is True:
            raise ValueError("banded layout unavailable for this map")
        if gp is not None and banded is None:
            C = gp["cam_R"].shape[0]
            W = gp["band_w"]
            if n_dev * W * W >= C * C:
                gp = None      # dense psum cheaper on this small map
    from ..core.lie import project_so3
    s = store
    if gp is not None:
        res = dispatch_global_ba(gp, cam, n_iters=n_iters,
                                 distributed=distributed, gp=gp)
        cam_R = project_so3(np.asarray(res["cam_R"]))
        cam_t = np.asarray(res["cam_t"])
        pts = np.asarray(res["pts"])
        kf_ids = gp["kf_order"]
        nk = gp["n_kf"]
        ok_R = np.isfinite(cam_R[:nk]).all((-1, -2))
        s.kf_R[kf_ids[ok_R]] = cam_R[:nk][ok_R]
        s.kf_t[kf_ids[ok_R]] = cam_t[:nk][ok_R]
        mp_arr = gp["mp_arr"]
        live = mp_arr >= 0
        ok_p = live & np.isfinite(pts).all(-1)
        s.mp_pos[mp_arr[ok_p]] = pts[ok_p]
        s.bump()
        return float(np.asarray(res["cost"]))
    g = gather_global(store)
    res = dispatch_global_ba(g, cam, n_iters=n_iters,
                             distributed=distributed)
    cam_R = project_so3(np.asarray(res["cam_R"]))
    cam_t = np.asarray(res["cam_t"])
    pts = np.asarray(res["pts"])
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
