"""Distributed Schur-complement bundle adjustment over a device mesh.

The TPU-native replacement for the scaling story the reference never had
(SURVEY.md §2.5 / §5.7): ORB-SLAM2 runs BA on one CPU thread via g2o; here
the landmark axis of the camera-landmark system is sharded across the mesh
("mp" axis), each device assembles the Schur contributions of its landmark
shard, the camera-reduced system S / b_s is summed with `jax.lax.psum`
(XLA lowers this to an all-reduce riding ICI), every device solves the
small replicated camera system, and landmark back-substitution stays
device-local (zero communication).

Communication per LM iteration: one psum of (C*6)^2 + C*6 floats + a few
scalars — independent of the landmark count, which is what makes the
scaling efficient: compute grows with P/n_devices, comms stay constant.

Usage: build a Mesh over the devices, shard the P-axis arrays with
NamedSharding(mesh, P("mp")), replicate camera arrays, then call
`dist_bundle_adjust`. Works identically on a virtual CPU mesh
(xla_force_host_platform_device_count) and a real slice.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core import lie
from ..core.robust import CHI2_2DOF, CHI2_3DOF, huber_weight
from ..estimation import ba_core

AXIS = "mp"


def make_mesh(devices=None, axis: str = AXIS) -> Mesh:
    import numpy as np
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis,))


def shard_point_arrays(mesh, *arrays, axis: str = AXIS):
    """Place P-axis arrays with their leading dim sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return tuple(jax.device_put(a, sharding) for a in arrays)


def replicate(mesh, *arrays):
    sharding = NamedSharding(mesh, P())
    return tuple(jax.device_put(a, sharding) for a in arrays)


def dist_bundle_adjust(mesh, cam_R, cam_t, cam_fixed, cam_valid,
                       pts, pt_valid,
                       obs_cam, obs_uv, obs_octave, obs_valid,
                       cam, obs_uvr=None,
                       n_iters=10, scale_factor=1.2, axis=AXIS):
    """LM bundle adjustment with the landmark axis sharded over `mesh`.

    Same problem layout as estimation.local_ba.bundle_adjust; P must be
    divisible by the mesh size (pad with pt_valid=False rows).
    Returns dict(cam_R, cam_t, pts, obs_inlier, cost).
    """
    n_dev = mesh.devices.size
    P_total = pts.shape[0]
    assert P_total % n_dev == 0, "pad landmark axis to a multiple of mesh size"
    C = cam_R.shape[0]
    if obs_uvr is None:
        obs_uvr = jnp.full(obs_cam.shape, -1.0, jnp.float32)

    shard_map = jax.shard_map
    pspec = jax.sharding.PartitionSpec
    pt_sh = pspec(axis)
    rep = pspec()

    @partial(shard_map, mesh=mesh,
             in_specs=(rep, rep, rep, rep,
                       pt_sh, pt_sh, pt_sh, pt_sh, pt_sh, pt_sh, pt_sh),
             out_specs=(rep, rep, pt_sh, pt_sh, rep),
             check_vma=False)
    def run(cam_R, cam_t, cam_fixed, cam_valid,
            pts, pt_valid, obs_cam, obs_uv, obs_octave, obs_valid, obs_uvr):
        oc = jnp.maximum(obs_cam, 0)
        stereo = obs_uvr > 0
        inv_sigma2 = scale_factor ** (-2.0 * obs_octave.astype(jnp.float32))
        chi2_th = jnp.where(stereo, CHI2_3DOF, CHI2_2DOF)
        P_loc, OPP = oc.shape
        use_oh = P_loc * OPP * C * 4 <= 512 * 1024 * 1024
        oh = ba_core.obs_one_hot(oc, C) if use_oh else None
        cam_valid_o = jnp.einsum("poc,c->po", oh,
                                 cam_valid.astype(jnp.float32)) \
            if use_oh else cam_valid[oc].astype(jnp.float32)
        cam_fixed_o = jnp.einsum("poc,c->po", oh,
                                 cam_fixed.astype(jnp.float32)) \
            if use_oh else cam_fixed[oc].astype(jnp.float32)

        def residuals(R_all, t_all, X):
            return ba_core.ba_residuals(cam, R_all, t_all, X, oc,
                                        obs_uv, obs_uvr, stereo, oh=oh)

        def edge_chi2(r):
            return jnp.sum(r * r, -1) * inv_sigma2

        def lm_step(carry, _):
            # rjac: model at the current accepted state (single residual
            # evaluation per iteration — same scheme as local_ba)
            R_all, t_all, X, inlier, lam, rjac = carry
            r, Jc, Jpt, behind = rjac
            c2 = edge_chi2(r)
            w_h = huber_weight(c2, chi2_th)
            w = inv_sigma2 * w_h * inlier * obs_valid * (~behind) \
                * pt_valid[:, None] * cam_valid_o
            Jcz = jnp.where(cam_fixed_o[..., None, None] > 0, 0.0, Jc)

            blocks = ba_core.schur_blocks(r, Jcz, Jpt, w, oc, C, lam,
                                          oh=oh)
            # the ONLY cross-device reduction: camera system contributions
            S = jax.lax.psum(blocks["S"], axis)
            b_s = jax.lax.psum(blocks["b_s"], axis)
            dx_c = ba_core.solve_camera_system(
                S, b_s, cam_valid & (~cam_fixed), lam)
            dx_p = ba_core.backsub_points(blocks, dx_c, oc, oh=oh)

            dR, dt = lie.se3_exp(dx_c)
            R_new, t_new = lie.se3_mul(dR, dt, R_all, t_all)
            R_new = jnp.where(cam_fixed[:, None, None], R_all, R_new)
            t_new = jnp.where(cam_fixed[:, None], t_all, t_new)
            X_new = jnp.where(pt_valid[:, None], X + dx_p, X)

            mask = inlier * obs_valid * pt_valid[:, None] * cam_valid_o
            rjac_new = residuals(R_new, t_new, X_new)
            r2, _, _, behind2 = rjac_new
            c2n = edge_chi2(r2)
            w_hn = huber_weight(c2n, chi2_th)
            cost_old = jax.lax.psum(jnp.sum(c2 * w_h * mask * (~behind)),
                                    axis)
            cost_new = jax.lax.psum(jnp.sum(c2n * w_hn * mask * (~behind2)),
                                    axis)
            accept = cost_new < cost_old
            R_all = jnp.where(accept, R_new, R_all)
            t_all = jnp.where(accept, t_new, t_all)
            X = jnp.where(accept, X_new, X)
            rjac = jax.tree.map(lambda a, b: jnp.where(accept, a, b),
                                rjac_new, rjac)
            lam = jnp.clip(jnp.where(accept, lam * 0.4, lam * 5.0),
                           1e-7, 1e4)
            return (R_all, t_all, X, inlier, lam, rjac), cost_new

        inlier = obs_valid
        rjac = residuals(cam_R, cam_t, pts)
        carry = (cam_R, cam_t, pts, inlier, jnp.float32(1e-4), rjac)
        n1 = max(n_iters // 3, 1)
        carry, _ = jax.lax.scan(lm_step, carry, None, length=n1)
        # mid-way outlier strip (parity: LocalBundleAdjustment chi2 gate)
        R_all, t_all, X, _, lam, rjac = carry
        r, _, _, behind = rjac
        inlier = (edge_chi2(r) <= chi2_th) & (~behind) & obs_valid
        carry = (R_all, t_all, X, inlier, lam, rjac)
        carry, _ = jax.lax.scan(lm_step, carry, None, length=n_iters - n1)
        R_all, t_all, X, inlier, lam, rjac = carry
        r, _, _, behind = rjac
        c2 = edge_chi2(r)
        inlier = (c2 <= chi2_th) & (~behind) & obs_valid
        cost = jax.lax.psum(jnp.sum(jnp.where(inlier, c2, 0.0)), axis)
        return R_all, t_all, X, inlier, cost

    R, t, X, inl, cost = run(cam_R, cam_t, cam_fixed, cam_valid,
                             pts, pt_valid, obs_cam, obs_uv,
                             obs_octave, obs_valid, obs_uvr)
    return dict(cam_R=R, cam_t=t, pts=X, obs_inlier=inl, cost=cost)


def dist_bundle_adjust_banded(mesh, cam_R, cam_t, cam_fixed, cam_valid,
                              pts, pt_valid,
                              obs_cam, obs_uv, obs_octave, obs_valid,
                              cam, band_off, band_w, obs_uvr=None,
                              n_iters=10, scale_factor=1.2, axis=AXIS):
    """Landmark-sharded BA with a BANDED (compressed) camera exchange.

    Requires the covisibility-partitioned layout (partition.banded_layout):
    the camera axis is permuted to covisibility-BFS order and every
    device's landmark shard only observes cameras inside its contiguous
    band [band_off[d], band_off[d] + band_w). Each device assembles its
    Schur contribution in BAND-LOCAL coordinates — a (6W)^2 system
    instead of (6C)^2 — and the per-iteration exchange is an all_gather
    of the bands (n_dev * (6W)^2 + 6W floats) plus scalar cost psums,
    SUBLINEAR in C for fixed window width W. The dense psum path
    (dist_bundle_adjust) exchanges (6C)^2 regardless of locality; for
    KITTI-scale C~1-2k that is 100+ MB per iteration, while the banded
    exchange stays at the covisibility window size (SURVEY §5.7
    map-block sharding / halo exchange design).

    band_off: (n_dev,) int32 band start per device (sharded over mesh).
    band_w: static int, common band width; obs_cam must be BAND-LOCAL
    indices in [0, W) (caller subtracts band_off before sharding).
    cam_R/cam_t/... are in the PERMUTED camera order; the caller
    un-permutes results.
    """
    n_dev = mesh.devices.size
    P_total = pts.shape[0]
    assert P_total % n_dev == 0, "pad landmark axis to a multiple of mesh size"
    C = cam_R.shape[0]
    W = int(band_w)
    if obs_uvr is None:
        obs_uvr = jnp.full(obs_cam.shape, -1.0, jnp.float32)

    shard_map = jax.shard_map
    pspec = jax.sharding.PartitionSpec
    pt_sh = pspec(axis)
    rep = pspec()

    @partial(shard_map, mesh=mesh,
             in_specs=(rep, rep, rep, rep,
                       pt_sh, pt_sh, pt_sh, pt_sh, pt_sh, pt_sh, pt_sh,
                       pt_sh),
             out_specs=(rep, rep, pt_sh, pt_sh, rep),
             check_vma=False)
    def run(cam_R, cam_t, cam_fixed, cam_valid,
            pts, pt_valid, obs_cam, obs_uv, obs_octave, obs_valid,
            obs_uvr, band_off):
        off = band_off[0]
        oc = jnp.maximum(obs_cam, 0)            # band-local indices
        stereo = obs_uvr > 0
        inv_sigma2 = scale_factor ** (-2.0 * obs_octave.astype(jnp.float32))
        chi2_th = jnp.where(stereo, CHI2_3DOF, CHI2_2DOF)
        oh = ba_core.obs_one_hot(oc, W)
        # band slices of the per-camera masks (gathered once)
        fix_b = jax.lax.dynamic_slice_in_dim(cam_fixed, off, W)
        val_b = jax.lax.dynamic_slice_in_dim(cam_valid, off, W)
        cam_valid_o = val_b[oc].astype(jnp.float32)
        cam_fixed_o = fix_b[oc].astype(jnp.float32)

        def residuals(R_all, t_all, X):
            R_b = jax.lax.dynamic_slice_in_dim(R_all, off, W)
            t_b = jax.lax.dynamic_slice_in_dim(t_all, off, W)
            return ba_core.ba_residuals(cam, R_b, t_b, X, oc,
                                        obs_uv, obs_uvr, stereo, oh=oh)

        def edge_chi2(r):
            return jnp.sum(r * r, -1) * inv_sigma2

        def assemble(S_w, b_w):
            """All-gather the (W-band) camera systems and place each at
            its offset in the full (C) system — the ONLY O(W^2) exchange."""
            S_all = jax.lax.all_gather(S_w, axis)        # (n_dev,W,W,6,6)
            b_all = jax.lax.all_gather(b_w, axis)        # (n_dev,W,6)
            off_all = jax.lax.all_gather(off, axis)      # (n_dev,)

            def place(i, carry):
                S_f, b_f = carry
                o = off_all[i]
                patch = jax.lax.dynamic_slice(
                    S_f, (o, o, 0, 0), (W, W, 6, 6))
                S_f = jax.lax.dynamic_update_slice(
                    S_f, patch + S_all[i], (o, o, 0, 0))
                bp = jax.lax.dynamic_slice(b_f, (o, 0), (W, 6))
                b_f = jax.lax.dynamic_update_slice(b_f, bp + b_all[i],
                                                   (o, 0))
                return S_f, b_f

            init = (jnp.zeros((C, C, 6, 6), S_w.dtype),
                    jnp.zeros((C, 6), b_w.dtype))
            return jax.lax.fori_loop(0, n_dev, place, init)

        def lm_step(carry, _):
            R_all, t_all, X, inlier, lam, rjac = carry
            r, Jc, Jpt, behind = rjac
            c2 = edge_chi2(r)
            w_h = huber_weight(c2, chi2_th)
            w = inv_sigma2 * w_h * inlier * obs_valid * (~behind) \
                * pt_valid[:, None] * cam_valid_o
            Jcz = jnp.where(cam_fixed_o[..., None, None] > 0, 0.0, Jc)

            blocks = ba_core.schur_blocks(r, Jcz, Jpt, w, oc, W, lam,
                                          oh=oh)
            S, b_s = assemble(blocks["S"], blocks["b_s"])
            dx_c = ba_core.solve_camera_system(
                S, b_s, cam_valid & (~cam_fixed), lam)
            dx_b = jax.lax.dynamic_slice(dx_c, (off, 0), (W, 6))
            dx_p = ba_core.backsub_points(blocks, dx_b, oc, oh=oh)

            dR, dt = lie.se3_exp(dx_c)
            R_new, t_new = lie.se3_mul(dR, dt, R_all, t_all)
            R_new = jnp.where(cam_fixed[:, None, None], R_all, R_new)
            t_new = jnp.where(cam_fixed[:, None], t_all, t_new)
            X_new = jnp.where(pt_valid[:, None], X + dx_p, X)

            mask = inlier * obs_valid * pt_valid[:, None] * cam_valid_o
            rjac_new = residuals(R_new, t_new, X_new)
            r2, _, _, behind2 = rjac_new
            c2n = edge_chi2(r2)
            w_hn = huber_weight(c2n, chi2_th)
            cost_old = jax.lax.psum(jnp.sum(c2 * w_h * mask * (~behind)),
                                    axis)
            cost_new = jax.lax.psum(jnp.sum(c2n * w_hn * mask * (~behind2)),
                                    axis)
            accept = cost_new < cost_old
            R_all = jnp.where(accept, R_new, R_all)
            t_all = jnp.where(accept, t_new, t_all)
            X = jnp.where(accept, X_new, X)
            rjac = jax.tree.map(lambda a, b: jnp.where(accept, a, b),
                                rjac_new, rjac)
            lam = jnp.clip(jnp.where(accept, lam * 0.4, lam * 5.0),
                           1e-7, 1e4)
            return (R_all, t_all, X, inlier, lam, rjac), cost_new

        inlier = obs_valid
        rjac = residuals(cam_R, cam_t, pts)
        carry = (cam_R, cam_t, pts, inlier, jnp.float32(1e-4), rjac)
        n1 = max(n_iters // 3, 1)
        carry, _ = jax.lax.scan(lm_step, carry, None, length=n1)
        R_all, t_all, X, _, lam, rjac = carry
        r, _, _, behind = rjac
        inlier = (edge_chi2(r) <= chi2_th) & (~behind) & obs_valid
        carry = (R_all, t_all, X, inlier, lam, rjac)
        carry, _ = jax.lax.scan(lm_step, carry, None, length=n_iters - n1)
        R_all, t_all, X, inlier, lam, rjac = carry
        r, _, _, behind = rjac
        c2 = edge_chi2(r)
        inlier = (c2 <= chi2_th) & (~behind) & obs_valid
        cost = jax.lax.psum(jnp.sum(jnp.where(inlier, c2, 0.0)), axis)
        return R_all, t_all, X, inlier, cost

    R, t, X, inl, cost = run(cam_R, cam_t, cam_fixed, cam_valid,
                             pts, pt_valid, obs_cam, obs_uv,
                             obs_octave, obs_valid, obs_uvr, band_off)
    return dict(cam_R=R, cam_t=t, pts=X, obs_inlier=inl, cost=cost)
