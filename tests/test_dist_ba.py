"""Distributed (landmark-sharded) BA on the virtual 8-device CPU mesh.

Validates SURVEY.md §5.7's headline deliverable single-host: the
shard_map + psum camera-system reduction must converge like the
single-device Schur engine.
"""
import jax
import jax.numpy as jnp
import numpy as np

from ar_orbslam2_tpu.parallel import dist_ba
from test_local_ba import build_ba_problem, pose_errors


def run_dist(p, mesh, **kw):
    n_cams = len(p["cam_R0"])
    n_pts, opp = p["obs_cam"].shape
    pt_args = dist_ba.shard_point_arrays(
        mesh,
        jnp.asarray(p["pts0"]), jnp.ones(n_pts, bool),
        jnp.asarray(p["obs_cam"]), jnp.asarray(p["uv"]),
        jnp.zeros((n_pts, opp), jnp.int32), jnp.ones((n_pts, opp), bool))
    cam_args = dist_ba.replicate(
        mesh, jnp.asarray(p["cam_R0"]), jnp.asarray(p["cam_t0"]),
        jnp.asarray(p["fixed"]), jnp.ones(n_cams, bool))
    return dist_ba.dist_bundle_adjust(
        mesh, *cam_args, *pt_args, p["cam"], **kw)


def test_dist_ba_converges_on_8_device_mesh(rng):
    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
    mesh = dist_ba.make_mesh()
    p = build_ba_problem(rng, n_cams=8, n_pts=400, opp=6)
    res = run_dist(p, mesh, n_iters=15)
    rot_err, t_err = pose_errors(res, p)
    assert rot_err.max() < 0.1, rot_err
    assert t_err.max() < 0.01, t_err   # same gate as the 1-device engine
    pt_err = np.linalg.norm(np.asarray(res["pts"]) - p["pts_gt"], axis=1)
    assert np.median(pt_err) < 0.05   # same gate as the 1-device engine


def test_dist_ba_matches_single_device(rng):
    mesh = dist_ba.make_mesh()
    p = build_ba_problem(rng, n_cams=4, n_pts=160, opp=4, outlier_frac=0.0)
    res_d = run_dist(p, mesh, n_iters=12)
    from test_local_ba import run_ba
    res_s = run_ba(p, n_iters_1=6, n_iters_2=6)
    # both should land on the same optimum (not identical iterates)
    t_d = np.asarray(res_d["cam_t"])
    t_s = np.asarray(res_s["cam_t"])
    assert np.linalg.norm(t_d - t_s, axis=1).max() < 5e-3
