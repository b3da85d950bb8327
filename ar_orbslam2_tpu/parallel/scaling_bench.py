"""Scaling-efficiency harness for the landmark-sharded distributed BA.

Measures wall-clock per LM iteration of parallel/dist_ba.py at mesh sizes
1/2/4/8 on a FIXED synthetic bundle-adjustment problem (strong scaling:
the total landmark count stays constant, each device holds P/n). The
BASELINE.md gate is >=70% scaling efficiency on a 2-host slice; this
harness produces the efficiency table for whatever devices are visible —
a real TPU slice, or the virtual CPU mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=8) where the numbers
validate the comms structure rather than ICI bandwidth.

Run:  python -m ar_orbslam2_tpu.parallel.scaling_bench [--points 65536]
Writes a markdown table to stdout (and --out FILE).
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def build_problem(n_cams=64, n_pts=65536, opp=16, seed=0):
    import jax.numpy as jnp

    from ..core import lie

    rng = np.random.default_rng(seed)
    pts = rng.uniform([-6, -4, 4], [6, 4, 20], (n_pts, 3)).astype(np.float32)
    cam_R = np.zeros((n_cams, 3, 3), np.float32)
    cam_t = np.zeros((n_cams, 3), np.float32)
    for i in range(n_cams):
        w = np.array([0.0, 0.04 * i, 0.0], np.float32)
        cam_R[i] = np.asarray(lie.so3_exp(jnp.asarray(w)))
        cam_t[i, 0] = -0.1 * i
    obs_cam = np.stack([rng.choice(n_cams, opp, replace=False)
                        for _ in range(n_pts)]).astype(np.int32)
    xc = np.einsum("poij,pj->poi", cam_R[obs_cam], pts) + cam_t[obs_cam]
    z = np.maximum(xc[..., 2], 1e-6)
    uv = np.stack([500 * xc[..., 0] / z + 320,
                   500 * xc[..., 1] / z + 240], -1).astype(np.float32)
    uv += rng.normal(0, 0.5, uv.shape).astype(np.float32)
    fixed = np.zeros(n_cams, bool)
    fixed[0] = True
    # noisy initialization so the LM iterations do real work
    pts0 = pts + rng.normal(0, 0.05, pts.shape).astype(np.float32)
    return dict(cam_R=cam_R, cam_t=cam_t, cam_fixed=fixed,
                cam_valid=np.ones(n_cams, bool), pts=pts0,
                pt_valid=np.ones(n_pts, bool), obs_cam=obs_cam,
                obs_uv=uv, obs_oct=np.zeros((n_pts, opp), np.int32),
                obs_valid=np.ones((n_pts, opp), bool),
                obs_uvr=np.full((n_pts, opp), -1.0, np.float32))


def run_at_mesh_size(prob, n_dev, cam, n_iters=10, repeats=3):
    import jax

    from . import dist_ba

    devices = jax.devices()[:n_dev]
    mesh = dist_ba.make_mesh(devices)
    pt_args = dist_ba.shard_point_arrays(
        mesh, prob["pts"], prob["pt_valid"], prob["obs_cam"],
        prob["obs_uv"], prob["obs_oct"], prob["obs_valid"],
        prob["obs_uvr"])
    cam_args = dist_ba.replicate(mesh, prob["cam_R"], prob["cam_t"],
                                 prob["cam_fixed"], prob["cam_valid"])

    def once():
        res = dist_ba.dist_bundle_adjust(
            mesh, *cam_args, pt_args[0], pt_args[1], pt_args[2],
            pt_args[3], pt_args[4], pt_args[5], cam,
            obs_uvr=pt_args[6], n_iters=n_iters)
        jax.block_until_ready(res["cam_R"])
        return float(np.asarray(res["cost"]))

    cost = once()                       # compile + correctness
    best = min(_timed(once) for _ in range(repeats))
    return best / n_iters, cost


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=65536)
    ap.add_argument("--cams", type=int, default=64)
    ap.add_argument("--opp", type=int, default=16)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--distributed", action="store_true",
                    help="initialize jax.distributed from the "
                         "JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES/"
                         "JAX_PROCESS_ID env (multi-host slice); the "
                         "bench then measures ONLY the full global mesh")
    args = ap.parse_args(argv)

    if args.distributed:
        from .multihost import initialize_from_env
        if not initialize_from_env():
            print("[scaling] --distributed: no coordinator in env; "
                  "continuing single-process", file=sys.stderr)

    import jax

    from ..core.camera import Camera

    cam = Camera(fx=500.0, fy=500.0, cx=320.0, cy=240.0)
    prob = build_problem(args.cams, args.points, args.opp)
    n_avail = len(jax.devices())
    if args.distributed and jax.process_count() > 1:
        # a cross-process mesh must span every process's devices — only
        # the full mesh is measurable
        sizes = [n_avail]
    else:
        sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_avail]

    rows = []
    t1 = None
    for n in sizes:
        per_iter, cost = run_at_mesh_size(prob, n, cam, n_iters=args.iters)
        if t1 is None:
            t1 = per_iter
        speedup = t1 / per_iter
        eff = speedup / n
        rows.append((n, per_iter * 1e3, speedup, eff, cost))
        print(f"[scaling] n={n}: {per_iter*1e3:.1f} ms/iter "
              f"speedup={speedup:.2f} eff={eff:.0%} cost={cost:.1f}",
              file=sys.stderr)

    backend = jax.default_backend()
    lines = [
        f"# Distributed BA strong scaling ({backend}, "
        f"{args.points} landmarks x {args.cams} cameras, "
        f"{args.opp} obs/landmark)",
        "",
        "| devices | ms / LM iter | speedup | efficiency |",
        "|---|---|---|---|",
    ]
    for n, ms, sp, eff, _ in rows:
        lines.append(f"| {n} | {ms:.1f} | {sp:.2f}x | {eff:.0%} |")
    lines.append("")
    lines.append("Comms per iteration: one psum of the (6C)^2 camera "
                 "system — independent of the landmark count "
                 "(parallel/dist_ba.py).")
    table = "\n".join(lines)
    print(table)
    if args.out:
        with open(args.out, "w") as f:
            f.write(table + "\n")


if __name__ == "__main__":
    main()
