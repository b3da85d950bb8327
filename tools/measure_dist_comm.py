"""Measure the distributed-BA exchange: bytes per LM iteration (dense
psum vs banded all_gather) and per-iteration device time of the Schur
assembly + camera solve at C = {64, 256, 1024} cameras.

VERDICT r4 next-step #6: SCALING.md's efficiency table was estimated,
not measured. This produces the measured numbers on whatever backend is
live (the real chip for device time; comm bytes are exact closed forms
of the collective payloads).

Run:  python tools/measure_dist_comm.py [--dev-mesh 8]
"""
from __future__ import annotations

import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_CACHE_DIR", "/tmp/jax_cache")


def timeit(fn, reps=6, warmup=2):
    for _ in range(warmup):
        fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-dev", type=int, default=8,
                    help="mesh size the comm volumes are computed for")
    ap.add_argument("--band-w", type=int, default=64,
                    help="covisibility band width (W); KITTI-scale maps "
                         "measure W~32-128 per 8-shard partition")
    ap.add_argument("--pts", type=int, default=16384)
    ap.add_argument("--opp", type=int, default=8)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    import numpy as np

    from ar_orbslam2_tpu.core.camera import Camera
    from ar_orbslam2_tpu.estimation import ba_core
    from ar_orbslam2_tpu.parallel.scaling_bench import build_problem

    cam = Camera(fx=500.0, fy=500.0, cx=320.0, cy=240.0)
    n_dev, W = args.n_dev, args.band_w
    rows = []
    for C in (64, 256, 1024):
        Wc = min(W, C)
        dense_bytes = (6 * C) ** 2 * 4 + 6 * C * 4        # psum payload
        banded_bytes = n_dev * ((6 * Wc) ** 2 * 4 + 6 * Wc * 4)

        # device time of one Schur assembly + camera solve at this C
        # (single chip; the per-shard work of the banded path is the
        # same kernel at n_cam=W)
        prob = build_problem(n_cams=C, n_pts=args.pts, opp=args.opp)
        oc = jnp.asarray(prob["obs_cam"])
        d = {k: jnp.asarray(v) for k, v in prob.items()}

        @jax.jit
        def schur_solve(cam_R, cam_t, pts, obs_uv, oc, reps=4):
            stereo = jnp.zeros(oc.shape, bool)
            oh = ba_core.obs_one_hot(oc, cam_R.shape[0])

            def body(carry, _):
                r, Jc, Jpt, behind = ba_core.ba_residuals(
                    cam, cam_R, cam_t, pts, oc, obs_uv,
                    jnp.full(oc.shape, -1.0), stereo, oh=oh)
                w = jnp.ones(oc.shape, jnp.float32)
                blocks = ba_core.schur_blocks(r, Jc, Jpt, w, oc,
                                              cam_R.shape[0],
                                              jnp.float32(1e-4), oh=oh)
                dx = ba_core.solve_camera_system(
                    blocks["S"], blocks["b_s"],
                    jnp.ones(cam_R.shape[0], bool), jnp.float32(1e-4))
                return carry + jnp.sum(dx), None

            out, _ = jax.lax.scan(body, jnp.float32(0), None, length=reps)
            return out

        fn = lambda: jax.block_until_ready(schur_solve(
            d["cam_R"], d["cam_t"], d["pts"], d["obs_uv"], oc))
        ms_iter = timeit(fn) / 4 * 1e3
        rows.append(dict(C=C, W=Wc, dense_MB=dense_bytes / 1e6,
                         banded_MB=banded_bytes / 1e6,
                         ratio=dense_bytes / banded_bytes,
                         schur_solve_ms=round(ms_iter, 2)))
        print(f"[comm] C={C}: dense psum {dense_bytes/1e6:.2f} MB/iter, "
              f"banded all_gather {banded_bytes/1e6:.2f} MB/iter "
              f"({dense_bytes/banded_bytes:.1f}x), "
              f"schur+solve {ms_iter:.2f} ms/iter device",
              file=sys.stderr)
    print(json.dumps(dict(n_dev=n_dev, band_w=W, rows=rows,
                          backend=jax.default_backend())))


if __name__ == "__main__":
    main()
