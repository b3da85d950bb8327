"""Second-stage profile: isolate DEVICE compute from the ~26 ms dispatch
RTT by scanning each stage K times inside ONE jit and dividing.

Run:  python tools/profile_device.py
"""
from __future__ import annotations

import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

import json
import os
import sys
import time

os.environ.setdefault("JAX_CACHE_DIR", "/tmp/jax_cache")


def timeit(fn, reps=8, warmup=2):
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
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    import numpy as np

    from ar_orbslam2_tpu.core.camera import Camera
    from ar_orbslam2_tpu.data import synthetic
    from ar_orbslam2_tpu.frontend.orb import OrbConfig, extract_orb
    from ar_orbslam2_tpu.frontend import orb as orb_mod
    from ar_orbslam2_tpu.system import fused
    from ar_orbslam2_tpu.system.slam import SlamConfig, SlamSystem
    from ar_orbslam2_tpu.system.tracking import TrackingConfig

    RTT = None
    rows = {}

    def row(name, ms, note=""):
        rows[name] = round(ms, 3)
        print(f"{name:<40} {ms:9.3f} ms   {note}", file=sys.stderr)

    cam = Camera(fx=500.0, fy=500.0, cx=320.0, cy=240.0,
                 width=640, height=480)
    cfg = TrackingConfig()
    orb_cfg = OrbConfig(n_features=cfg.max_kp)

    # RTT floor
    f_noop = jax.jit(lambda x: x + 1)
    xd = jax.device_put(np.zeros(8, np.float32))
    f_noop(xd).block_until_ready()
    RTT = timeit(lambda: f_noop(xd).block_until_ready(), 12)
    row("RTT floor", RTT * 1e3)

    # upload bandwidth with 10 MB
    big = np.zeros(10 * 1024 * 1024, np.uint8)
    t_big = timeit(lambda: jax.device_put(big).block_until_ready(), 5)
    bw = big.nbytes / (t_big - RTT) / 1e6 if t_big > RTT else float("inf")
    row("upload 10MB", t_big * 1e3, f"~{bw:.0f} MB/s")
    t_down = timeit(lambda: np.asarray(f_noop(jax.device_put(big))), 5)
    row("roundtrip 10MB (up+add+down)", t_down * 1e3)

    # build live tracking state
    imgs30, _, _ = synthetic.render_plane_sequence(cam, n_frames=30,
                                                   seed=0, motion=0.6)
    slam = SlamSystem(cam, SlamConfig())
    for i in range(30):
        slam.track_monocular(imgs30[i], timestamp=i / 30.0)
    fe = slam.tracking.fused
    assert fe is not None and fe.state is not None, "fused state not live"

    K = 8
    img_stack = jax.device_put(np.stack(imgs30[:K]))
    jax.block_until_ready(img_stack)

    # ---- extraction-only scan -----------------------------------------
    @jax.jit
    def extract_scan(imgs):
        def body(c, img):
            f = extract_orb(img, orb_cfg)
            return c, (f["uv"].sum(), f["desc_bits"].sum())
        _, out = jax.lax.scan(body, 0, imgs)
        return out
    jax.block_until_ready(extract_scan(img_stack))
    t = timeit(lambda: jax.block_until_ready(extract_scan(img_stack)))
    row(f"extract x{K} scan", t * 1e3, f"{(t - RTT) * 1e3 / K:.2f} ms/f dev")

    # ---- megastep-only scan -------------------------------------------
    feats = fe.extract(imgs30[-1])
    jax.block_until_ready(feats)
    state0 = fe.state

    @jax.jit
    def mega_scan(state, n):
        def body(st, _):
            st2, rec = fused._megastep_core(
                cam, st, feats["uv"], feats["desc_bits"], feats["octave"],
                feats["valid"], feats["angle"],
                scale_factor=cfg.scale_factor, n_levels=cfg.n_levels,
                min_track_matches=cfg.min_track_matches,
                min_inliers_track=cfg.min_inliers_track)
            return st2, rec["n_inliers"]
        st, out = jax.lax.scan(body, state, None, length=8)
        return out
    jax.block_until_ready(mega_scan(state0, None))
    t = timeit(lambda: jax.block_until_ready(mega_scan(state0, None)))
    row(f"megastep x{K} scan", t * 1e3,
        f"{(t - RTT) * 1e3 / K:.2f} ms/f dev")

    # ---- full chunk with device-resident images ------------------------
    def _chunk():
        st2, recs, snaps = fused.track_chunk(
            cam, orb_cfg, state0, img_stack,
            scale_factor=cfg.scale_factor, n_levels=cfg.n_levels,
            min_track_matches=cfg.min_track_matches,
            min_inliers_track=cfg.min_inliers_track)
        jax.device_get(recs)
    _chunk()
    t = timeit(_chunk)
    row(f"track_chunk x{K} dev-imgs", t * 1e3,
        f"{(t - RTT) * 1e3 / K:.2f} ms/f dev")

    # ---- extraction sub-stage scans (level-0 sizes) --------------------
    img_f = jax.device_put(np.asarray(imgs30[0], np.float32))

    def scanned(name, fn, n=16):
        @jax.jit
        def g():
            def body(c, _):
                return c, fn()
            _, out = jax.lax.scan(body, 0, None, length=n)
            return out
        jax.block_until_ready(g())
        t = timeit(lambda: jax.block_until_ready(g()))
        row(f"  {name} x{n}", t * 1e3,
            f"{(t - RTT) * 1e3 / n:.3f} ms/call dev")

    scanned("fast_score_map L0",
            lambda: orb_mod.fast_score_map(img_f, 7.0).sum())
    scanned("select_keypoints L0",
            lambda: orb_mod.select_keypoints(
                orb_mod.fast_score_map(img_f, 7.0), 217, orb_cfg.cell,
                orb_cfg.per_cell_k)[0].sum())
    scanned("blur L0", lambda: orb_mod.gaussian_blur7(img_f).sum())

    ys = jnp.full((217,), 100, jnp.int32)
    xs = jnp.full((217,), 100, jnp.int32)
    scanned("ic_angles 217 L0",
            lambda: orb_mod.ic_angles(img_f, ys, xs).sum())
    ang = jnp.zeros((217,), jnp.float32)
    scanned("brief 217 L0",
            lambda: orb_mod.brief_descriptors(img_f, ys, xs, ang).sum())

    # ---- megastep sub-stages ------------------------------------------
    from ar_orbslam2_tpu.estimation.pose_opt import pose_optimization
    from ar_orbslam2_tpu.matching import matcher
    from ar_orbslam2_tpu.ops import hamming as H

    st = state0
    uvd, signsd = feats["uv"], H.to_signs(feats["desc_bits"])
    octd, validd = feats["octave"], feats["valid"]

    scanned("pose_opt 4x10", lambda: pose_optimization(
        st["prev_R"], st["prev_t"], st["lm_pos"][:cfg.max_kp], uvd,
        octd, validd, cam)["R"].sum(), n=8)
    scanned("search_local_points", lambda: matcher.search_local_points(
        cam, st["prev_R"], st["prev_t"], st["lm_pos"], st["lm_signs"],
        st["lm_normal"], st["lm_dmin"], st["lm_dmax"], st["lm_valid"],
        uvd, signsd, octd, validd,
        n_levels=cfg.n_levels, scale_factor=cfg.scale_factor)[0].sum(), n=8)
    scanned("search_by_projection_frame",
            lambda: matcher.search_by_projection_frame(
                cam, st["prev_R"], st["prev_t"],
                st["lm_pos"][:cfg.max_kp],
                st["lm_signs"][:cfg.max_kp], octd,
                validd, uvd, signsd, octd, validd)[0].sum(), n=8)
    scanned("hamming 4096x1024", lambda: H.hamming_matrix(
        st["lm_signs"], signsd).sum(), n=16)

    print(json.dumps({"breakdown_ms": rows}))


if __name__ == "__main__":
    main()
