"""Headline benchmark: tracking-core frames/s on one chip.

Measures the per-frame hot path of the SLAM front end — projective Hamming
matching (one MXU matmul over all candidates) + motion-only bundle
adjustment (4x10 LM rounds, parity with Optimizer::PoseOptimization) — on
whatever backend JAX selects (TPU under the driver, CPU in dev).

Baseline: reference ORB-SLAM2 tracks ~30 fps on an i7 for 640x480 mono
(BASELINE.md "Tracking, mean per frame"); that CPU figure includes ORB
extraction (~40-60%% of the frame budget). vs_baseline = fps / 30.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import time

import jax

REF_CPU_FPS = 30.0


def main():
    from __graft_entry__ import entry

    fn, args = entry()
    step = jax.jit(fn)
    # warmup / compile
    out = step(*args)
    jax.block_until_ready(out)

    n = 200
    t0 = time.perf_counter()
    for _ in range(n):
        out = step(*args)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    fps = n / dt

    print(json.dumps({
        "metric": "tracking_core_fps",
        "value": round(fps, 2),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / REF_CPU_FPS, 2),
    }))


if __name__ == "__main__":
    main()
