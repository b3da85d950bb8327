"""Probe structural overheads of the axon TPU transport + XLA loops:
  1. per-iteration overhead of lax.fori_loop / lax.scan vs body size
  2. readback bandwidth vs payload size
  3. dispatch+sync floor distribution (is there a ~25 ms mode?)
  4. does XLA compilation hold the GIL? (background thread freeze test)
"""
from __future__ import annotations

import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

import os
import sys
import threading
import time

os.environ.setdefault("JAX_CACHE_DIR", "/tmp/jax_cache")


def timeit(fn, reps=10, warmup=2):
    for _ in range(warmup):
        fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2], ts[0], ts[-1]


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_CACHE_DIR"])
    import jax.numpy as jnp
    import numpy as np

    # ---- 1. loop overhead ---------------------------------------------
    def make_fori(n, body_sz):
        x0 = jnp.zeros((body_sz,), jnp.float32)

        @jax.jit
        def f():
            def body(i, x):
                return x * 1.000001 + 1.0
            return jax.lax.fori_loop(0, n, body, x0).sum()
        return f

    for body_sz in (8, 1024 * 128):
        for n in (10, 100, 400):
            f = make_fori(n, body_sz)
            jax.block_until_ready(f())
            med, lo, hi = timeit(lambda: jax.block_until_ready(f()))
            print(f"fori n={n:4d} body={body_sz:7d}: {med*1e3:8.3f} ms "
                  f"({med*1e6/n:7.2f} us/iter) [{lo*1e3:.2f},{hi*1e3:.2f}]",
                  flush=True)

    def make_scan(n, body_sz, n_out):
        x0 = jnp.zeros((body_sz,), jnp.float32)

        @jax.jit
        def f():
            def body(c, _):
                c2 = c * 1.000001 + 1.0
                return c2, tuple(c2.sum() + i for i in range(n_out))
            c, outs = jax.lax.scan(body, x0, None, length=n)
            return outs[0].sum()
        return f

    for n_out in (1, 20):
        for n in (8, 64):
            f = make_scan(n, 1024, n_out)
            jax.block_until_ready(f())
            med, lo, hi = timeit(lambda: jax.block_until_ready(f()))
            print(f"scan n={n:3d} outs={n_out:2d}: {med*1e3:8.3f} ms "
                  f"({med*1e6/n:7.2f} us/iter)", flush=True)

    # scan with BIG stacked outputs (like track_chunk snapshots)
    @jax.jit
    def scan_big_out():
        def body(c, _):
            c2 = c + 1.0
            return c2, (c2, c2 * 2)    # 2 x 256KB stacked outputs
        c, outs = jax.lax.scan(body, jnp.zeros((64, 1024), jnp.float32),
                               None, length=8)
        return outs[0][-1].sum()
    jax.block_until_ready(scan_big_out())
    med, lo, hi = timeit(lambda: jax.block_until_ready(scan_big_out()))
    print(f"scan n=8 big-outs(2x256KB): {med*1e3:8.3f} ms", flush=True)

    # ---- 2. readback bandwidth ----------------------------------------
    g = jax.jit(lambda x: x + 1)
    for sz in (1 << 10, 1 << 14, 1 << 17, 1 << 20, 1 << 23):
        xd = jax.device_put(np.zeros(sz, np.uint8))
        y = g(xd)
        jax.block_until_ready(y)
        med, lo, hi = timeit(lambda: np.asarray(g(xd)))
        bw = sz / med / 1e6
        print(f"readback {sz/1024:8.0f} KB: {med*1e3:8.2f} ms "
              f"(~{bw:6.0f} MB/s) [{lo*1e3:.2f},{hi*1e3:.2f}]", flush=True)

    # ---- 3. dispatch+sync distribution --------------------------------
    xd = jax.device_put(np.zeros(8, np.float32))
    g(xd).block_until_ready()
    ts = []
    for _ in range(50):
        t0 = time.perf_counter()
        g(xd).block_until_ready()
        ts.append((time.perf_counter() - t0) * 1e3)
    ts.sort()
    print(f"dispatch+sync 50x: p10={ts[5]:.2f} p50={ts[25]:.2f} "
          f"p90={ts[45]:.2f} max={ts[-1]:.2f} ms", flush=True)

    # ---- 4. GIL during compile ----------------------------------------
    stop = threading.Event()
    max_gap = [0.0]

    def spinner():
        last = time.perf_counter()
        while not stop.is_set():
            now = time.perf_counter()
            gap = now - last
            if gap > max_gap[0]:
                max_gap[0] = gap
            last = now
            time.sleep(0.001)

    th = threading.Thread(target=spinner, daemon=True)
    th.start()
    time.sleep(0.2)
    max_gap[0] = 0.0
    # force a FRESH compile (unique shape, cache disabled via donate trick)
    jax.config.update("jax_compilation_cache_dir", None)
    n = 777

    @jax.jit
    def fresh(x):
        for _ in range(30):
            x = jnp.tanh(x @ x.T)[:n, :n]
        return x.sum()
    t0 = time.perf_counter()
    jax.block_until_ready(fresh(jnp.ones((n, n))))
    t_compile = time.perf_counter() - t0
    stop.set()
    th.join()
    print(f"compile {t_compile:.1f}s; max GIL gap in bg thread: "
          f"{max_gap[0]*1e3:.0f} ms", flush=True)


if __name__ == "__main__":
    main()
