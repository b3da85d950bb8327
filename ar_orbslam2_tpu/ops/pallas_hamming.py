"""Fused windowed Hamming matcher — Pallas TPU kernel.

The per-frame hot op of the SLAM front end (reference:
ORBmatcher::SearchByProjection / SearchByBoW loops over grid cells,
src/ORBmatcher.cc) redesigned as ONE kernel on the MXU:

    for each 128-query tile (grid step):
        D    = (256 - Q_tile . K^T) / 2        # int8 matmul on the MXU
        D    = where(window & octave & valid, D, INF)
        d0/d1, best-idx per query (top-2 via two masked row minima)
        running per-keypoint column minimum     # reverse-best for the
                                                # mutual-consistency filter

Compared to the XLA composition in matching/matcher.py this never
materialises the (N, M) distance matrix in HBM (for N=M=1024 that is
~4 MB x several intermediates per frame) and replaces the per-row
argsort/top_k with two VPU minima — the whole search stays in VMEM.

The public entry `fused_windowed_top2` falls back to a pure-XLA
implementation off-TPU (CPU test mesh) or when shapes do not satisfy
the kernel's tiling constraints, so callers need not care.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import hamming as H

DESC_BITS = H.DESC_BITS
INF = DESC_BITS + 1
TILE_Q = 128   # queries per grid step (MXU row tile)


def _kernel(q_signs, q_uv, q_radius, q_olo, q_ohi, q_valid,
            kp_signs_t, kp_uv, kp_octave, kp_valid,
            best_idx, d0_out, d1_out, kp_best_d, kp_best_q):
    """One grid step = one TILE_Q-query slab against ALL keypoints."""
    step = pl.program_id(0)

    # --- Hamming distances for this slab: one MXU matmul ---------------
    # ±1 signs as float32: exact for 256-bit dots (this Mosaic/v5e
    # toolchain rejects i8 and bf16 matmul operand types; the rhs arrives
    # pre-transposed as (256, M) so this is a plain jnp.dot).
    dot = jnp.dot(q_signs[:].astype(jnp.float32),
                  kp_signs_t[:].astype(jnp.float32),
                  preferred_element_type=jnp.float32)
    d = (DESC_BITS - dot.astype(jnp.int32)) >> 1    # (TILE_Q, M)

    # --- gating masks (VPU) --------------------------------------------
    du = jnp.abs(q_uv[:, 0:1] - kp_uv[:, 0][None, :])
    dv = jnp.abs(q_uv[:, 1:2] - kp_uv[:, 1][None, :])
    r = q_radius[:, 0:1]
    octv = kp_octave[:, 0][None, :]
    ok = (du <= r) & (dv <= r)
    ok &= (octv >= q_olo[:, 0:1]) & (octv <= q_ohi[:, 0:1])
    ok &= (q_valid[:, 0:1] > 0) & (kp_valid[:, 0][None, :] > 0)
    d = jnp.where(ok, d, INF)

    # --- top-2 per query row (two masked minima, no sort) --------------
    d0 = jnp.min(d, axis=1)                                   # (TILE_Q,)
    m = d.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    is_best = d == d0[:, None]
    # first column attaining the minimum = the match index
    idx0 = jnp.min(jnp.where(is_best, col, m), axis=1)
    d1 = jnp.min(jnp.where(col == idx0[:, None], INF, d), axis=1)

    best_idx[:, 0] = idx0.astype(jnp.int32)
    d0_out[:, 0] = d0.astype(jnp.int32)
    d1_out[:, 0] = d1.astype(jnp.int32)

    # --- running reverse-best per keypoint column ----------------------
    col_min = jnp.min(d, axis=0)                              # (M,)
    row = jax.lax.broadcasted_iota(jnp.int32, d.shape, 0)
    is_cbest = d == col_min[None, :]
    qrow = jnp.min(jnp.where(is_cbest, row, TILE_Q), axis=0)
    qidx = (qrow + step * TILE_Q).astype(jnp.int32)

    @pl.when(step == 0)
    def _():
        kp_best_d[0, :] = col_min.astype(jnp.int32)
        kp_best_q[0, :] = qidx

    @pl.when(step != 0)
    def _():
        prev = kp_best_d[0, :]
        better = col_min < prev
        kp_best_d[0, :] = jnp.where(better, col_min, prev).astype(jnp.int32)
        kp_best_q[0, :] = jnp.where(better, qidx, kp_best_q[0, :])


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pallas_top2(q_signs, q_uv, q_radius, q_olo, q_ohi, q_valid,
                 kp_signs, kp_uv, kp_octave, kp_valid, interpret=False):
    n, m = q_signs.shape[0], kp_signs.shape[0]
    grid = (n // TILE_Q,)

    def qspec(width, dtype=None):
        return pl.BlockSpec((TILE_Q, width), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def kspec(width):
        return pl.BlockSpec((m, width), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            qspec(DESC_BITS),            # q_signs
            qspec(2), qspec(1), qspec(1), qspec(1), qspec(1),
            pl.BlockSpec((DESC_BITS, m), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),   # kp_signs^T
            kspec(2), kspec(1), kspec(1),
        ],
        out_specs=[
            pl.BlockSpec((TILE_Q, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),   # best_idx
            pl.BlockSpec((TILE_Q, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),   # d0
            pl.BlockSpec((TILE_Q, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),   # d1
            pl.BlockSpec((1, m), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),   # kp_best_d
            pl.BlockSpec((1, m), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),   # kp_best_q
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, m), jnp.int32),
            jax.ShapeDtypeStruct((1, m), jnp.int32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(q_signs,
      q_uv.astype(jnp.float32),
      q_radius.reshape(n, 1).astype(jnp.float32),
      q_olo.reshape(n, 1).astype(jnp.int32),
      q_ohi.reshape(n, 1).astype(jnp.int32),
      q_valid.reshape(n, 1).astype(jnp.int32),
      kp_signs.T,
      kp_uv.astype(jnp.float32),
      kp_octave.reshape(m, 1).astype(jnp.int32),
      kp_valid.reshape(m, 1).astype(jnp.int32))
    best_idx, d0, d1, kp_d, kp_q = outs
    return (best_idx[:, 0], d0[:, 0], d1[:, 0], kp_d[0], kp_q[0])


def _shapes_ok(n, m):
    return (n % TILE_Q == 0) and (m % 128 == 0)


def fused_windowed_top2(q_signs, q_uv, q_radius, q_olo, q_ohi, q_valid,
                        kp_signs, kp_uv, kp_octave, kp_valid,
                        th=H.TH_HIGH, nn_ratio=1.0, mutual=True,
                        force=None):
    """Windowed descriptor search: best keypoint per query + gates.

    Semantics identical to matching.matcher.windowed_match (threshold,
    Lowe ratio, mutual-best dedup), computed by the fused Pallas kernel
    when running on TPU with aligned shapes.

    force: None = auto (TPU & aligned), "pallas" = kernel (interpret mode
    off-TPU, for tests), "xla" = fallback path.

    Returns (idx (N,) int32 with -1 for no match, d0 (N,) int32).
    """
    n, m = q_signs.shape[0], kp_signs.shape[0]
    use_pallas = force == "pallas" or (
        force is None and _shapes_ok(n, m)
        and jax.default_backend() == "tpu")
    if not use_pallas:
        d = H.hamming_matrix(q_signs, kp_signs, q_valid, kp_valid,
                             invalid_dist=int(INF))
        du = jnp.abs(q_uv[:, None, 0] - kp_uv[None, :, 0])
        dv = jnp.abs(q_uv[:, None, 1] - kp_uv[None, :, 1])
        ok = (du <= q_radius[:, None]) & (dv <= q_radius[:, None])
        ok &= ((kp_octave[None, :] >= q_olo[:, None])
               & (kp_octave[None, :] <= q_ohi[:, None]))
        d = jnp.where(ok, d, INF)
        idx, d0 = H.best_match(d, th=th, nn_ratio=nn_ratio)
        if mutual:
            back, _ = H.best_match(jnp.swapaxes(d, 0, 1), th=int(INF),
                                   nn_ratio=1.0)
            idx = H.mutual_filter(idx, back)
        return idx, d0

    interpret = jax.default_backend() != "tpu"
    idx0, d0, d1, kp_d, kp_q = _pallas_top2(
        q_signs, q_uv, q_radius, q_olo, q_ohi, q_valid,
        kp_signs, kp_uv, kp_octave, kp_valid, interpret=interpret)
    ok = (d0 <= th) & (d0.astype(jnp.float32)
                       <= nn_ratio * d1.astype(jnp.float32))
    idx = jnp.where(ok, idx0, -1)
    if mutual:
        back = jnp.where(kp_d <= INF - 1, kp_q, -2)
        idx = H.mutual_filter(idx, back)
    return idx.astype(jnp.int32), d0
