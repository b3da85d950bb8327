"""ar_orbslam2_tpu — a TPU-native visual SLAM + AR framework.

A from-scratch re-design of the capabilities of shishiteng/AR_ORBSLAM2
(ORB-SLAM2 + AR overlay) for TPU hardware: JAX/XLA/Pallas compute
kernels, fixed-shape structure-of-arrays state, vmapped RANSAC,
Hamming matching as MXU matmuls, Schur-complement bundle adjustment,
and jax.sharding for multi-chip distribution.

Layer map (mirrors SURVEY.md §1, re-designed TPU-first):
  core/        SE3/Sim3 Lie groups, camera models, triangulation, robust losses
  ops/         device kernels: Hamming matmul, best-match, rotation histogram
  frontend/    ORB extraction (pyramid FAST + oriented BRIEF) + stereo matching
  matching/    projection / brute-force descriptor search with rotation checks
  estimation/  motion-only BA, two-view init, PnP RANSAC, Sim3, local BA,
               essential-graph (Sim3 pose graph), relocalization
  mapstore/    fixed-capacity map (keyframes, landmarks, covisibility graph)
               + checkpoint/resume
  mapping/     local-mapping stage (triangulation, fuse, culling, local BA)
               + global BA
  loop/        place recognition (vocabulary-as-tensor) + loop closing
  system/      Frame, Tracking state machine, SlamSystem facade
               (track_monocular/stereo/rgbd parity API)
  ar/          plane RANSAC + marker anchoring + headless overlay rendering
  data/        TUM/KITTI/EuRoC loaders + synthetic scene generator
  eval/        ATE/RPE evaluation + trajectory IO (TUM/KITTI formats)
  utils/       reference-YAML settings loader
  parallel/    device mesh, distributed Schur-complement BA
  apps/        CLI runners (dataset eval, AR demo)
"""

__version__ = "0.1.0"

import jax as _jax

# SLAM geometry is precision-critical: TPU lowers f32 matmuls to bf16 MXU
# passes by default, which was observed (live, on chip) to turn 1e-3-level
# triangulation errors into 0.3 m errors. Force full-f32 matmuls globally;
# the descriptor-matching hot path is int8->int32 dot_general (MXU-native,
# unaffected), and any profiled f32 kernel that tolerates bf16 opts back in
# locally with precision=DEFAULT.
_jax.config.update("jax_default_matmul_precision", "highest")

# NOTE on compilation caching: bench.py and the CLI apps enable the
# persistent jax compilation cache (their runs are TPU-bound and pay
# minutes of cold compile). It is NOT enabled at package level because
# XLA:CPU AOT cache entries are machine-feature-sensitive and poison
# forced-CPU test runs on heterogeneous hosts.

# Serialize XLA compile/load calls process-wide. The framework runs jax
# from several threads (tracking, mapping worker, background GBA); a
# compile issued on a secondary thread while another thread streams
# dispatches was observed (live, on the axon transport) to deadlock
# inside backend_compile_and_load. Serialization shrinks the race window;
# SlamSystem.precompile() removes secondary-thread compiles entirely.
import threading as _threading

import jax._src.compiler as _jax_compiler

_compile_lock = _threading.Lock()
_orig_backend_compile = _jax_compiler.backend_compile_and_load


def _serialized_backend_compile(*args, **kwargs):
    with _compile_lock:
        return _orig_backend_compile(*args, **kwargs)


if _jax_compiler.backend_compile_and_load is not _serialized_backend_compile:
    _jax_compiler.backend_compile_and_load = _serialized_backend_compile
