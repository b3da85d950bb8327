"""ar_orbslam2_tpu — a TPU-native visual SLAM + AR framework.

A from-scratch re-design of the capabilities of shishiteng/AR_ORBSLAM2
(ORB-SLAM2 + AR overlay) for TPU hardware: JAX/XLA/Pallas compute
kernels, fixed-shape structure-of-arrays state, vmapped RANSAC,
Hamming matching as MXU matmuls, Schur-complement bundle adjustment,
and jax.sharding for multi-chip distribution.

Layer map (mirrors SURVEY.md §1, re-designed TPU-first):
  core/        SE3/Sim3 Lie groups, camera models, triangulation, robust losses
  ops/         Pallas/XLA kernels: Hamming matmul, FAST, BRIEF, image pyramid
  frontend/    ORB feature extraction + Frame construction (fixed-capacity SoA)
  matching/    projection / brute-force descriptor search with rotation checks
  vocab/       place recognition (brute-force MXU descriptor scoring; DBoW2 parity)
  estimation/  motion-only BA, two-view init, EPnP RANSAC, Sim3, local BA, pose graph
  mapstore/    fixed-capacity map (keyframes, landmarks, covisibility graph)
  pipeline/    tracking / local-mapping / loop-closing stages
  system.py    SlamSystem facade (TrackMonocular/Stereo/RGBD parity API)
  ar/          plane RANSAC + marker anchoring + overlay rendering
  data/        TUM/KITTI/EuRoC loaders + synthetic scene generator
  eval/        ATE/RPE evaluation + trajectory IO (TUM/KITTI formats)
  parallel/    device mesh, distributed Schur-complement BA
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
