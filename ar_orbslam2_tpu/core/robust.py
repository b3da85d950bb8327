"""Robust losses as IRLS weights + chi-square gates.

The reference uses g2o's RobustKernelHuber with deltas sqrt(5.991) (mono,
2 dof) and sqrt(7.815) (stereo, 3 dof) — src/Optimizer.cc (PoseOptimization
≈230, LocalBundleAdjustment ≈450). On TPU we run Gauss-Newton with
iteratively-reweighted least squares: the Huber kernel becomes a per-residual
scalar weight, keeping the normal-equation assembly a pure einsum.
"""
from __future__ import annotations

import jax.numpy as jnp

# chi-square 95% quantiles used throughout the reference as gates
CHI2_2DOF = 5.991   # monocular edges (2-dof reprojection)
CHI2_3DOF = 7.815   # stereo edges (3-dof: u, v, u_right)


def huber_weight(chi2, delta2):
    """IRLS weight for the Huber kernel given squared error and delta^2.

    w = 1 for chi2 <= delta2, else delta / sqrt(chi2); multiplying the
    residual/Jacobian rows by sqrt(w) reproduces g2o's robustified GN step.
    """
    chi2 = jnp.maximum(chi2, 1e-12)
    return jnp.where(chi2 <= delta2, 1.0, jnp.sqrt(delta2 / chi2))


def tukey_weight(chi2, c2):
    """Tukey biweight IRLS weight (harder outlier suppression; optional)."""
    r = chi2 / c2
    w = jnp.where(r < 1.0, (1.0 - r) ** 2, 0.0)
    return w
