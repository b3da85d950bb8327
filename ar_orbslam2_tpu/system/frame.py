"""Per-frame feature container.

TPU-native redesign of the reference Frame (src/Frame.cc, SURVEY.md §2.1):
fixed-capacity padded arrays with a validity mask instead of variable-length
keypoint vectors; no occupancy grid — spatial gating happens as masks inside
the dense Hamming-matmul searches (matching/matcher.py). The BoW vectors are
replaced by whole-descriptor-set similarity (loop/place_recognition.py).
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..ops import hamming as H


@dataclass
class Frame:
    """One camera frame: padded features + (once tracked) pose/bindings.

    uv are undistorted level-0 pixel coordinates (parity with
    Frame::UndistortKeyPoints — undistortion happens at construction).
    """
    uv: np.ndarray                # (P, 2) float32
    desc_bits: np.ndarray         # (P, 256) uint8 in {0,1}
    octave: np.ndarray            # (P,) int32
    valid: np.ndarray             # (P,) bool
    angle: np.ndarray | None = None      # (P,) float32 degrees
    uvr: np.ndarray | None = None        # (P,) stereo right-u (<0 mono)
    depth: np.ndarray | None = None      # (P,) depth (<0 unknown)
    timestamp: float = 0.0
    frame_id: int = -1
    # pose (world->camera); None until tracked
    R: np.ndarray | None = None
    t: np.ndarray | None = None
    # landmark binding per feature (-1 = none)
    mp: np.ndarray = field(default=None)

    def __post_init__(self):
        P = self.uv.shape[0]
        if self.mp is None:
            self.mp = np.full(P, -1, np.int64)
        if self.angle is None:
            self.angle = np.zeros(P, np.float32)
        self._signs = None
        self._packed = None
        self._dev = {}

    def dev(self, name):
        """Cached device copy of an immutable per-frame array (uv, octave,
        valid, angle) — uploaded once, reused by every kernel this frame."""
        hit = self._dev.get(name)
        if hit is None:
            import jax.numpy as jnp
            hit = jnp.asarray(getattr(self, name))
            self._dev[name] = hit
        return hit

    @property
    def n_kp(self) -> int:
        return int(self.valid.sum())

    @property
    def signs(self):
        """Device ±1 descriptor matrix (cached)."""
        if self._signs is None:
            self._signs = H.to_signs(self.desc_bits)
        return self._signs

    @property
    def desc_packed(self):
        """(P, 32) packed descriptors for MapStore storage (cached)."""
        if self._packed is None:
            self._packed = H.pack_bits(self.desc_bits)
        return self._packed

    def set_pose(self, R, t):
        from ..core.lie import project_so3
        self.R = project_so3(np.asarray(R, np.float32))
        self.t = np.asarray(t, np.float32)

    def pose_wc(self):
        """Camera-to-world (inverse pose) for trajectory export."""
        R_wc = self.R.T
        return R_wc, -(R_wc @ self.t)
