"""Relocalization — recover a LOST tracker against the keyframe database.

TPU-native redesign of Tracking::Relocalization (src/Tracking.cc:≈1260,
SURVEY.md §3.2): candidates from place recognition, per-candidate
descriptor matching (dense Hamming instead of SearchByBoW), batched
DLT-PnP RANSAC (replaces PnPsolver's EPnP RANSAC), motion-only BA refine,
then a projection top-up against the candidate's covisible landmark
neighborhood and a final >=50-inlier acceptance gate — same thresholds as
the reference.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..matching import matcher
from ..ops import hamming as H
from .pnp import pnp_ransac
from .pose_opt import pose_optimization


class Relocalizer:
    def __init__(self, store, mapper, cam, tcfg, kfdb=None,
                 max_candidates: int = 5):
        self.store = store
        self.mapper = mapper
        self.cam = cam
        self.tcfg = tcfg
        self.kfdb = kfdb            # KeyFrameDatabase; set by SlamSystem
        self.max_candidates = max_candidates
        self._key = jax.random.PRNGKey(7)

    def _candidates(self, frame):
        if self.kfdb is not None:
            _, bow = self.kfdb.compute_bow(frame.desc_bits, frame.valid)
            cands = self.kfdb.detect_relocalization_candidates(bow)
            if cands:
                return cands[:self.max_candidates]
        # fallback: most recent keyframes
        ids = self.store.keyframe_ids()
        return [int(k) for k in ids[::-1][:self.max_candidates]]

    def relocalize(self, frame):
        """Try to estimate the frame pose from scratch. Returns inlier
        count on success (binding frame.mp + pose), else None."""
        s, cam, cfg = self.store, self.cam, self.tcfg
        for kf in self._candidates(frame):
            if not s.kf_valid[kf]:
                continue
            mp = s.kf_mp[kf]
            live = (mp >= 0) & s.mp_valid[np.maximum(mp, 0)]
            if live.sum() < 15:
                continue
            sel = np.where(live, mp, 0)
            lm_signs = H.to_signs(H.unpack_bits(s.mp_desc[sel]))
            idx, _ = matcher.search_brute_force(
                lm_signs, jnp.asarray(live), frame.signs,
                jnp.asarray(frame.valid), th=H.TH_LOW, nn_ratio=0.75)
            idx = np.asarray(idx)
            rows = np.nonzero(idx >= 0)[0]
            if len(rows) < 15:
                continue
            xw = s.mp_pos[sel[rows]]
            uv = frame.uv[idx[rows]]
            octv = frame.octave[idx[rows]]
            pad = cfg.max_kp
            xw_p = np.zeros((pad, 3), np.float32)
            uv_p = np.zeros((pad, 2), np.float32)
            oct_p = np.zeros(pad, np.int32)
            val_p = np.zeros(pad, bool)
            n = min(len(rows), pad)
            xw_p[:n], uv_p[:n], oct_p[:n], val_p[:n] = \
                xw[:n], uv[:n], octv[:n], True
            self._key, sub = jax.random.split(self._key)
            out = pnp_ransac(jnp.asarray(xw_p), jnp.asarray(uv_p),
                             jnp.asarray(oct_p), jnp.asarray(val_p),
                             cam, sub)
            if not bool(out["ok"]):
                continue
            res = pose_optimization(out["R"], out["t"], jnp.asarray(xw_p),
                                    jnp.asarray(uv_p), jnp.asarray(oct_p),
                                    jnp.asarray(val_p) & out["inlier"], cam)
            if int(res["n_inliers"]) < 10:
                continue
            # projection top-up against the candidate's local landmarks
            frame.set_pose(np.asarray(res["R"]), np.asarray(res["t"]))
            n_inl = self._projection_topup(frame, kf)
            if n_inl >= cfg.min_inliers_reloc:
                return n_inl
        return None

    def _projection_topup(self, frame, kf):
        """SearchByProjection over the candidate KF's covisible landmark
        set + final pose optimization (the reference's 'not enough inliers
        -> search more points' loop collapsed into one dense pass)."""
        s, cam, cfg = self.store, self.cam, self.tcfg
        kfs = np.concatenate([[kf], s.covisible_keyframes(kf, n_best=10)])
        mp_ids = s.local_map_points(kfs.astype(np.int64))
        bundle = s.gather_map_points(mp_ids, pad_to=cfg.n_local_mp)
        signs = H.to_signs(H.unpack_bits(bundle["desc"]))
        idx, visible, _ = matcher.search_local_points(
            cam, jnp.asarray(frame.R), jnp.asarray(frame.t),
            jnp.asarray(bundle["pos"]), signs, jnp.asarray(bundle["normal"]),
            jnp.asarray(bundle["dmin"]), jnp.asarray(bundle["dmax"]),
            jnp.asarray(bundle["valid"]),
            jnp.asarray(frame.uv), frame.signs, jnp.asarray(frame.octave),
            jnp.asarray(frame.valid), th_radius=10.0, th=H.TH_HIGH,
            nn_ratio=1.0, n_levels=cfg.n_levels,
            scale_factor=cfg.scale_factor)
        matched = idx >= 0
        j = jnp.maximum(idx, 0)
        res = pose_optimization(
            jnp.asarray(frame.R), jnp.asarray(frame.t),
            jnp.asarray(bundle["pos"]), jnp.asarray(frame.uv)[j],
            jnp.asarray(frame.octave)[j], matched, cam)
        inlier = np.asarray(res["inlier"] & matched)
        ids = np.asarray(bundle["ids"])
        frame.set_pose(np.asarray(res["R"]), np.asarray(res["t"]))
        frame.mp[:] = -1
        kp_match = np.asarray(idx)
        rows = np.nonzero(inlier & (ids >= 0))[0]
        frame.mp[kp_match[rows]] = ids[rows]
        return int(inlier.sum())
