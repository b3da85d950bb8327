"""Local mapping stage — the reference's mapping thread as a pipeline stage.

TPU-native redesign of LocalMapping (src/LocalMapping.cc, SURVEY.md §3.3):
the mutex/queue thread becomes an explicit stage invoked per new keyframe.
Hot math (epipolar search, triangulation gates, fuse matching, local BA)
runs as fixed-shape jitted kernels; bookkeeping (observation tables,
covisibility, culling decisions) is vectorized numpy on the host MapStore.

Step order mirrors LocalMapping::Run: ProcessNewKeyFrame -> MapPointCulling
-> CreateNewMapPoints -> SearchInNeighbors (fuse) -> LocalBundleAdjustment
-> KeyFrameCulling.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..estimation.local_ba import bundle_adjust
from ..matching import matcher
from ..ops import hamming as H
from . import triangulation as tri


@dataclass(frozen=True)
class LocalMapperConfig:
    n_triangulation_neighbors: int = 10   # mono: 20 in ref; 10 keeps it tight
    n_fuse_neighbors: int = 10            # first-order fuse targets
    ba_max_local_kf: int = 12             # local (optimized) keyframes
    ba_max_fixed_kf: int = 12             # boundary (fixed) keyframes
    ba_max_points: int = 4096
    ba_iters_1: int = 5
    ba_iters_2: int = 10
    scale_factor: float = 1.2
    n_levels: int = 8
    cull_found_ratio: float = 0.25        # MapPointCulling gate
    kf_cull_redundancy: float = 0.9       # KeyFrameCulling gate


class LocalMapper:
    """Per-keyframe mapping stage over a MapStore."""

    def __init__(self, store, cam, cfg: LocalMapperConfig = LocalMapperConfig()):
        self.store = store
        self.cam = cam
        self.cfg = cfg
        self._signs_cache: dict[int, jnp.ndarray] = {}
        # recently created landmarks: mp_id -> kf_id at creation
        self.recent: dict[int, int] = {}
        self.last_stats: dict = {}   # per-KF diagnostics (culled/created)

    # -- cached device views of per-KF descriptors (KF desc are immutable) --
    def kf_signs(self, kf: int):
        hit = self._signs_cache.get(kf)
        if hit is None:
            bits = H.unpack_bits(self.store.kf_desc[kf])
            hit = H.to_signs(bits)
            self._signs_cache[kf] = hit
        return hit

    def drop_kf_cache(self, kf: int):
        self._signs_cache.pop(kf, None)

    # ------------------------------------------------------------------
    def process_keyframe(self, kf: int, do_ba: bool = True,
                         do_culling: bool = True):
        """Full mapping step for a freshly inserted keyframe."""
        self._process_new_keyframe(kf)
        n_culled = self.cull_map_points(kf) if do_culling else 0
        n_new = self.create_new_map_points(kf)
        self.search_in_neighbors(kf)
        if do_ba and self.store.n_keyframes() > 2:
            self.local_bundle_adjustment(kf)
        if do_culling:
            self.cull_keyframes(kf)
        self.last_stats = dict(kf=kf, n_culled=n_culled, n_new=n_new)
        return n_new

    # ------------------------------------------------------------------
    def _process_new_keyframe(self, kf: int):
        """Parity: LocalMapping::ProcessNewKeyFrame — refresh landmark
        derived state for tracked bindings, rebuild covisibility."""
        s = self.store
        mps = s.kf_mp[kf]
        mps = np.unique(mps[mps >= 0])
        if len(mps):
            s.compute_distinctive_descriptors(mps)
            s.update_normal_and_depth(mps)
        s.update_connections(kf)

    # ------------------------------------------------------------------
    def cull_map_points(self, kf: int):
        """Parity: LocalMapping::MapPointCulling — recent landmarks must
        keep a >=0.25 found ratio and gain >=3 observers within 2 KFs."""
        s = self.store
        dead, graduated = [], []
        for mp, born_kf in self.recent.items():
            if not s.mp_valid[mp]:
                dead.append(mp)
                continue
            found_ratio = s.mp_found[mp] / max(int(s.mp_visible[mp]), 1)
            age = kf - born_kf
            if found_ratio < self.cfg.cull_found_ratio:
                s.erase_map_point(mp)
                dead.append(mp)
            elif age >= 2 and s.mp_nobs[mp] <= 2:
                s.erase_map_point(mp)
                dead.append(mp)
            elif age >= 3:
                graduated.append(mp)
        n_culled = sum(1 for m in dead if not self.store.mp_valid[m])
        for mp in dead + graduated:
            self.recent.pop(mp, None)
        return n_culled

    # ------------------------------------------------------------------
    def create_new_map_points(self, kf: int) -> int:
        """Parity: LocalMapping::CreateNewMapPoints — triangulate against
        the best covisible neighbors with epipolar search + gates."""
        s, cam, cfg = self.store, self.cam, self.cfg
        neighbors = s.covisible_keyframes(
            kf, n_best=cfg.n_triangulation_neighbors)
        if len(neighbors) == 0:
            return 0
        R1, t1 = s.kf_R[kf], s.kf_t[kf]
        uv1 = jnp.asarray(s.kf_uv[kf])
        oct1 = jnp.asarray(s.kf_octave[kf])
        ang1 = jnp.asarray(s.kf_angle[kf])
        signs1 = self.kf_signs(kf)
        median_depth = s.median_scene_depth(kf)
        c1 = -(s.kf_R[kf].T @ s.kf_t[kf])

        n_created = 0
        for nb in neighbors:
            nb = int(nb)
            c2 = -(s.kf_R[nb].T @ s.kf_t[nb])
            baseline = float(np.linalg.norm(c2 - c1))
            # mono gate: baseline must be significant vs scene depth
            if median_depth > 0 and baseline / median_depth < 0.01:
                continue
            free1 = jnp.asarray(s.kf_kp_valid[kf] & (s.kf_mp[kf] < 0))
            free2 = jnp.asarray(s.kf_kp_valid[nb] & (s.kf_mp[nb] < 0))
            idx, _ = tri.epipolar_search(
                cam, jnp.asarray(R1), jnp.asarray(t1),
                jnp.asarray(s.kf_R[nb]), jnp.asarray(s.kf_t[nb]),
                uv1, signs1, oct1, free1,
                jnp.asarray(s.kf_uv[nb]), self.kf_signs(nb),
                jnp.asarray(s.kf_octave[nb]), free2,
                angles1=ang1, angles2=jnp.asarray(s.kf_angle[nb]),
                scale_factor=cfg.scale_factor)
            out = tri.triangulate_candidates(
                cam, jnp.asarray(R1), jnp.asarray(t1),
                jnp.asarray(s.kf_R[nb]), jnp.asarray(s.kf_t[nb]),
                uv1, oct1, jnp.asarray(s.kf_uv[nb]),
                jnp.asarray(s.kf_octave[nb]), idx,
                scale_factor=cfg.scale_factor)
            good = np.asarray(out["good"])
            if not good.any():
                continue
            feats1 = np.nonzero(good)[0]
            feats2 = np.asarray(idx)[feats1]
            xw = np.asarray(out["xw"])[feats1]
            ids = s.add_map_points(xw, s.kf_desc[kf, feats1], first_kf=kf)
            s.add_observations(ids, kf, feats1)
            s.add_observations(ids, nb, feats2)
            self.recent.update((int(m), kf) for m in ids)
            s.compute_distinctive_descriptors(ids)
            s.update_normal_and_depth(ids)
            n_created += len(ids)
        if n_created:
            s.update_connections(kf)
        return n_created

    # ------------------------------------------------------------------
    def search_in_neighbors(self, kf: int):
        """Parity: LocalMapping::SearchInNeighbors — two-pass landmark
        fusion with first- and second-order covisible neighbors."""
        s, cfg = self.store, self.cfg
        first = [int(k) for k in
                 s.covisible_keyframes(kf, n_best=cfg.n_fuse_neighbors)]
        targets = list(first)
        seen = set(first) | {kf}
        for nb in first:
            for nb2 in s.covisible_keyframes(nb, n_best=5):
                nb2 = int(nb2)
                if nb2 not in seen:
                    targets.append(nb2)
                    seen.add(nb2)
        if not targets:
            return
        # pass 1: current KF's landmarks into each target
        own = s.kf_mp[kf]
        own = np.unique(own[own >= 0])
        for t in targets:
            self._fuse(own, t)
        # pass 2: all targets' landmarks into the current KF
        fuse_mps = s.kf_mp[np.asarray(targets, np.int64)]
        fuse_mps = np.unique(fuse_mps[fuse_mps >= 0])
        fuse_mps = fuse_mps[s.mp_valid[fuse_mps]]
        self._fuse(fuse_mps, kf)
        # refresh derived state of current KF's landmarks + connectivity
        own = s.kf_mp[kf]
        own = np.unique(own[own >= 0])
        if len(own):
            s.compute_distinctive_descriptors(own)
            s.update_normal_and_depth(own)
        s.update_connections(kf)

    def _fuse(self, mp_ids, target_kf: int, radius: float = 3.0):
        """Parity: ORBmatcher::Fuse — project landmarks into target_kf,
        bind to the best free keypoint or merge with an existing binding."""
        s, cam, cfg = self.store, self.cam, self.cfg
        mp_ids = mp_ids[s.mp_valid[mp_ids]] if len(mp_ids) else mp_ids
        if len(mp_ids) == 0:
            return
        pad = cfg.ba_max_points
        bundle = s.gather_map_points(mp_ids, pad_to=pad)
        signs = H.to_signs(H.unpack_bits(bundle["desc"]))
        kp_valid = jnp.asarray(s.kf_kp_valid[target_kf])
        idx, visible, dist = matcher.search_local_points(
            cam, jnp.asarray(s.kf_R[target_kf]),
            jnp.asarray(s.kf_t[target_kf]),
            jnp.asarray(bundle["pos"]), signs,
            jnp.asarray(bundle["normal"]), jnp.asarray(bundle["dmin"]),
            jnp.asarray(bundle["dmax"]), jnp.asarray(bundle["valid"]),
            jnp.asarray(s.kf_uv[target_kf]), self.kf_signs(target_kf),
            jnp.asarray(s.kf_octave[target_kf]), kp_valid,
            th_radius=radius, th=H.TH_LOW, nn_ratio=1.0,
            n_levels=cfg.n_levels, scale_factor=cfg.scale_factor)
        idx = np.asarray(idx)
        ids = np.asarray(bundle["ids"])
        for row in np.nonzero(idx >= 0)[0]:
            mp = int(ids[row])
            if mp < 0 or not s.mp_valid[mp]:
                continue
            feat = int(idx[row])
            bound = int(s.kf_mp[target_kf, feat])
            if bound == mp:
                continue
            if bound >= 0 and s.mp_valid[bound]:
                # merge: keep the landmark with more observers
                if s.mp_nobs[bound] >= s.mp_nobs[mp]:
                    s.replace_map_point(mp, bound)
                else:
                    s.replace_map_point(bound, mp)
            else:
                s.add_observation(mp, target_kf, feat)

    # ------------------------------------------------------------------
    def gather_local_window(self, kf: int):
        """Build the fixed-shape local-BA problem around kf.

        Local (optimized) KFs = kf + best covisible; fixed KFs = other
        observers of local landmarks (parity: Optimizer::
        LocalBundleAdjustment's lLocalKeyFrames / lFixedCameras).
        """
        s, cfg = self.store, self.cfg
        local = [kf] + [int(k) for k in s.covisible_keyframes(
            kf, n_best=cfg.ba_max_local_kf - 1)]
        mp_ids = s.local_map_points(np.asarray(local, np.int64))
        if len(mp_ids) > cfg.ba_max_points:
            mp_ids = mp_ids[:cfg.ba_max_points]
        local_set = set(local)
        # fixed cameras: observers of local points outside the local set
        obs_kf = s.mp_obs_kf[mp_ids]
        outside = np.unique(obs_kf[obs_kf >= 0])
        fixed = [int(k) for k in outside if int(k) not in local_set]
        fixed = fixed[:cfg.ba_max_fixed_kf]
        # keyframe 0 must stay fixed to pin the gauge
        window = local + fixed
        n_local = len(local)

        C = cfg.ba_max_local_kf + cfg.ba_max_fixed_kf
        P, O = cfg.ba_max_points, s.cfg.max_obs
        kf_arr = np.full(C, -1, np.int64)
        kf_arr[:len(window)] = window
        sel = np.maximum(kf_arr, 0)
        cam_R = s.kf_R[sel].copy()
        cam_t = s.kf_t[sel].copy()
        cam_valid = kf_arr >= 0
        cam_fixed = np.ones(C, bool)
        cam_fixed[:n_local] = False
        # gauge: keyframe 0 (and 1 for mono scale) fixed if present
        for i, k in enumerate(window[:n_local]):
            if k <= 0:
                cam_fixed[i] = True

        mp_arr = np.full(P, -1, np.int64)
        mp_arr[:len(mp_ids)] = mp_ids
        selp = np.maximum(mp_arr, 0)
        pts = s.mp_pos[selp].copy()
        pt_valid = mp_arr >= 0

        # map observation KF ids -> window slots
        slot_of = np.full(s.cfg.max_keyframes, -1, np.int64)
        slot_of[np.asarray(window, np.int64)] = np.arange(len(window))
        okf = s.mp_obs_kf[selp]                     # (P, O)
        oft = np.maximum(s.mp_obs_feat[selp], 0)
        obs_cam = np.where(okf >= 0, slot_of[np.maximum(okf, 0)], -1)
        obs_valid = (obs_cam >= 0) & pt_valid[:, None]
        obs_uv = s.kf_uv[np.maximum(okf, 0), oft]
        obs_oct = s.kf_octave[np.maximum(okf, 0), oft]
        obs_uvr = np.where(okf >= 0, s.kf_uvr[np.maximum(okf, 0), oft],
                           -1.0).astype(np.float32)
        return dict(window=window, n_local=n_local, mp_ids=mp_ids,
                    cam_R=cam_R, cam_t=cam_t, cam_fixed=cam_fixed,
                    cam_valid=cam_valid, pts=pts, pt_valid=pt_valid,
                    obs_cam=obs_cam.astype(np.int32), obs_uv=obs_uv,
                    obs_oct=obs_oct, obs_valid=obs_valid, obs_uvr=obs_uvr,
                    obs_kf=okf, obs_feat=np.where(okf >= 0, oft, -1))

    def local_bundle_adjustment(self, kf: int):
        """Parity: Optimizer::LocalBundleAdjustment — 5+10 LM iterations
        with a mid-way chi2 outlier strip; outlier observations erased."""
        w = self.gather_local_window(kf)
        s = self.store
        res = bundle_adjust(
            jnp.asarray(w["cam_R"]), jnp.asarray(w["cam_t"]),
            jnp.asarray(w["cam_fixed"]), jnp.asarray(w["cam_valid"]),
            jnp.asarray(w["pts"]), jnp.asarray(w["pt_valid"]),
            jnp.asarray(w["obs_cam"]), jnp.asarray(w["obs_uv"]),
            jnp.asarray(w["obs_oct"]), jnp.asarray(w["obs_valid"]),
            self.cam, obs_uvr=jnp.asarray(w["obs_uvr"]),
            n_iters_1=self.cfg.ba_iters_1,
            n_iters_2=self.cfg.ba_iters_2)
        from ..core.lie import project_so3
        cam_R = project_so3(np.asarray(res["cam_R"]))
        cam_t = np.asarray(res["cam_t"])
        pts = np.asarray(res["pts"])
        inl = np.asarray(res["obs_inlier"])
        # write back optimized local poses + landmark positions
        for i in range(w["n_local"]):
            k = w["window"][i]
            if not w["cam_fixed"][i]:
                s.kf_R[k] = cam_R[i]
                s.kf_t[k] = cam_t[i]
        n_mp = len(w["mp_ids"])
        finite = np.isfinite(pts[:n_mp]).all(-1)
        s.mp_pos[w["mp_ids"][finite]] = pts[:n_mp][finite]
        # erase outlier observations (parity with the post-BA erase loop)
        bad = w["obs_valid"] & ~inl
        rows, cols = np.nonzero(bad)
        for r, c in zip(rows, cols):
            mp = int(w["mp_ids"][r]) if r < n_mp else -1
            okf = int(w["obs_kf"][r, c])
            if mp >= 0 and okf >= 0 and s.mp_valid[mp]:
                s.erase_observation(mp, okf)
        if len(rows):
            s.update_connections(kf)

    # ------------------------------------------------------------------
    def cull_keyframes(self, kf: int):
        """Parity: LocalMapping::KeyFrameCulling — erase local KFs whose
        landmarks are >=90% seen by >=3 other KFs at same/finer scale."""
        s, cfg = self.store, self.cfg
        for cand in [int(k) for k in s.covisible_keyframes(kf)]:
            if cand == 0 or cand == kf:
                continue
            feats = np.nonzero(s.kf_mp[cand] >= 0)[0]
            if len(feats) == 0:
                continue
            # vectorized per-feature redundancy: a feature is redundant if
            # >=3 OTHER keyframes observe its landmark at the same or a
            # finer scale (octave <= lvl + 1)
            mps = s.kf_mp[cand, feats]
            live = s.mp_valid[mps]
            fl, ml = feats[live], mps[live]
            n_redundant = 0
            if len(fl):
                lvl = s.kf_octave[cand, fl]                    # (F,)
                okf = s.mp_obs_kf[ml]                          # (F, O)
                oft = s.mp_obs_feat[ml]
                others = (okf >= 0) & (okf != cand)
                finer = s.kf_octave[np.maximum(okf, 0),
                                    np.maximum(oft, 0)] <= lvl[:, None] + 1
                n_redundant = int(((others & finer).sum(1) >= 3).sum())
            if n_redundant >= cfg.kf_cull_redundancy * len(feats):
                s.erase_keyframe(cand)
                self.drop_kf_cache(cand)
