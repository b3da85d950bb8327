"""Loop closing — detection, Sim3 estimation, correction, global BA.

TPU-native redesign of LoopClosing (src/LoopClosing.cc, SURVEY.md §3.4):
the loop thread becomes a stage invoked per keyframe. The pieces map 1:1 —
DetectLoop (database query + 3-consecutive covisibility consistency),
ComputeSim3 (descriptor match -> batched Horn RANSAC -> Sim3 GN ->
projection top-up with >=40 gate), CorrectLoop (Sim3 propagation over the
current covisible group, landmark fusion, essential-graph optimization,
full BA) — but every numeric stage is a fixed-shape batched kernel.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core import camera as cam_mod
from ..core import lie
from ..estimation.pose_graph import optimize_essential_graph
from ..estimation.sim3_solver import optimize_sim3, sim3_ransac
from ..matching import matcher
from ..matching.matcher import windowed_match
from ..mapping.global_ba import global_bundle_adjustment
from ..ops import hamming as H
from .place_recognition import KeyFrameDatabase


@dataclass(frozen=True)
class LoopCloserConfig:
    consistency_threshold: int = 3      # mnCovisibilityConsistencyTh
    min_bow_matches: int = 20           # SearchByBoW gate in ComputeSim3
    min_sim3_inliers: int = 20          # OptimizeSim3 gate
    min_total_matches: int = 40         # projection top-up gate
    min_kf_gap: int = 10                # KFs since last loop before retry
    covis_edge_min_weight: int = 100    # essential-graph covisibility edges
    # one-time online k-medians codebook training once this many KFs
    # exist (LOOP_RECALL.md; 0 = keep the random codebook forever)
    vocab_train_at: int = 24
    fix_scale: bool = False             # True for stereo/RGB-D
    run_global_ba: bool = True
    # async GBA with abort + spanning-tree propagation (parity:
    # RunGlobalBundleAdjustment thread / mbStopGBA); False = inline
    background_gba: bool = True
    max_loop_points: int = 4096
    sim3_pad: int = 512                 # fixed correspondence capacity
    scale_factor: float = 1.2           # ORB pyramid scale


@partial(jax.jit, static_argnames=("cam", "scale_factor"))
def _search_by_sim3_kernel(cam, R12, t12, s12,
                           xc1, signs1, oct1, live1, uv1,
                           xc2, signs2, oct2, live2, uv2,
                           scale_factor=1.2):
    """Both directions of ORBmatcher::SearchBySim3 (src/ORBmatcher.cc, used
    at src/LoopClosing.cc:≈230): project each KF's landmarks into the other
    with the current S12 estimate, window-search radius 7.5·s^octave.
    Returns (m12 (P,), m21 (P,)) — per-slot match indices, -1 for none."""
    sf = jnp.float32(scale_factor)
    # 1 -> 2 via S21 = S12^-1
    x2 = ((xc1 - t12) @ R12) / jnp.maximum(s12, 1e-12)
    uv2_hat = cam_mod.project(cam, x2)
    vis1 = (live1 & (x2[..., 2] > 0.1)
            & (uv2_hat[..., 0] >= 0) & (uv2_hat[..., 0] < cam.width)
            & (uv2_hat[..., 1] >= 0) & (uv2_hat[..., 1] < cam.height))
    r1 = 7.5 * sf ** oct1.astype(jnp.float32)
    m12, _ = windowed_match(uv2_hat, signs1, vis1, r1, uv2, signs2,
                            oct2, live2, octave_lo=oct1 - 1,
                            octave_hi=oct1 + 1, th=H.TH_HIGH,
                            nn_ratio=1.0, mutual=False)
    # 2 -> 1 via S12
    x1 = s12 * (xc2 @ R12.T) + t12
    uv1_hat = cam_mod.project(cam, x1)
    vis2 = (live2 & (x1[..., 2] > 0.1)
            & (uv1_hat[..., 0] >= 0) & (uv1_hat[..., 0] < cam.width)
            & (uv1_hat[..., 1] >= 0) & (uv1_hat[..., 1] < cam.height))
    r2 = 7.5 * sf ** oct2.astype(jnp.float32)
    m21, _ = windowed_match(uv1_hat, signs2, vis2, r2, uv1, signs1,
                            oct1, live1, octave_lo=oct2 - 1,
                            octave_hi=oct2 + 1, th=H.TH_HIGH,
                            nn_ratio=1.0, mutual=False)
    return m12, m21

@partial(jax.jit, static_argnames=())
def _bf_match_kernel(signs1, live1, signs2, live2):
    """Jitted brute-force match for ComputeSim3 — the eager call compiled
    ~25 XLA ops one-by-one on the mapping worker mid-run (measured ~12 s
    of first-use compiles + a ~25 ms dispatch RTT per op after)."""
    return matcher.search_brute_force(signs1, live1, signs2, live2,
                                      th=H.TH_LOW, nn_ratio=0.75)[0]


@partial(jax.jit, static_argnames=("cam",))
def _project_loop_points_kernel(cam, Rcw_s, tcw, pos, signs, normal,
                                dmin, dmax, valid, kp_uv, kp_signs,
                                kp_oct, kp_valid):
    """Jitted SearchByProjection(Scw) for the loop-closure total count."""
    idx, visible, _ = matcher.search_local_points(
        cam, Rcw_s, tcw, pos, signs, normal, dmin, dmax, valid,
        kp_uv, kp_signs, kp_oct, kp_valid,
        th_radius=10.0, th=H.TH_LOW, nn_ratio=1.0)
    return idx


class LoopCloser:
    def __init__(self, store, mapper, cam,
                 cfg: LoopCloserConfig = LoopCloserConfig(), kfdb=None):
        self.store = store
        self.mapper = mapper
        self.cam = cam
        self.cfg = cfg
        self.kfdb = kfdb or KeyFrameDatabase(store)
        self.last_loop_kf = -self.cfg.min_kf_gap
        self.consistent_groups: list[tuple[set, int]] = []
        self.loops: list[dict] = []
        self._key = jax.random.PRNGKey(11)

        from ..mapping.background_gba import BackgroundGBA
        self.gba = BackgroundGBA(store, cam)

    def reset(self):
        self.kfdb = KeyFrameDatabase(self.store, self.kfdb.vocab)
        self.consistent_groups = []
        self.last_loop_kf = -self.cfg.min_kf_gap
        self.gba.abort()


    # ------------------------------------------------------------------
    def precompile(self):
        """Compile every loop-detection kernel on DUMMY data.

        The first real loop candidate otherwise pays ~60-90 s of XLA
        compiles (sim3 RANSAC, SearchBySim3, projection top-up) on the
        mapping worker — and a hard-KF barrier joining that worker
        stalls tracking for the whole duration. Call once after system
        warmup (bench does)."""
        cfg, cam = self.cfg, self.cam
        P = self.store.cfg.max_kp
        signs = jnp.zeros((P, H.DESC_BITS), jnp.int8)
        live = jnp.zeros(P, bool)
        _bf_match_kernel(signs, live, signs, live)
        Np = cfg.sim3_pad
        z3 = jnp.zeros((Np, 3), jnp.float32)
        z2 = jnp.zeros((Np, 2), jnp.float32)
        zo = jnp.zeros(Np, jnp.int32)
        zv = jnp.zeros(Np, bool)
        self._key, k1 = jax.random.split(self._key)
        r = sim3_ransac(cam, z3, z3, z2, z2, zo, zo, zv, k1,
                        fix_scale=cfg.fix_scale)
        _search_by_sim3_kernel(
            cam, r["R12"], r["t12"], r["s12"],
            jnp.zeros((P, 3), jnp.float32), signs, jnp.zeros(P, jnp.int32),
            live, jnp.zeros((P, 2), jnp.float32),
            jnp.zeros((P, 3), jnp.float32), signs, jnp.zeros(P, jnp.int32),
            live, jnp.zeros((P, 2), jnp.float32),
            scale_factor=cfg.scale_factor)
        optimize_sim3(cam, r["R12"], r["t12"], r["s12"], z3, z3, z2, z2,
                      zo, zo, zv, fix_scale=cfg.fix_scale)
        L = cfg.max_loop_points
        _project_loop_points_kernel(
            cam, jnp.eye(3), jnp.zeros(3),
            jnp.zeros((L, 3), jnp.float32),
            jnp.zeros((L, H.DESC_BITS), jnp.int8),
            jnp.zeros((L, 3), jnp.float32), jnp.zeros(L, jnp.float32),
            jnp.ones(L, jnp.float32), jnp.zeros(L, bool),
            jnp.zeros((P, 2), jnp.float32), signs,
            jnp.zeros(P, jnp.int32), jnp.zeros(P, bool))
        jax.block_until_ready(jnp.zeros(1))

    # ------------------------------------------------------------------
    def insert_keyframe(self, kf: int) -> bool:
        """Run the loop pipeline for a new keyframe. Returns True if a
        loop was closed."""
        self.kfdb.add(kf)
        if self.cfg.vocab_train_at:
            self.kfdb.maybe_retrain(min_kfs=self.cfg.vocab_train_at)
        # harvest a finished background GBA (no-op while still running)
        self.gba.poll()
        if kf - self.last_loop_kf < self.cfg.min_kf_gap:
            return False
        cands = self._detect_loop(kf)
        for cand in cands:
            sim3 = self._compute_sim3(kf, cand)
            if sim3 is None:
                continue
            self._correct_loop(kf, cand, sim3)
            self.last_loop_kf = kf
            self.consistent_groups = []
            return True
        return False

    # ------------------------------------------------------------------
    def _detect_loop(self, kf: int):
        """Parity: LoopClosing::DetectLoop — candidates must be re-detected
        in 3 consecutive keyframes with covisibility-group overlap."""
        s, cfg = self.store, self.cfg
        raw = self.kfdb.detect_loop_candidates(kf)
        if not raw:
            self.consistent_groups = []
            return []
        enough = []
        new_groups: list[tuple[set, int]] = []
        for cand in raw:
            group = {cand} | {int(g) for g in
                              s.covisible_keyframes(cand, n_best=10)}
            best_consistency = 0
            for prev_group, count in self.consistent_groups:
                if group & prev_group:
                    best_consistency = max(best_consistency, count + 1)
            new_groups.append((group, best_consistency))
            if best_consistency >= cfg.consistency_threshold - 1:
                enough.append(cand)
        self.consistent_groups = new_groups
        return enough

    # ------------------------------------------------------------------
    def _kf_landmark_bundle(self, kf: int):
        """Features of kf that carry landmarks: positions in kf camera
        coords + descriptors + uv + octave, per feature slot."""
        s = self.store
        mp = s.kf_mp[kf]
        live = (mp >= 0) & s.mp_valid[np.maximum(mp, 0)]
        sel = np.where(live, mp, 0)
        xw = s.mp_pos[sel]
        xc = xw @ s.kf_R[kf].T + s.kf_t[kf]
        signs = H.to_signs(H.unpack_bits(s.mp_desc[sel]))
        return dict(mp=np.where(live, mp, -1), live=live, xw=xw, xc=xc,
                    signs=signs, uv=s.kf_uv[kf], octave=s.kf_octave[kf])

    def _pad_sim3_pairs(self, b1, b2, pairs):
        """Fixed-shape (sim3_pad) correspondence arrays from slot pairs so
        sim3_ransac / optimize_sim3 compile once (VERDICT r1 weak #2)."""
        Np = self.cfg.sim3_pad
        n = min(len(pairs), Np)
        if len(pairs) > Np:
            import sys
            print(f"[loop] sim3 correspondence set truncated "
                  f"{len(pairs)} -> {Np} (cfg.sim3_pad)", file=sys.stderr)
        i = np.zeros(Np, np.int64)
        j = np.zeros(Np, np.int64)
        valid = np.zeros(Np, bool)
        i[:n], j[:n] = pairs[:n, 0], pairs[:n, 1]
        valid[:n] = True
        return (jnp.asarray(b1["xc"][i]), jnp.asarray(b2["xc"][j]),
                jnp.asarray(b1["uv"][i]), jnp.asarray(b2["uv"][j]),
                jnp.asarray(b1["octave"][i]), jnp.asarray(b2["octave"][j]),
                jnp.asarray(valid))

    def _search_by_sim3(self, b1, b2, pairs, ransac):
        """SearchBySim3 top-up: grow the correspondence set by two-way
        projection with the RANSAC S12, keeping matches that agree in both
        directions (parity: the match12/match21 mutual check)."""
        m12, m21 = _search_by_sim3_kernel(
            self.cam, ransac["R12"], ransac["t12"], ransac["s12"],
            jnp.asarray(b1["xc"]), b1["signs"],
            jnp.asarray(b1["octave"]), jnp.asarray(b1["live"]),
            jnp.asarray(b1["uv"]),
            jnp.asarray(b2["xc"]), b2["signs"],
            jnp.asarray(b2["octave"]), jnp.asarray(b2["live"]),
            jnp.asarray(b2["uv"]),
            scale_factor=self.cfg.scale_factor)
        m12 = np.asarray(m12)
        m21 = np.asarray(m21)
        i = np.nonzero(m12 >= 0)[0]
        j = m12[i]
        agree = m21[j] == i
        new_pairs = np.stack([i[agree], j[agree]], 1)
        # skip already-matched features on BOTH sides (reference marks
        # vbAlreadyMatched1/2 from the existing match set) — sets built
        # once, not per candidate pair
        used1 = {int(q[0]) for q in pairs}
        used2 = {int(q[1]) for q in pairs}
        fresh = [p for p in new_pairs
                 if int(p[0]) not in used1 and int(p[1]) not in used2]
        if fresh:
            pairs = np.concatenate([pairs, np.asarray(fresh)], 0)
        return pairs

    def _compute_sim3(self, kf: int, cand: int):
        """Parity: LoopClosing::ComputeSim3 for one candidate."""
        cfg, cam = self.cfg, self.cam
        b1 = self._kf_landmark_bundle(kf)       # current
        b2 = self._kf_landmark_bundle(cand)     # loop candidate
        idx = np.asarray(_bf_match_kernel(
            b1["signs"], jnp.asarray(b1["live"]),
            b2["signs"], jnp.asarray(b2["live"])))
        rows = np.nonzero(idx >= 0)[0]
        if len(rows) < cfg.min_bow_matches:
            return None
        pairs = np.stack([rows, idx[rows]], 1)
        p1, p2, uv1, uv2, o1, o2, valid = self._pad_sim3_pairs(b1, b2, pairs)
        self._key, k1 = jax.random.split(self._key)
        ransac = sim3_ransac(cam, p1, p2, uv1, uv2, o1, o2, valid, k1,
                             fix_scale=cfg.fix_scale)
        if not bool(ransac["ok"]):
            return None
        # SearchBySim3 match top-up between RANSAC and the GN refinement
        pairs = self._search_by_sim3(b1, b2, pairs, ransac)
        p1, p2, uv1, uv2, o1, o2, valid = self._pad_sim3_pairs(b1, b2, pairs)
        ref = optimize_sim3(cam, ransac["R12"], ransac["t12"],
                            ransac["s12"], p1, p2, uv1, uv2, o1, o2,
                            valid, fix_scale=cfg.fix_scale)
        if int(ref["n_inliers"]) < cfg.min_sim3_inliers:
            return None
        # projection top-up: loop-neighborhood landmarks -> current KF
        n_total = self._count_projected_matches(kf, cand, ref)
        if n_total < cfg.min_total_matches:
            return None
        return dict(R12=np.asarray(ref["R12"]), t12=np.asarray(ref["t12"]),
                    s12=float(ref["s12"]), n_inliers=int(ref["n_inliers"]),
                    n_total=n_total)

    def _loop_neighborhood_points(self, cand: int):
        s = self.store
        kfs = np.concatenate([[cand], s.covisible_keyframes(cand,
                                                            n_best=10)])
        return s.local_map_points(kfs.astype(np.int64))

    def _count_projected_matches(self, kf: int, cand: int, sim3) -> int:
        """Parity: SearchByProjection(CurrentKF, Scw, loop points, 10)."""
        s, cam, cfg = self.store, self.cam, self.cfg
        mp_ids = self._loop_neighborhood_points(cand)
        bundle = s.gather_map_points(mp_ids, pad_to=cfg.max_loop_points)
        signs = H.to_signs(H.unpack_bits(bundle["desc"]))
        # corrected current pose: Scw = S12 · T_cand_w  (world -> current)
        R12 = np.asarray(sim3["R12"])
        t12 = np.asarray(sim3["t12"])
        s12 = float(sim3["s12"])
        Rcw = R12 @ s.kf_R[cand]
        tcw = s12 * (R12 @ s.kf_t[cand]) + t12
        # scale the world points' camera depth via s12: fold s into R,t by
        # projecting x_c = s12*R x + t -> use scaled pose (s*R, t)
        idx = _project_loop_points_kernel(
            cam, jnp.asarray(s12 * Rcw, jnp.float32),
            jnp.asarray(tcw, jnp.float32),
            jnp.asarray(bundle["pos"]), signs, jnp.asarray(bundle["normal"]),
            jnp.asarray(bundle["dmin"]), jnp.asarray(bundle["dmax"]),
            jnp.asarray(bundle["valid"]),
            jnp.asarray(s.kf_uv[kf]), self.mapper.kf_signs(kf),
            jnp.asarray(s.kf_octave[kf]), jnp.asarray(s.kf_kp_valid[kf]))
        self._loop_match = (np.asarray(idx), np.asarray(bundle["ids"]))
        return int((np.asarray(idx) >= 0).sum())

    # ------------------------------------------------------------------
    def _correct_loop(self, kf: int, cand: int, sim3):
        """Parity: LoopClosing::CorrectLoop — propagate the corrected Sim3
        over the current covisible group, fuse, optimize essential graph,
        run global BA."""
        s, cfg, cam = self.store, self.cfg, self.cam
        group = [kf] + [int(g) for g in s.covisible_keyframes(kf)]
        # corrected Scw for current KF: S12 · T_cand_w
        R12, t12, s12 = sim3["R12"], sim3["t12"], sim3["s12"]
        R_corr = R12 @ s.kf_R[cand]
        t_corr = s12 * (R12 @ s.kf_t[cand]) + t12
        s_corr = s12
        # uncorrected current pose + full pre-correction snapshot (edge
        # measurements for the essential graph must be the odometry
        # relatives, parity with the NonCorrectedSim3 map)
        R_cur, t_cur = s.kf_R[kf].copy(), s.kf_t[kf].copy()
        pre_R, pre_t = s.kf_R.copy(), s.kf_t.copy()

        corrected = {}
        for g in group:
            # T_g_cur = T_g_w · T_w_cur
            Rg, tg = s.kf_R[g], s.kf_t[g]
            R_gc = Rg @ R_cur.T
            t_gc = tg - R_gc @ t_cur
            # corrected S_gw = T_g_cur ∘ S_cur_w:
            #   x -> R_gc (s_corr R_corr x + t_corr) + t_gc
            Rn = R_gc @ R_corr
            tn = (R_gc @ t_corr) + t_gc
            corrected[g] = (Rn, tn, s_corr)

        # correct landmarks observed by the group: X' = S_new^-1(S_old(X))
        # — under the map-update lock (mMutexMapUpdate parity: loop
        # correction vs the tracking thread's pose-anchor reads)
        s.lock.acquire()
        moved = set()
        for g in group:
            Rn, tn, sn = corrected[g]
            mps = s.kf_mp[g]
            mps = np.unique(mps[mps >= 0])
            mps = mps[s.mp_valid[mps]]
            fresh = [m for m in mps if m not in moved]
            if not fresh:
                continue
            fresh = np.asarray(fresh, np.int64)
            moved.update(int(m) for m in fresh)
            X = s.mp_pos[fresh]
            xc = X @ s.kf_R[g].T + s.kf_t[g]            # old (metric) coords
            # invert corrected Sim3: X' = (1/s) R^T (xc - t)
            Xn = ((xc - tn) @ Rn) / sn
            s.mp_pos[fresh] = Xn
        # write corrected keyframe poses (scale folded into translation)
        for g in group:
            Rn, tn, sn = corrected[g]
            s.kf_R[g] = Rn
            s.kf_t[g] = tn / sn
        s.bump()   # poses/landmarks moved -> invalidate device caches
        s.lock.release()

        # fuse loop landmarks into the corrected current KF
        idx, ids = getattr(self, "_loop_match", (None, None))
        if idx is not None:
            for row in np.nonzero(idx >= 0)[0]:
                mp_new = int(ids[row])
                feat = int(idx[row])
                if mp_new < 0 or not s.mp_valid[mp_new]:
                    continue
                mp_old = int(s.kf_mp[kf, feat])
                if mp_old >= 0 and s.mp_valid[mp_old] and mp_old != mp_new:
                    s.replace_map_point(mp_old, mp_new)
                elif mp_old < 0:
                    s.add_observation(mp_new, kf, feat)
        self.mapper.search_in_neighbors(kf)

        # record loop edge
        s.kf_loop_edges.setdefault(kf, set()).add(cand)
        s.kf_loop_edges.setdefault(cand, set()).add(kf)
        s.update_connections(kf)

        self._optimize_essential_graph(kf, cand, pre_R, pre_t)
        if cfg.run_global_ba:
            if cfg.background_gba:
                # abort any in-flight GBA (its snapshot is stale now) and
                # start a fresh one over the corrected map — parity with
                # the mbStopGBA + new thread(RunGlobalBundleAdjustment)
                # hand-off in CorrectLoop
                self.gba.abort()
                self.gba.launch()
            else:
                global_bundle_adjustment(s, cam)
        # refresh landmark derived state
        live = s.map_point_ids()
        s.update_normal_and_depth(live)
        self.loops.append(dict(kf=kf, cand=cand, **{k: v for k, v in
                                                    sim3.items()}))

    # ------------------------------------------------------------------
    def _optimize_essential_graph(self, kf: int, cand: int, pre_R, pre_t):
        """Build the essential graph (spanning tree + loop + strong covis
        edges) and run the Sim3 pose-graph GN; then correct landmarks via
        their reference keyframes. pre_R/pre_t: pose snapshot from BEFORE
        the Sim3 correction (odometry edge measurements)."""
        s, cfg = self.store, self.cfg
        kf_ids = s.keyframe_ids()
        K = s.cfg.max_keyframes
        R = s.kf_R.copy().astype(np.float32)
        t = s.kf_t.copy().astype(np.float32)
        sc = np.ones(K, np.float32)
        vert_valid = s.kf_valid.copy()
        fixed = np.zeros(K, bool)
        fixed[cand] = True                     # ref fixes the loop KF
        fixed[~vert_valid] = True

        edges = set()
        for i in kf_ids:
            i = int(i)
            p = int(s.kf_parent[i])
            if p >= 0 and s.kf_valid[p]:
                edges.add((min(i, p), max(i, p)))
            for j in s.kf_loop_edges.get(i, ()):  # loop edges
                if s.kf_valid[j]:
                    edges.add((min(i, int(j)), max(i, int(j))))
            w = s.covis[i]
            for j in np.nonzero(w >= cfg.covis_edge_min_weight)[0]:
                if s.kf_valid[j]:
                    edges.add((min(i, int(j)), max(i, int(j))))
        edges = sorted(edges)
        # pad the edge axis to a power-of-two bucket: a fresh shape per
        # loop event would mint a fresh XLA compile on the worker thread
        E = 64
        while E < len(edges):
            E *= 2
        ei = np.zeros(E, np.int32)
        ej = np.zeros(E, np.int32)
        eR = np.tile(np.eye(3, dtype=np.float32), (E, 1, 1))
        et = np.zeros((E, 3), np.float32)
        es = np.ones(E, np.float32)
        evalid = np.zeros(E, bool)
        for n, (i, j) in enumerate(edges):
            ei[n], ej[n] = i, j
            # odometry edges measure the PRE-correction relative pose;
            # loop edges measure the corrected one (the new constraint)
            is_loop = j in s.kf_loop_edges.get(i, ())
            Ri, ti = (s.kf_R[i], s.kf_t[i]) if is_loop else (pre_R[i],
                                                             pre_t[i])
            Rj, tj = (s.kf_R[j], s.kf_t[j]) if is_loop else (pre_R[j],
                                                             pre_t[j])
            Rji = Rj @ Ri.T
            tji = tj - Rji @ ti
            eR[n], et[n] = Rji, tji
            evalid[n] = True
        out = optimize_essential_graph(
            jnp.asarray(R), jnp.asarray(t), jnp.asarray(sc),
            jnp.asarray(vert_valid), jnp.asarray(fixed),
            jnp.asarray(ei), jnp.asarray(ej), jnp.asarray(eR),
            jnp.asarray(et), jnp.asarray(es), jnp.asarray(evalid),
            n_iters=20, fix_scale=cfg.fix_scale)
        Rn = lie.project_so3(np.asarray(out["R"]))
        tn = np.array(out["t"])
        sn = np.array(out["s"])
        # guard against diverged slots (project_so3 marks them NaN): keep
        # the pre-optimization pose for any non-finite vertex
        bad = ~(np.isfinite(Rn).all((-1, -2)) & np.isfinite(tn).all(-1)
                & np.isfinite(sn) & (np.abs(sn) > 1e-12))
        Rn[bad] = s.kf_R[bad]
        tn[bad] = s.kf_t[bad]
        sn[bad] = 1.0
        # landmark correction via reference KF (first observer):
        # X' = S_new^-1 ( S_old (X) ) — fenced by the map-update lock
        s.lock.acquire()
        mp_ids = s.map_point_ids()
        ref_kf = s.mp_obs_kf[mp_ids, 0]
        good = ref_kf >= 0
        mp_ids = mp_ids[good]
        ref_kf = ref_kf[good]
        X = s.mp_pos[mp_ids]
        xc = np.einsum("kij,kj->ki", pre_R[ref_kf], X) + pre_t[ref_kf]
        Xn = np.einsum("kji,kj->ki",
                       Rn[ref_kf], xc - tn[ref_kf]) / sn[ref_kf][:, None]
        s.mp_pos[mp_ids] = Xn
        # write keyframe poses (SE3 with scale folded into t)
        ids = s.keyframe_ids()
        s.kf_R[ids] = Rn[ids]
        s.kf_t[ids] = tn[ids] / sn[ids][:, None]
        s.bump()   # poses/landmarks moved -> invalidate device caches
        s.lock.release()
