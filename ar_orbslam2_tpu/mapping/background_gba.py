"""Background, abortable global bundle adjustment.

Parity: LoopClosing::RunGlobalBundleAdjustment (src/LoopClosing.cc:≈600)
+ the mbStopGBA abort protocol (src/LocalMapping.cc:≈241). The reference
runs full-map BA in a transient POSIX thread while tracking/mapping
continue, aborts it if a new loop closes, and on completion propagates the
corrected poses to keyframes created meanwhile via the spanning tree.

TPU-native redesign: instead of a thread, the BA is dispatched
ASYNCHRONOUSLY — JAX enqueues the jitted bundle_adjust and returns device
futures immediately; the tracking pipeline keeps dispatching its own work
(the device interleaves; nothing blocks). The host polls `is_ready()` on
one output buffer at each keyframe event (a local future check, no device
round trip), fetches results with one batched readback when done, and
write-backs are fenced by a map-version snapshot: keyframes/landmarks
created after the snapshot get the reference's spanning-tree / reference-
keyframe propagation.
"""
from __future__ import annotations

import jax
import numpy as np

from .global_ba import dispatch_global_ba, gather_global


class BackgroundGBA:
    """Abortable async full-map BA with post-hoc propagation."""

    def __init__(self, store, cam, n_iters: int = 20):
        self.store = store
        self.cam = cam
        self.n_iters = n_iters
        self._job = None
        self.n_launched = 0
        self.n_applied = 0
        self.n_aborted = 0

    # ------------------------------------------------------------------
    def running(self) -> bool:
        return self._job is not None

    def abort(self):
        """Parity: mbStopGBA — drop the in-flight result unapplied."""
        if self._job is not None:
            self._job = None
            self.n_aborted += 1

    def launch(self):
        """Snapshot the map and dispatch full BA asynchronously."""
        if self._job is not None:
            self.abort()
        s = self.store
        g = gather_global(s)
        # auto-routes through the landmark-sharded distributed engine on
        # a multi-device mesh (global_ba.dispatch_global_ba)
        res = dispatch_global_ba(g, self.cam, n_iters=self.n_iters)
        self._job = dict(
            res=res, g=g,
            kf_in=set(int(k) for k in g["kf_arr"][:g["n_kf"]]),
            mp_in=set(int(m) for m in g["mp_arr"][:g["n_mp"]]))
        self.n_launched += 1

    # ------------------------------------------------------------------
    def poll(self, block: bool = False) -> bool:
        """Apply the result if finished (or wait for it if block=True).
        Returns True when a write-back happened."""
        job = self._job
        if job is None:
            return False
        probe = job["res"]["cam_R"]
        if not block:
            try:
                if not probe.is_ready():
                    return False
            except AttributeError:       # non-jax array (tests)
                pass
        res = jax.device_get(dict(cam_R=job["res"]["cam_R"],
                                  cam_t=job["res"]["cam_t"],
                                  pts=job["res"]["pts"]))
        self._job = None
        self._apply(job, res)
        self.n_applied += 1
        return True

    # ------------------------------------------------------------------
    def _apply(self, job, res):
        """Write back + propagate (the stop-the-mapper section of
        RunGlobalBundleAdjustment)."""
        from ..core.lie import project_so3
        s, g = self.store, job["g"]
        # write-back + propagation under the map-update lock (the
        # stop-the-mapper section of RunGlobalBundleAdjustment)
        with s.lock:
            self._apply_locked(job, res, g, s, project_so3)

    def _apply_locked(self, job, res, g, s, project_so3):
        cam_R = project_so3(res["cam_R"])
        cam_t = np.asarray(res["cam_t"])
        pts = np.asarray(res["pts"])
        nk, nm = g["n_kf"], g["n_mp"]
        kf_ids = g["kf_arr"][:nk]
        ok_R = (np.isfinite(cam_R[:nk]).all((-1, -2))
                & np.isfinite(cam_t[:nk]).all(-1))
        upd = kf_ids[ok_R]
        # pre-write-back snapshot (APPLY time, not launch time): every
        # keyframe — including ones created while the BA ran — has its
        # current old-map-frame pose here, which is what the relative-
        # pose propagation below must be anchored to
        old_R, old_t = s.kf_R.copy(), s.kf_t.copy()
        alive = s.kf_valid[upd]
        s.kf_R[upd[alive]] = cam_R[:nk][ok_R][alive]
        s.kf_t[upd[alive]] = cam_t[:nk][ok_R][alive]

        # ---- spanning-tree propagation for keyframes created since ----
        in_ba = job["kf_in"]
        new_kfs = [int(k) for k in s.keyframe_ids() if int(k) not in in_ba]
        for k in new_kfs:
            anc = int(s.kf_parent[k])
            hops = 0
            while anc >= 0 and anc not in in_ba and hops < 64:
                anc = int(s.kf_parent[anc])
                hops += 1
            if anc < 0 or anc not in in_ba:
                continue
            # T_k_new = (T_k_old ∘ T_anc_old^-1) ∘ T_anc_new
            R_rel = old_R[k] @ old_R[anc].T
            t_rel = old_t[k] - R_rel @ old_t[anc]
            s.kf_R[k] = R_rel @ s.kf_R[anc]
            s.kf_t[k] = R_rel @ s.kf_t[anc] + t_rel

        # ---- landmarks -------------------------------------------------
        mp_ids = g["mp_arr"][:nm]
        ok_p = np.isfinite(pts[:nm]).all(-1)
        sel = mp_ids[ok_p]
        alive_p = s.mp_valid[sel]
        s.mp_pos[sel[alive_p]] = pts[:nm][ok_p][alive_p]
        # new landmarks: correct via their reference (first-observer) KF
        in_mp = job["mp_in"]
        new_mps = np.asarray([int(m) for m in s.map_point_ids()
                              if int(m) not in in_mp], np.int64)
        if len(new_mps):
            ref = s.mp_obs_kf[new_mps, 0]
            good = ref >= 0
            new_mps, ref = new_mps[good], ref[good]
            X = s.mp_pos[new_mps]
            xc = np.einsum("kij,kj->ki", old_R[ref], X) + old_t[ref]
            Xn = np.einsum("kji,kj->ki", s.kf_R[ref], xc - s.kf_t[ref])
            s.mp_pos[new_mps] = Xn
        s.bump()
