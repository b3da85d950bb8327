"""SlamSystem — the public facade, parity with the reference System API.

TPU-native redesign of System (src/System.cc, include/System.h, SURVEY.md
§2.1): same surface — track_monocular/track_stereo/track_rgbd, localization
mode, reset, shutdown, trajectory export in TUM and KITTI formats — but the
three POSIX threads become explicit pipeline stages (Tracking -> LocalMapper
-> LoopCloser) sequenced by the host around fixed-shape jitted kernels.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..core.camera import Camera
from ..mapstore.map import MapConfig, MapStore
from ..mapping.local_mapping import LocalMapper, LocalMapperConfig
from ..ops import hamming as H
from .frame import Frame
from .tracking import Tracking, TrackingConfig

MONOCULAR = "MONOCULAR"
STEREO = "STEREO"
RGBD = "RGBD"


@dataclass
class SlamConfig:
    sensor: str = MONOCULAR
    map: MapConfig = field(default_factory=MapConfig)
    tracking: TrackingConfig = field(default_factory=TrackingConfig)
    mapper: LocalMapperConfig = field(default_factory=LocalMapperConfig)
    orb_n_features: int = 1000
    enable_loop_closing: bool = True
    enable_relocalization: bool = True
    depth_threshold: float = 40.0      # ThDepth * baseline gate (stereo)
    # device-resident fused tracking for the image->mono path (one
    # dispatch chain + one readback per frame; system/fused.py)
    use_fused_tracking: bool = True
    # run the mapping stage on a worker thread, reference-style (the
    # LocalMapping/LoopClosing threads): tracking never waits for
    # mapping; keyframes are dropped while the mapper is busy
    async_mapping: bool = False


class SlamSystem:
    """End-to-end SLAM pipeline with the reference System's API surface."""

    def __init__(self, cam: Camera, cfg: SlamConfig = SlamConfig()):
        import copy
        from dataclasses import replace
        self.cam = cam
        # private copy: never mutate the caller's (possibly shared/default)
        # config instance, and always derive camera-dependent fields from
        # THIS camera (a reused config must not keep another camera's
        # depth threshold)
        cfg = copy.copy(cfg)
        # keep the map's scale-band parameters in sync with the tracker's
        # pyramid config (one source of truth: TrackingConfig)
        if (cfg.map.scale_factor != cfg.tracking.scale_factor
                or cfg.map.n_levels != cfg.tracking.n_levels):
            cfg.map = replace(cfg.map,
                              scale_factor=cfg.tracking.scale_factor,
                              n_levels=cfg.tracking.n_levels)
        # stereo/RGB-D close-point threshold: ThDepth * baseline meters
        # (parity: mThDepth = mbf * ThDepth / fx, Tracking ctor)
        if cfg.sensor != MONOCULAR:
            th_m = cfg.depth_threshold * (cam.bf / cam.fx) \
                if cam.bf > 0 else cfg.depth_threshold
            cfg.tracking = replace(cfg.tracking,
                                   depth_threshold_m=float(th_m))
        self.cfg = cfg
        self.store = MapStore(cfg.map)
        self.mapper = LocalMapper(self.store, cam, cfg.mapper)
        self.tracking = Tracking(self.store, self.mapper, cam, cfg.tracking)
        self._orb_cfg = None
        self.kfdb = None
        if cfg.enable_loop_closing or cfg.enable_relocalization:
            from ..loop.place_recognition import KeyFrameDatabase
            self.kfdb = KeyFrameDatabase(self.store)
        if cfg.enable_loop_closing:
            from ..loop.loop_closing import LoopCloser, LoopCloserConfig
            self.tracking.loop_closer = LoopCloser(
                self.store, self.mapper, cam,
                cfg=LoopCloserConfig(
                    fix_scale=cfg.sensor != MONOCULAR,
                    scale_factor=cfg.tracking.scale_factor),
                kfdb=self.kfdb)
        if cfg.enable_relocalization:
            from ..estimation.relocalization import Relocalizer
            self.tracking.relocalizer = Relocalizer(
                self.store, self.mapper, cam, cfg.tracking, kfdb=self.kfdb)
        if cfg.use_fused_tracking and cfg.sensor == MONOCULAR:
            from ..frontend.orb import OrbConfig
            from .fused import FusedFrontend
            self._orb_cfg = OrbConfig(n_features=cfg.tracking.max_kp)
            self.tracking.fused = FusedFrontend(
                self.store, cam, cfg.tracking, self._orb_cfg)
        if cfg.async_mapping:
            from ..mapping.async_mapper import AsyncMapper
            self.tracking.async_mapper = AsyncMapper(
                self.mapper, loop_closer=self.tracking.loop_closer,
                relocalizer=self.tracking.relocalizer)
        self._next_frame_id = 0

    # ------------------------------------------------------------------
    # frame construction
    # ------------------------------------------------------------------
    def _extract(self, image_u8):
        """Run the ORB frontend on a grayscale image (device kernels)."""
        import jax.numpy as jnp

        from ..frontend.orb import OrbConfig, extract_orb

        if self._orb_cfg is None:
            self._orb_cfg = OrbConfig(n_features=self.cfg.tracking.max_kp)
        import jax
        out = extract_orb(jnp.asarray(image_u8), self._orb_cfg)
        # ONE batched readback — per-key np.asarray paid a ~14 ms
        # transfer floor each (profiled: 6 keys = 84 ms/frame on the
        # legacy path)
        return jax.device_get(out)

    def make_frame(self, image_u8=None, features=None, timestamp=0.0,
                   uvr=None, depth=None) -> Frame:
        """Build a Frame from an image (ORB extraction) or a feature dict
        (uv / desc (bits) / octave / valid [/ angle]) padded to max_kp."""
        if features is None:
            assert image_u8 is not None
            f = self._extract(image_u8)
            features = dict(uv=f["uv"], desc=f["desc_bits"],
                            octave=f["octave"], valid=f["valid"],
                            angle=f["angle"])
        P = self.cfg.tracking.max_kp

        def pad(a, fill=0.0):
            a = np.asarray(a)
            if a.shape[0] == P:
                return a
            out = np.full((P,) + a.shape[1:], fill, a.dtype)
            out[:a.shape[0]] = a[:P]
            return out

        uv = pad(features["uv"].astype(np.float32))
        if self.cam.has_distortion:
            import jax.numpy as jnp

            from ..core.camera import undistort_points
            uv = np.asarray(undistort_points(self.cam, jnp.asarray(uv)))
        frame = Frame(
            uv=uv,
            desc_bits=pad(features["desc"].astype(np.uint8)),
            octave=pad(features["octave"].astype(np.int32)),
            valid=pad(features["valid"].astype(bool), False),
            angle=pad(features.get("angle",
                                   np.zeros(P, np.float32)).astype(np.float32)),
            uvr=None if uvr is None else pad(uvr.astype(np.float32), -1.0),
            depth=None if depth is None else pad(depth.astype(np.float32),
                                                 -1.0),
            timestamp=timestamp, frame_id=self._next_frame_id)
        self._next_frame_id += 1
        return frame

    # ------------------------------------------------------------------
    # reference API surface
    # ------------------------------------------------------------------
    def track_monocular(self, image_u8=None, timestamp=0.0, features=None):
        """Parity: System::TrackMonocular — returns Tcw (4x4) or None."""
        t = self.tracking
        fe = t.fused
        if image_u8 is not None and features is None and fe is not None \
                and t.state == "OK":
            if not fe.ready():
                lf = t.last_frame
                if lf is not None and lf.R is not None and t.ref_kf >= 0 \
                        and self.store.kf_valid[t.ref_kf]:
                    fe.rebuild(t.ref_kf, lf.mp, lf.R, lf.t,
                               velocity=t.velocity, prev_oct=lf.octave)
                    t._fused_prev_pose = (lf.R.copy(), lf.t.copy())
            if fe.ready():
                fid = self._next_frame_id
                self._next_frame_id += 1
                rec = t.track_fused(image_u8, timestamp, fid)
                if rec.get("ok") and rec.get("R") is not None:
                    T = np.eye(4, dtype=np.float32)
                    T[:3, :3] = rec["R"]
                    T[:3, 3] = rec["t"]
                    return T
                return None
        frame = self.make_frame(image_u8, features, timestamp)
        rec = self.tracking.track(frame)
        self.last_frame = frame
        if rec.get("ok") and frame.R is not None:
            T = np.eye(4, dtype=np.float32)
            T[:3, :3] = frame.R
            T[:3, 3] = frame.t
            return T
        return None

    def track_monocular_batch(self, images, timestamps=None, chunk=8):
        """Throughput API: track a sequence of mono images, processing
        OK-state stretches as fused device chunks (one dispatch + one
        readback per `chunk` frames — see system/fused.track_chunk).
        Initialization, relocalization, and keyframe events fall back to
        the per-frame paths. Returns a list of Tcw (4x4) or None.

        With async mapping the chunks are double-buffered: the next
        chunk is dispatched BEFORE the previous one's records are read
        back, so the device never idles between chunks and keyframe
        events ride the pipeline instead of stalling it."""
        t = self.tracking
        fe = t.fused
        n = len(images)
        if timestamps is None:
            timestamps = [i / 30.0 for i in range(n)]
        if fe is not None and t.async_mapper is not None:
            return self._track_batch_pipelined(images, timestamps, chunk)
        poses: list = []
        am = t.async_mapper
        i = 0
        while i < n:
            if fe is not None and t.state == "OK" and n - i >= chunk:
                mapper_idle = am is None or not am.busy()
                if fe.state is None:
                    lf = t.last_frame
                    if lf is not None and lf.R is not None \
                            and t.ref_kf >= 0 \
                            and self.store.kf_valid[t.ref_kf]:
                        fe.rebuild(t.ref_kf, lf.mp, lf.R, lf.t,
                                   velocity=t.velocity, prev_oct=lf.octave)
                        t._fused_prev_pose = (lf.R.copy(), lf.t.copy())
                elif not fe.ready() and mapper_idle \
                        and t.ref_kf >= 0 \
                        and self.store.kf_valid[t.ref_kf]:
                    # async mapping/loop finished: re-anchor the bundle
                    with self.store.lock:
                        fe.refresh_bundle(t.ref_kf, rel_pose=t.last_rel)
                # a stale-but-usable bundle still tracks (the reference's
                # tracking thread rides the old map while mapping runs)
                if fe.state is not None:
                    base = self._next_frame_id
                    consumed = t.track_fused_chunk(
                        np.stack(images[i:i + chunk]),
                        timestamps[i:i + chunk], base)
                    self._next_frame_id = base + consumed
                    for c in range(consumed):
                        rec = t.metrics[-(consumed - c)]
                        T = np.eye(4, dtype=np.float32)
                        T[:3, :3] = rec["R"]
                        T[:3, 3] = rec["t"]
                        poses.append(T)
                    i += consumed
                    if consumed == chunk or (consumed > 0
                                             and t.state == "OK"):
                        continue    # full chunk, or mid-chunk KF event
                    # mid-chunk failure: fall through to per-frame path
            poses.append(self.track_monocular(images[i],
                                              timestamp=timestamps[i]))
            i += 1
        return poses

    def _track_batch_pipelined(self, images, timestamps, chunk):
        """Double-buffered chunk pipeline (async-mapping mode).

        Invariants: at most one chunk in flight beyond the one being
        processed; frame-id assignment advances at dispatch and REWINDS
        on a mid-chunk tracking failure (the prefetched chunk's results
        are discarded and its frames re-enter the per-frame path);
        the device bundle refresh (after the mapper goes idle) drains
        the pipeline first, since a dispatch already in flight rides the
        old bundle."""
        import time as _time
        t = self.tracking
        fe = t.fused
        am = t.async_mapper
        s = self.store
        n = len(images)
        poses: list = []
        i = 0
        pending = None      # (start_i, base_fid, count, handle, ts_slice)

        def can_rebuild():
            # one consistent snapshot vs the worker's atomic publish of
            # (ref_kf, last_kf_frame_id, last_frame) under store.lock
            with s.lock:
                lf = t.last_frame
                return (lf is not None and lf.R is not None
                        and t.ref_kf >= 0 and s.kf_valid[t.ref_kf])

        while i < n or pending is not None:
            if pending is None:
                can = t.state == "OK" and n - i >= chunk
                if can and fe.state is None and can_rebuild():
                    lf = t.last_frame
                    fe.rebuild(t.ref_kf, lf.mp, lf.R, lf.t,
                               velocity=t.velocity, prev_oct=lf.octave)
                    t._fused_prev_pose = (lf.R.copy(), lf.t.copy())
                elif can and fe.state is not None and not fe.ready() \
                        and t.ref_kf >= 0 and s.kf_valid[t.ref_kf]:
                    with s.lock:
                        fe.refresh_bundle_device(t.ref_kf)
                if can and fe.state is not None:
                    base = self._next_frame_id
                    handle = fe.dispatch_chunk(np.stack(images[i:i + chunk]))
                    self._next_frame_id = base + chunk
                    pending = (i, base, chunk, handle,
                               timestamps[i:i + chunk])
                    i += chunk
                    continue
                poses.append(self.track_monocular(
                    images[i], timestamp=timestamps[i]))
                i += 1
                continue

            # prefetch the next chunk; a refresh never drains the
            # pipeline — refresh_bundle_device chains AFTER the in-flight
            # chunk and re-anchors its final state on device. Refresh
            # BEFORE the prefetch dispatch whenever the mapper published:
            # refreshing only after record processing made the new map
            # effective TWO chunks late, and a fast sweep outran it
            # (measured: 463 -> 38 inliers across 16 frames while the
            # worker's triangulated points sat outside the bundle)
            nxt = None
            if n - i >= chunk:
                with s.lock:
                    stale = (not fe.ready() and t.ref_kf >= 0
                             and s.kf_valid[t.ref_kf])
                    if stale:
                        fe.refresh_bundle_device(t.ref_kf)
                base = self._next_frame_id
                handle = fe.dispatch_chunk(np.stack(images[i:i + chunk]))
                self._next_frame_id = base + chunk
                nxt = (i, base, chunk, handle, timestamps[i:i + chunk])
                i += chunk

            start_p, base_p, cnt_p, handle_p, ts_p = pending
            t0 = _time.perf_counter()
            recs = fe.collect_chunk(handle_p)
            ms = (_time.perf_counter() - t0) * 1e3 / cnt_p
            epoch0 = fe._bundle_epoch
            consumed = t.track_fused_chunk_async(
                recs, ts_p, base_p, ms_per_frame=ms)
            for c in range(consumed):
                rec = t.metrics[-(consumed - c)]
                T = np.eye(4, dtype=np.float32)
                T[:3, :3] = rec["R"]
                T[:3, 3] = rec["t"]
                poses.append(T)
            if consumed < cnt_p:
                # tracking failed mid-chunk: discard the prefetched chunk
                # (its device state mutations die with the rebuild) and
                # re-enter the per-frame path at the failed frame
                self._next_frame_id = base_p + consumed
                i = start_p + consumed
                pending = None
                continue
            if fe._bundle_epoch != epoch0 and nxt is not None:
                # a HARD keyframe event rebuilt the device bundle while
                # the prefetched chunk was in flight: that chunk rode the
                # PRE-rebuild map mid-collapse and its frames are doomed
                # (measured: consuming them went LOST -> full map reset).
                # Discard it and re-dispatch against the fresh bundle.
                _, base_n, _, _, _ = nxt
                self._next_frame_id = base_n
                i = nxt[0]
                nxt = None
            # mapping wrote since this bundle was built: swap in the
            # current map (device-side, chains after the in-flight chunk)
            if not fe.ready() and t.ref_kf >= 0 and s.kf_valid[t.ref_kf]:
                with s.lock:
                    fe.refresh_bundle_device(t.ref_kf)
            pending = nxt
        return poses

    def track_stereo(self, left_u8, right_u8, timestamp=0.0):
        """Parity: System::TrackStereo."""
        from ..frontend.stereo import stereo_frame_features
        feats, uvr, depth = stereo_frame_features(
            self, left_u8, right_u8)
        frame = self.make_frame(features=feats, timestamp=timestamp,
                                uvr=uvr, depth=depth)
        return self._track_with_depth(frame)

    def track_rgbd(self, image_u8=None, depth_m=None, timestamp=0.0,
                   features=None, kp_depth=None):
        """Parity: System::TrackRGBD — depth in meters (already scaled).
        kp_depth: optional per-keypoint depth (skips depth-map sampling,
        for feature-level synthetic pipelines)."""
        frame = self.make_frame(image_u8, features, timestamp)
        if kp_depth is not None:
            z = np.asarray(kp_depth, np.float32)[:len(frame.uv)]
        else:
            # sample depth at keypoint locations -> stereo-equivalent uvr
            d = np.asarray(depth_m)
            ui = np.clip(frame.uv[:, 0].round().astype(int), 0,
                         d.shape[1] - 1)
            vi = np.clip(frame.uv[:, 1].round().astype(int), 0,
                         d.shape[0] - 1)
            z = d[vi, ui].astype(np.float32)
        if len(z) < len(frame.uv):
            z = np.pad(z, (0, len(frame.uv) - len(z)),
                       constant_values=-1.0)
        good = frame.valid & (z > 0)
        frame.depth = np.where(good, z, -1.0).astype(np.float32)
        if self.cam.bf > 0:
            frame.uvr = np.where(good, frame.uv[:, 0] - self.cam.bf
                                 / np.maximum(z, 1e-6), -1.0).astype(np.float32)
        return self._track_with_depth(frame)

    def _track_with_depth(self, frame):
        rec = self.tracking.track(frame)
        self.last_frame = frame
        if rec.get("ok") and frame.R is not None:
            T = np.eye(4, dtype=np.float32)
            T[:3, :3] = frame.R
            T[:3, 3] = frame.t
            return T
        return None

    def precompile(self, n_frames=40):
        """Compile every kernel the live system can hit, ON THE CALLING
        THREAD, before real tracking starts.

        Why: XLA compiles issued from the mapping worker / background-GBA
        threads while the tracking thread streams dispatches were
        observed (live, axon transport) to deadlock inside
        backend_compile_and_load — the worker wedged forever and the map
        stopped growing. After this runs, every jitted entry point is in
        jax's in-process executable cache, so secondary threads only hit
        the C++ fast path.

        Strategy: drive a THROWAWAY synchronous twin system through a
        short synthetic sequence (compiles the frontend, fused chunk +
        per-frame megasteps, initializer, the whole mapping stage, and
        trajectory bookkeeping on this thread), then touch the
        remaining paths with dummy-shaped calls: the pipelined device
        refresh, snapshot slicing, loop-closure kernels, vocabulary
        assignment, pose graph, and global-BA shapes."""
        import copy
        import jax
        import jax.numpy as jnp

        from ..data import synthetic
        from ..ops import hamming as H

        cfg = copy.copy(self.cfg)
        cfg.async_mapping = False
        twin = SlamSystem(self.cam, cfg)
        imgs, _, _ = synthetic.render_plane_sequence(
            self.cam, n_frames=n_frames, seed=123, motion=0.45)
        twin.track_monocular_batch(
            list(imgs), timestamps=[i / 30.0 for i in range(n_frames)],
            chunk=8)
        # per-frame fused + legacy paths
        twin.track_monocular(imgs[-1], timestamp=n_frames / 30.0)
        fe = twin.tracking.fused
        if fe is not None and fe.state is not None \
                and twin.tracking.ref_kf >= 0:
            with twin.store.lock:
                fe.refresh_bundle_device(twin.tracking.ref_kf)
            from .fused import _snap_slice
            if getattr(fe, "_chunk_snaps", None) is not None:
                jax.block_until_ready(_snap_slice(fe._chunk_snaps, 0))
        # deferred/hard keyframe pose re-alignment (_refresh_kf_pose):
        # async-only, so the synchronous twin never traces it — without
        # this the FIRST worker-side KF insert compiles mid-run
        from .tracking import _bound_pose_opt
        P = self.cfg.tracking.max_kp
        jax.block_until_ready(_bound_pose_opt(
            self.cam, jnp.eye(3, dtype=jnp.float32),
            jnp.zeros(3, jnp.float32), jnp.zeros((P, 3), jnp.float32),
            jnp.zeros((P, 2), jnp.float32), jnp.zeros((P,), jnp.int32),
            jnp.zeros((P,), bool)))
        # LEGACY per-frame kernels (_motion_track/_bow_track/
        # _local_map_track + their eager glue): the live system falls
        # back here on any tracking failure or relocalization — in the
        # r5 bench ONE such event cost 60+ s of mid-run compiles
        # (jit__local_map_track 25.7s, jit__pallas_top2 24.7s, eager ops)
        t = twin.tracking
        t.fused = None
        for j in range(2):       # motion-model path (static camera: OK)
            twin.track_monocular(imgs[-1],
                                 timestamp=(n_frames + 1 + j) / 30.0)
        t.velocity = None        # forces the _bow_track fallback
        twin.track_monocular(imgs[-1], timestamp=(n_frames + 3) / 30.0)
        if t.relocalizer is not None and twin.store.n_keyframes() > 0:
            t.state = "LOST"     # relocalization kernel set
            t.velocity = None
            twin.track_monocular(imgs[-1], timestamp=(n_frames + 4) / 30.0)
        t.fused = fe
        if twin.tracking.loop_closer is not None:
            twin.tracking.loop_closer.precompile()
            # vocabulary self-training assignment shapes (worker-side)
            from ..loop.vocab_train import assign_words
            assign_words(np.zeros((1, H.DESC_BITS), np.int8),
                         jnp.zeros((twin.tracking.loop_closer.kfdb.vocab
                                    .n_words, H.DESC_BITS), jnp.int8))
        # essential-graph + global-BA shapes (loop acceptance path runs
        # them on the GBA thread). A failure here MUST be loud: silently
        # skipping this leg leaves the GBA shapes uncompiled and a
        # 20-100 s mid-run XLA compile lands in the steady state (the r4
        # 1.07 fps bench collapse was exactly one such stall).
        from ..mapping.global_ba import global_bundle_adjustment
        global_bundle_adjustment(twin.store, twin.cam, n_iters=20)
        if twin.tracking.loop_closer is not None:
            import jax.numpy as jnp
            from ..estimation.pose_graph import optimize_essential_graph
            K = twin.store.cfg.max_keyframes
            E = 64                      # first edge-axis bucket
            optimize_essential_graph(
                jnp.asarray(np.tile(np.eye(3, dtype=np.float32),
                                    (K, 1, 1))),
                jnp.zeros((K, 3), jnp.float32), jnp.ones(K, jnp.float32),
                jnp.asarray(np.arange(K) < 2), jnp.asarray(np.arange(K) == 0),
                jnp.zeros(E, jnp.int32), jnp.ones(E, jnp.int32),
                jnp.asarray(np.tile(np.eye(3, dtype=np.float32),
                                    (E, 1, 1))),
                jnp.zeros((E, 3), jnp.float32), jnp.ones(E, jnp.float32),
                jnp.asarray(np.arange(E) < 1),
                n_iters=20,
                fix_scale=twin.tracking.loop_closer.cfg.fix_scale)
        twin.shutdown()

    def activate_localization_mode(self):
        """Parity: System::ActivateLocalizationMode."""
        self.tracking.only_tracking = True

    def deactivate_localization_mode(self):
        self.tracking.only_tracking = False
        self.tracking.vo = False

    def reset(self):
        """Parity: System::Reset."""
        self.tracking.reset()

    def shutdown(self):
        """Parity: System::Shutdown — joins the mapping worker and waits
        for (and applies) a pending background global BA, like the
        reference's thread joins."""
        am = self.tracking.async_mapper
        if am is not None:
            am.join()
        lc = self.tracking.loop_closer
        if lc is not None:
            lc.gba.poll(block=True)

    # ------------------------------------------------------------------
    # map checkpoint / resume (capability the reference lacks — SURVEY §5.4)
    # ------------------------------------------------------------------
    def save_map(self, path):
        from ..mapstore.checkpoint import save_map
        save_map(self.store, path)

    def load_map(self, path, localization_only=True):
        """Restore a saved map; by default enter localization-only mode
        (track against the loaded map without extending it)."""
        from ..mapstore.checkpoint import load_map
        store = load_map(path)
        self.store.__dict__.update(store.__dict__)
        self.mapper._signs_cache.clear()
        t = self.tracking
        t.state = "LOST"
        t.ref_kf = int(self.store.keyframe_ids()[-1]) \
            if self.store.n_keyframes() else -1
        if t.loop_closer is not None:
            # rebuild the place-recognition database from the loaded map
            t.loop_closer.reset()
            for kf in self.store.keyframe_ids():
                t.loop_closer.kfdb.add(int(kf))
            if t.relocalizer is not None:
                t.relocalizer.kfdb = t.loop_closer.kfdb
        if localization_only:
            self.activate_localization_mode()

    # ------------------------------------------------------------------
    # trajectory export (System::SaveTrajectory* parity)
    # ------------------------------------------------------------------
    def keyframe_trajectory(self):
        """(timestamps, R_wc, t_wc) over live keyframes, id order."""
        s = self.store
        ids = s.keyframe_ids()
        R_cw = s.kf_R[ids]
        t_cw = s.kf_t[ids]
        R_wc = np.swapaxes(R_cw, -1, -2)
        t_wc = -(R_wc @ t_cw[..., None])[..., 0]
        return s.kf_timestamp[ids], R_wc, t_wc

    def frame_trajectory(self):
        """Per-frame camera-to-world poses for all tracked frames,
        re-composed against the FINAL (BA/loop-refined) reference-KF poses.
        Parity: System::SaveTrajectoryTUM's Tcr * Trw recomposition."""
        s = self.store
        ts, Rs, tss = [], [], []
        for rec in self.tracking.metrics:
            if "R" not in rec or not rec["ok"]:
                continue
            if "R_cr" in rec and rec.get("ref_kf", -1) >= 0:
                ref = rec["ref_kf"]
                R_cw = rec["R_cr"] @ s.kf_R[ref]
                t_cw = rec["R_cr"] @ s.kf_t[ref] + rec["t_cr"]
            else:
                R_cw, t_cw = rec["R"], rec["t"]
            R_wc = R_cw.T
            ts.append(rec["timestamp"])
            Rs.append(R_wc)
            tss.append(-(R_wc @ t_cw))
        return (np.asarray(ts), np.asarray(Rs), np.asarray(tss))

    def save_keyframe_trajectory_tum(self, path):
        from ..eval.trajectory import save_tum
        save_tum(path, *self.keyframe_trajectory())

    def save_trajectory_tum(self, path):
        from ..eval.trajectory import save_tum
        save_tum(path, *self.frame_trajectory())

    def save_trajectory_kitti(self, path):
        from ..eval.trajectory import save_kitti
        _, R_wc, t_wc = self.frame_trajectory()
        save_kitti(path, R_wc, t_wc)
