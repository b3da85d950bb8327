"""Asynchronous mapping stage — the reference's LocalMapping thread.

Parity: System::System spawns LocalMapping/LoopClosing as long-lived
threads fed through a keyframe queue (src/System.cc:≈90-110,
src/LocalMapping.cc:≈100); tracking NEVER waits for mapping — it keeps
tracking against the map as-of the last completed mapping step, and new
keyframes are simply not accepted while the mapper is saturated
(SetAcceptKeyFrames(false)).

TPU-native translation: one worker thread drains a queue of freshly
inserted keyframe ids and runs the mapping stage (triangulate -> fuse ->
local BA -> cull) plus loop closing for each. The device-resident
tracking state (system/fused.py) keeps using its IMMUTABLE bundle
snapshot while the mapper works; the host store is protected by the
coarse MapStore.lock (mMutexMapUpdate parity) held around write-backs
and chunk-boundary reads. The fused bundle refreshes at the next chunk
boundary after the mapper goes idle.
"""
from __future__ import annotations

import queue
import threading


class AsyncMapper:
    """Keyframe-queue worker wrapping LocalMapper (+ LoopCloser)."""

    def __init__(self, mapper, loop_closer=None, relocalizer=None):
        self.mapper = mapper
        self.loop_closer = loop_closer
        self.relocalizer = relocalizer
        self._q: queue.Queue = queue.Queue()
        self._pending = 0
        self._pending_lock = threading.Lock()
        self.error: BaseException | None = None
        self.n_processed = 0
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="local-mapping")
        self._thread.start()

    # ------------------------------------------------------------------
    def busy(self) -> bool:
        """A mapping step is queued OR running."""
        with self._pending_lock:
            return self._pending > 0

    def queue_idle(self) -> bool:
        """Parity: LocalMapping::AcceptKeyFrames — the reference accepts
        a new keyframe while the PREVIOUS step is still running (the
        queue drains one behind); it only refuses when work is piling
        up. Gating inserts on full idleness starved the keyframe cadence
        whenever mapping overlapped tracking (measured: anchors frozen
        for 60+ frames on the pipelined path)."""
        return self._q.qsize() == 0

    def submit(self, kf: int):
        if self.error is not None:
            raise RuntimeError("async mapper died") from self.error
        with self._pending_lock:
            self._pending += 1
        self._q.put(int(kf))

    def submit_task(self, fn):
        """Run an arbitrary callable on the mapping worker. The pipelined
        tracking path uses this to defer the WHOLE keyframe event
        (snapshot readback + store insert + mapping) off the tracking
        thread: a materialize readback queues behind the in-flight chunk
        and the mapper's own dispatches, and blocking the tracking thread
        on it measured 830 ms median per keyframe."""
        if self.error is not None:
            raise RuntimeError("async mapper died") from self.error
        with self._pending_lock:
            self._pending += 1
        self._q.put(fn)

    def join(self):
        """Drain the queue (parity: the Shutdown thread joins)."""
        self._q.join()
        if self.error is not None:
            raise RuntimeError("async mapper died") from self.error

    # ------------------------------------------------------------------
    def _run(self):
        while True:
            kf = self._q.get()
            try:
                if self.error is None:
                    if callable(kf):
                        kf = kf()        # deferred insert -> kf id (or None)
                    if kf is not None:
                        self.mapper.process_keyframe(kf)
                        if self.loop_closer is not None:
                            self.loop_closer.insert_keyframe(kf)
                        elif self.relocalizer is not None and \
                                self.relocalizer.kfdb is not None:
                            self.relocalizer.kfdb.add(kf)
                    self.n_processed += 1
            except BaseException as e:          # surface on next submit/join
                self.error = e
            finally:
                with self._pending_lock:
                    self._pending -= 1
                self._q.task_done()
