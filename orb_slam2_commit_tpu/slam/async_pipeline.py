"""Asynchronous pipeline: mapping + loop closing on background threads.

The reference's thread architecture (SURVEY.md §2.4): Tracking on the
caller's thread (P1), LocalMapping on its own thread draining a keyframe
queue (P2, src/System.cc:95-96 + src/LocalMapping.cc:149-161), LoopClosing
downstream (P3, src/System.cc:99-100). Cross-thread control mirrors the
reference's protocol:

- a bounded keyframe queue feeds the mapping worker;
- a pending keyframe aborts the running local BA (mbAbortBA,
  src/LocalMapping.cc:149-154) — here: the worker checks the queue between
  stages and skips local BA when more work is waiting;
- one coarse map lock replaces the reference's mutex web (SURVEY.md §5):
  the tracker snapshots what it needs under the lock, the workers mutate
  under it; correctness comes from the single-writer-per-section
  discipline, not fine-grained locking;
- request_stop/release and request_finish follow
  src/LocalMapping.cc:701-933.
"""

from __future__ import annotations

import queue
import threading
from typing import Optional

from orb_slam2_commit_tpu.models.map_state import MapState
from orb_slam2_commit_tpu.slam.local_mapping import LocalMapper
from orb_slam2_commit_tpu.slam.loop_closing import LoopCloser


class MappingWorker:
    """Background thread running LocalMapper (+ LoopCloser) per keyframe."""

    def __init__(
        self,
        mapper: LocalMapper,
        loop_closer: Optional[LoopCloser],
        map_lock: threading.RLock,
        max_queue: int = 8,
    ):
        self.mapper = mapper
        self.loop_closer = loop_closer
        self.map_lock = map_lock
        self.queue: "queue.Queue[int]" = queue.Queue(maxsize=max_queue)
        self._finish_requested = threading.Event()
        self._finished = threading.Event()
        self._stop_requested = threading.Event()
        self._stopped = threading.Event()
        self._idle = threading.Event()
        self._idle.set()
        self.processed = 0
        self.dropped = 0
        self.thread = threading.Thread(target=self._run, daemon=True)
        self.thread.start()

    # -- queue side (tracker thread) -----------------------------------

    def insert_keyframe(self, kf: int) -> None:
        """Enqueue without blocking; signals BA abort (reference:
        InsertKeyFrame sets mbAbortBA, src/LocalMapping.cc:149-154).

        The tracker must never stall on a mapping backlog — the
        reference's NeedNewKeyFrame refuses insertion when the queue is
        deep (src/Tracking.cc:1272-1293), and need_new_keyframe mirrors
        that, so a full queue here means the gate was bypassed; the
        keyframe is dropped (counted) rather than blocking tracking."""
        self.mapper.abort_ba = True
        try:
            self.queue.put_nowait(kf)
        except queue.Full:
            self.dropped += 1

    def accept_keyframes(self) -> bool:
        """Mapper idle? (reference: AcceptKeyFrames, :778-790)."""
        return self._idle.is_set() and self.queue.empty()

    def interrupt_ba(self) -> None:
        """Abort the running local BA so the mapper frees up sooner
        (reference: InterruptBA, src/Tracking.cc:1283 + mbAbortBA
        src/Optimizer.cc:749-762)."""
        self.mapper.abort_ba = True

    def queued(self) -> int:
        """Keyframes waiting in the queue (reference:
        KeyframesInQueue, src/LocalMapping.cc:792-796)."""
        return self.queue.qsize()

    def request_stop(self) -> None:
        """Pause processing (loop correction uses this,
        src/LoopClosing.cc:552; :701-717)."""
        self._stop_requested.set()

    def is_stopped(self) -> bool:
        return self._stopped.is_set()

    def release(self) -> None:
        self._stop_requested.clear()
        self._stopped.clear()

    def request_finish(self) -> None:
        self._finish_requested.set()

    def join(self, timeout: float = 30.0) -> None:
        self.request_finish()
        self.thread.join(timeout=timeout)

    # -- worker side ----------------------------------------------------

    def _run(self) -> None:
        while not self._finish_requested.is_set():
            if self._stop_requested.is_set():
                self._stopped.set()
                self._finish_requested.wait(timeout=0.003)
                continue
            self._stopped.clear()
            try:
                kf = self.queue.get(timeout=0.01)
            except queue.Empty:
                continue
            self._idle.clear()
            try:
                # Skip local BA if more keyframes wait (abortable BA,
                # reference mbAbortBA / src/Optimizer.cc:749-762).
                self.mapper.abort_ba = not self.queue.empty()
                with self.map_lock:
                    self.mapper.process_keyframe(kf)
                if self.loop_closer is not None:
                    with self.map_lock:
                        self.loop_closer.process_keyframe(kf)
                self.processed += 1
            finally:
                self._idle.set()
                self.queue.task_done()
        self._finished.set()

    def wait_idle(self, timeout: float = 60.0) -> None:
        """Drain the queue (used by shutdown and tests)."""
        self.queue.join()
        self._idle.wait(timeout=timeout)
