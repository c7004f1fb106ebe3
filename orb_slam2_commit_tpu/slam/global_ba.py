"""Transient, abortable global-BA thread with spanning-tree merge.

The reference spawns a dedicated thread for global bundle adjustment
after every loop correction (src/LoopClosing.cc:801) running
RunGlobalBundleAdjustment (:884-1020): the solve proceeds concurrently
with tracking and mapping, can be aborted when a new loop arrives
(mbStopGBA + the mnFullBAIdx generation token, :556-572 / :892-905), and
on success merges its result under the map lock, propagating pose
corrections through the spanning tree to keyframes created while it ran
(:924-973) and through reference keyframes to points created meanwhile
(:976-1006).

TPU-native shape: the BA problem is SNAPSHOTTED under the map lock (the
array map makes this one cheap packing pass, slam/tracking.py
build_ba_problem), the Schur-complement LM solve runs on device OUTSIDE
the lock in abort-checkable segments (the device while_loop cannot
observe a host flag mid-flight, so the fixed iteration budget is split —
the LM damping restarts per segment, which only costs a couple of extra
accepted steps), and the merge re-acquires the lock.
"""

from __future__ import annotations

import contextlib
import threading
from typing import Dict, Optional, Tuple

import numpy as np

from orb_slam2_commit_tpu.utils.rotation import orthonormalize_rotation

from orb_slam2_commit_tpu.models.map_state import MapState
from orb_slam2_commit_tpu.optim import ba
from orb_slam2_commit_tpu.slam.tracking import build_ba_problem
from orb_slam2_commit_tpu.utils.config import SLAMConfig


class GlobalBARunner:
    """Owns at most one in-flight global BA (the reference's transient
    GBA thread; see module docstring)."""

    def __init__(self, config: SLAMConfig, map_lock=None,
                 segment_iters: int = 5):
        self.config = config
        self.map_lock = map_lock if map_lock is not None else (
            contextlib.nullcontext()
        )
        self.segment_iters = max(1, segment_iters)
        # Generation token (reference mnFullBAIdx, src/LoopClosing.cc:561):
        # a bump invalidates the in-flight run even if it already finished
        # solving and is waiting to merge. This is the ONLY abort channel —
        # an event that gets cleared for relaunch would race with the old
        # thread's checks; a stale generation can never be un-bumped.
        self.full_ba_idx = 0
        self._thread: Optional[threading.Thread] = None
        self.n_merged = 0
        self.n_aborted = 0

    # -- control (reference: isRunningGBA :200-207, abort :556-572) ------

    @property
    def running(self) -> bool:
        return self._thread is not None and self._thread.is_alive()

    def request_abort(self) -> None:
        """Non-blocking abort: the in-flight run abandons before (or
        instead of) merging. Safe to call while holding the map lock —
        the runner thread re-checks the generation token after it acquires
        the lock, so there is no join-while-locked deadlock."""
        if self.running:
            self.full_ba_idx += 1

    def abort_and_join(self, timeout: float = 120.0) -> None:
        """Abort and wait for the thread to exit. Must NOT be called while
        holding the map lock (the thread may be blocked acquiring it)."""
        self.request_abort()
        self.join(timeout)

    def join(self, timeout: float = 300.0) -> None:
        t = self._thread
        if t is not None:
            t.join(timeout=timeout)

    # -- launch -----------------------------------------------------------

    def launch(self, map_state: MapState, anchor_kf: int,
               n_iters: int = 10, blocking: bool = False) -> None:
        """Start a global BA over the current map. A still-running previous
        GBA is aborted first (the reference does this when a NEW loop
        arrives, :556-572). blocking=True runs inline (deterministic /
        synchronous pipelines).

        Callable while holding the map lock: the previous thread is not
        joined here (it may be blocked on that very lock) — it is
        invalidated by the generation bump, and the NEW thread joins it
        before starting work so at most one solve runs at a time."""
        prev = self._thread if self.running else None
        if prev is not None:
            self.full_ba_idx += 1
        gen = self.full_ba_idx
        if blocking:
            if prev is not None:
                prev.join()
            self._run(map_state, int(anchor_kf), int(n_iters), gen)
            return

        def run():
            if prev is not None:
                prev.join()
            self._run(map_state, int(anchor_kf), int(n_iters), gen)

        self._thread = threading.Thread(
            target=run, daemon=True, name="global-ba",
        )
        self._thread.start()

    # -- worker -----------------------------------------------------------

    def _run(self, m: MapState, anchor_kf: int, n_iters: int,
             gen: int) -> None:
        cam = self.config.camera
        with self.map_lock:
            if gen != self.full_ba_idx:
                self.n_aborted += 1
                return
            if m.n_keyframes() < 3 or not m.kf_valid[anchor_kf]:
                return
            valid_kfs = np.where(m.kf_valid)[0]
            free = np.asarray([int(k) for k in valid_kfs if k != anchor_kf])
            pts = np.where(m.pt_valid)[0]
            assembled = build_ba_problem(
                m, free_kfs=free, fixed_kfs=np.asarray([anchor_kf]),
                point_ids=pts, orb_cfg=self.config.orb,
            )
            snap_next_kf = m.next_kf
            snap_next_pt = m.next_pt

        # Device solve outside the lock, in abortable segments.
        problem = assembled.problem
        remaining = n_iters
        while remaining > 0:
            if gen != self.full_ba_idx:
                self.n_aborted += 1
                return
            seg = min(self.segment_iters, remaining)
            problem, result = ba.bundle_adjust_jit(
                problem, cam.fx, cam.fy, cam.cx, cam.cy, cam.bf,
                n_iters=seg, point_chunk=1024,
            )
            remaining -= seg

        with self.map_lock:
            # Re-check under the lock: a loop correction that started while
            # we were solving has invalidated this result (:892-905).
            if gen != self.full_ba_idx:
                self.n_aborted += 1
                return
            self._merge(m, assembled, problem, snap_next_kf, snap_next_pt)
            self.n_merged += 1
            m.big_change_idx += 1

    # -- merge (reference :906-1007) ---------------------------------------

    def _merge(self, m: MapState, assembled, out_problem,
               snap_next_kf: int, snap_next_pt: int) -> None:
        """Write the solution back; keyframes/points created during the
        solve are corrected relatively: a new keyframe keeps its pose
        relative to its spanning-tree parent (Tchild_w' = Tchild_parent *
        Tparent_w', reference :944-963), a new point keeps its position in
        its reference keyframe's camera frame (:984-1004)."""
        sol_R = np.asarray(out_problem.R)
        sol_t = np.asarray(out_problem.t)
        old_R = m.kf_pose_R.copy()
        old_t = m.kf_pose_t.copy()
        solved: Dict[int, Tuple[np.ndarray, np.ndarray]] = {
            int(k): (sol_R[ci], sol_t[ci])
            for ci, k in enumerate(assembled.kf_ids)
        }

        new_pose: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}

        def resolve(k: int) -> Tuple[np.ndarray, np.ndarray]:
            # Iterative spanning-tree walk to the nearest solved ancestor.
            chain = []
            cur = k
            while cur not in new_pose:
                if cur in solved:
                    new_pose[cur] = solved[cur]
                    break
                parent = int(m.kf_parent[cur])
                if parent < 0 or len(chain) > 4096:
                    new_pose[cur] = (old_R[cur], old_t[cur])
                    break
                chain.append(cur)
                cur = parent
            for cur in reversed(chain):
                parent = int(m.kf_parent[cur])
                Rp, tp = new_pose[parent]
                R_kp = old_R[cur] @ old_R[parent].T
                t_kp = old_t[cur] - R_kp @ old_t[parent]
                new_pose[cur] = (R_kp @ Rp, R_kp @ tp + t_kp)
            return new_pose[k]

        for k in np.where(m.kf_valid)[0]:
            R_n, t_n = resolve(int(k))
            m.kf_pose_R[k] = orthonormalize_rotation(R_n)
            m.kf_pose_t[k] = t_n

        # Points in the solve: overwrite (skip ones culled meanwhile).
        n_pts = assembled.point_ids.size
        sol_pts = np.asarray(out_problem.points)[:n_pts]
        still = m.pt_valid[assembled.point_ids]
        m.pt_pos[assembled.point_ids[still]] = sol_pts[still]

        # Points created during the solve: correct via their reference
        # keyframe's pose delta.
        for pid in range(snap_next_pt, m.next_pt):
            if not m.pt_valid[pid]:
                continue
            ref = int(m.pt_first_kf[pid])
            if ref < 0 or ref >= old_R.shape[0]:
                continue
            p_cam = old_R[ref] @ m.pt_pos[pid] + old_t[ref]
            R_n, t_n = new_pose.get(ref, (old_R[ref], old_t[ref]))
            m.pt_pos[pid] = R_n.T @ (p_cam - t_n)
        m.refresh_point_stats()
