"""System facade: the public session API.

TPU-native replacement for System (reference: src/System.cc /
include/System.h:63-124): constructs the map and pipeline stages, exposes
per-frame Track* entries, localization-mode switch, reset, shutdown and
trajectory export. The reference spawns LocalMapping/LoopClosing/Viewer
threads here (src/System.cc:95-107); this engine runs the mapping stage
synchronously by default (deterministic, testable) with the same data flow.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np

from orb_slam2_commit_tpu.models.map_state import MapState
from orb_slam2_commit_tpu.slam.frame import Frame, make_frame, make_stereo_frame
from orb_slam2_commit_tpu.slam.local_mapping import LocalMapper
from orb_slam2_commit_tpu.slam.tracking import Tracker, TrackingState
from orb_slam2_commit_tpu.utils import trajectory as traj
from orb_slam2_commit_tpu.utils.config import SLAMConfig


class System:
    def __init__(self, config: SLAMConfig, vocabulary="default",
                 async_mapping: Optional[bool] = None):
        """vocabulary: BinaryVocabulary, path (.npz or ORBvoc.txt layout),
        "default" (the bundled data/default_voc.npz when
        config.system.use_vocabulary, as the reference unconditionally
        loads ORBvoc.txt, src/System.cc:61-77), or None/False to disable.
        With a vocabulary, the keyframe database, BoW relocalization
        candidates and the loop-closing stage are enabled — the full
        reference pipeline (src/System.cc:61-100).

        async_mapping: run local mapping (+ loop closing) on a background
        thread with a keyframe queue, like the reference's
        LocalMapping/LoopClosing threads (src/System.cc:95-100); False is
        the deterministic synchronous pipeline; None takes
        config.system.async_mapping (True out of the box)."""
        self.config = config
        if async_mapping is None:
            async_mapping = config.system.async_mapping
        if isinstance(vocabulary, str) and vocabulary == "default":
            if config.system.use_vocabulary:
                from orb_slam2_commit_tpu.models.vocabulary import (
                    default_vocabulary,
                )

                vocabulary = default_vocabulary()
            else:
                vocabulary = None
        if vocabulary is False:
            vocabulary = None
        # Monocular initialization extracts 2x features, like the
        # reference's dedicated init extractor (src/Tracking.cc:121-126 —
        # built ONLY for the monocular sensor, so stereo/RGB-D must not
        # pay the doubled map feature capacity: it previously inflated
        # every per-keyframe array, fuse batch and BA gather by 2x on
        # KITTI-class stereo drives).
        if config.sensor == "monocular":
            self.init_config = dataclasses.replace(
                config,
                orb=dataclasses.replace(
                    config.orb, n_features=2 * config.orb.n_features
                ),
            )
        else:
            self.init_config = config
        n_feat = max(
            self._n_features(config), self._n_features(self.init_config)
        )
        self.map = MapState.create(config.map, n_feat)
        self.tracker = Tracker(config, self.map)
        self.mapper = LocalMapper(config, self.map)
        # Always-on per-stage timing (SURVEY.md S5: the reference only has
        # driver wall-clock prints; see utils/profiling.py).
        from orb_slam2_commit_tpu.utils.profiling import Profiler

        self.profiler = Profiler()
        self.tracker.profiler = self.profiler
        self.mapper.profiler = self.profiler
        self.vocabulary = None
        self.kf_database = None
        self.loop_closer = None
        if vocabulary is not None:
            from orb_slam2_commit_tpu.models.kf_database import KeyFrameDatabase
            from orb_slam2_commit_tpu.models.vocabulary import load_vocabulary

            if isinstance(vocabulary, str):
                vocabulary = load_vocabulary(vocabulary)
            self.vocabulary = vocabulary
            self.kf_database = KeyFrameDatabase(
                vocabulary, config.map.max_keyframes
            )
            self.tracker.kf_database = self.kf_database
            self.map.remove_kf_hooks = [self.kf_database.erase]
            self.map.grow_hooks = [self.kf_database.grow]
            self.loop_closer = self._build_loop_closer()
        self.frame_count = 0
        self._shutdown = False
        self.mapping_worker = None
        self.map_lock = None
        if async_mapping:
            import threading

            from orb_slam2_commit_tpu.slam.async_pipeline import MappingWorker

            self.map_lock = threading.RLock()
            self.mapper.map_lock = self.map_lock
            self.mapping_worker = MappingWorker(
                self.mapper, self.loop_closer, self.map_lock
            )
            self.tracker.mapping_worker = self.mapping_worker
            if self.loop_closer is not None:
                # Global BA after loop corrections runs on its own
                # abortable thread, concurrent with tracking+mapping
                # (reference GBA thread, src/LoopClosing.cc:801).
                from orb_slam2_commit_tpu.slam.global_ba import GlobalBARunner

                self.loop_closer.gba_runner = GlobalBARunner(
                    config, self.map_lock
                )

    @staticmethod
    def _n_features(config: SLAMConfig) -> int:
        return sum(config.orb.features_per_level())

    def _build_loop_closer(self):
        from orb_slam2_commit_tpu.slam.loop_closing import LoopCloser

        # Scale the essential-graph edge threshold with the feature
        # budget (reference constant 100 assumes 1000-2000 features).
        emw = max(20, self.config.orb.n_features // 10)
        return LoopCloser(
            self.config, self.map, self.kf_database,
            essential_min_weight=min(100, emw),
        )

    # ------------------------------------------------------------------
    # Per-frame entries (reference: System::TrackMonocular :225-282,
    # TrackRGBD :169-223, TrackStereo :121-167)
    # ------------------------------------------------------------------

    def track_monocular(
        self, image: np.ndarray, timestamp: float
    ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
        assert self.config.sensor == "monocular"
        return self._track(image, timestamp, depth_image=None)

    def track_rgbd(
        self, image: np.ndarray, depth: np.ndarray, timestamp: float
    ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
        assert self.config.sensor == "rgbd"
        return self._track(image, timestamp, depth_image=depth)

    def track_stereo(
        self, image_left: np.ndarray, image_right: np.ndarray, timestamp: float
    ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
        assert self.config.sensor == "stereo"
        if self._use_fused_track() and self.tracker.can_fuse_motion():
            # One device dispatch: L/R extraction + stereo depth +
            # projective matching + mixed mono/stereo pose BA
            # (slam/jit_frontend.fused_stereo_motion_track).
            with self.profiler.timed("fused_frontend"):
                frame, motion_ok = self.tracker.fused_motion_frame(
                    image_left, self.frame_count, timestamp,
                    image_right=image_right,
                )
            self.frame_count += 1
            with self.profiler.timed("track"):
                return self._track_frame(frame, motion_ok=motion_ok)
        frame = make_stereo_frame(
            image_left, image_right, self.frame_count, timestamp, self.config
        )
        self.frame_count += 1
        return self._track_frame(frame)

    def _track(self, image, timestamp, depth_image):
        use_init = (
            self.config.sensor == "monocular"
            and self.tracker.state
            in (TrackingState.NO_IMAGES_YET, TrackingState.NOT_INITIALIZED)
        )
        cfg = self.init_config if use_init else self.config
        if self._use_fused_track() and self.tracker.can_fuse_motion():
            # One device dispatch for extract + match + pose BA
            # (slam/jit_frontend.fused_motion_track; the RGB-D variant
            # also gathers per-keypoint depth in-graph); the Frame is
            # built from its outputs, the staged motion stage skipped.
            with self.profiler.timed("fused_frontend"):
                frame, motion_ok = self.tracker.fused_motion_frame(
                    image, self.frame_count, timestamp,
                    depth_image=depth_image,
                )
            self.frame_count += 1
            with self.profiler.timed("track"):
                return self._track_frame(frame, motion_ok=motion_ok)
        with self.profiler.timed("extract_frame"):
            frame = make_frame(
                image, self.frame_count, timestamp, cfg, depth_image
            )
        self.frame_count += 1
        with self.profiler.timed("track"):
            return self._track_frame(frame)

    @staticmethod
    def _use_fused_track() -> bool:
        """Fused single-dispatch tracking on accelerators (override with
        ORB_TPU_FUSED_TRACK=0/1). On CPU the staged path is the oracle."""
        import os

        v = os.environ.get("ORB_TPU_FUSED_TRACK")
        if v is not None:
            return v == "1"
        import jax

        return jax.default_backend() != "cpu"

    def _track_frame(self, frame: Frame, motion_ok=None):
        was_initialized = self.tracker.state in (
            TrackingState.OK, TrackingState.LOST
        )
        if self.map_lock is not None:
            with self.map_lock:
                pose = self.tracker.track(frame, motion_ok=motion_ok)
        else:
            pose = self.tracker.track(frame, motion_ok=motion_ok)

        if self.tracker.request_reset:
            # Lost right after initialization: restart from scratch
            # (reference: src/Tracking.cc:540-552 "Reset if the camera gets
            # lost soon after initialization").
            self.reset()
            return None

        if not was_initialized and self.tracker.state == TrackingState.OK:
            # Map was just created: register the initial keyframes with the
            # place-recognition database, nothing more this frame.
            if self.kf_database is not None:
                for k in range(self.map.next_kf):
                    if self.map.kf_valid[k] and not self.kf_database.present[k]:
                        self.kf_database.add(
                            k, self.map.kf_desc[k], self.map.kf_feat_valid[k]
                        )
            return pose

        with self.profiler.timed("track_need_kf"):
            need_kf = pose is not None and self.tracker.need_new_keyframe(frame)
        if need_kf:
            # The anchor rebind must happen BEFORE mapping/loop closing
            # move the new keyframe (relative pose = identity at creation
            # — the reference's CreateNewKeyFrame-before-bookkeeping
            # order); binding after local BA would freeze the PRE-BA pose
            # into the trajectory entry.
            if self.mapping_worker is not None:
                with self.map_lock:
                    with self.profiler.timed("keyframe_insert"):
                        kf = self._insert_keyframe(frame)
                    self.tracker.bind_keyframe_anchor(frame, kf)
                self.mapping_worker.insert_keyframe(kf)
            else:
                with self.profiler.timed("keyframe_insert"):
                    kf = self._insert_keyframe(frame)
                self.tracker.bind_keyframe_anchor(frame, kf)
                with self.profiler.timed("local_mapping"):
                    self.mapper.process_keyframe(kf)
                if self.loop_closer is not None:
                    with self.profiler.timed("loop_closing"):
                        self.loop_closer.process_keyframe(kf)
            self.tracker.ref_kf = kf
            self.tracker.last_kf_frame_id = frame.frame_id
        return pose

    def _insert_keyframe(self, frame: Frame) -> int:
        """Oracle: Tracking::CreateNewKeyFrame (src/Tracking.cc:1311-1401).
        For stereo/RGB-D, unbound features with close depth spawn new map
        points directly (nearest-first, at least 100 or all closer than
        th_depth, :1335-1392)."""
        cam = self.config.camera
        if self.config.sensor != "monocular":
            close_th = cam.baseline * cam.th_depth
            unbound = (
                frame.valid & (frame.point_ids < 0) & (frame.depth > 0)
            )
            feats = np.where(unbound)[0]
            if feats.size:
                order = feats[np.argsort(frame.depth[feats])]
                z = frame.depth[order]
                n_close = int((z < close_th).sum())
                take = order[: max(min(100, order.size), n_close)]
                zt = frame.depth[take].astype(np.float64)
                x = (frame.xy[take, 0] - cam.cx) / cam.fx * zt
                y = (frame.xy[take, 1] - cam.cy) / cam.fy * zt
                p_cam = np.stack([x, y, zt], -1)
                pw = (p_cam - frame.t) @ frame.R
                capacity = self.map.cfg.max_points - self.map.next_pt
                take = take[:capacity]
                if take.size:
                    from orb_slam2_commit_tpu.slam.local_mapping import RecentPoint

                    ids = self.map.add_points(pw[: take.size], self.map.next_kf)
                    frame.point_ids[take] = ids
                    for pid in ids:
                        self.mapper.recent_points.append(
                            RecentPoint(int(pid), self.map.next_kf)
                        )
        return self.map.add_keyframe(
            frame.R, frame.t, frame.xy, frame.octave, frame.angle, frame.desc,
            frame.valid, frame.point_ids, frame.frame_id, frame.timestamp,
            depth=frame.depth, ur=frame.ur,
        )

    # ------------------------------------------------------------------
    # Mode switches (reference: ActivateLocalizationMode,
    # src/System.cc:284-307; Reset :309-313)
    # ------------------------------------------------------------------

    def activate_localization_mode(self) -> None:
        self.tracker.localization_only = True

    def deactivate_localization_mode(self) -> None:
        self.tracker.localization_only = False

    def reset(self) -> None:
        """Oracle: Tracking::Reset (src/Tracking.cc:1886-1932): drain the
        mapping worker, clear the map + keyframe database + loop-closing
        state, and restart tracking from scratch. Every pipeline stage is
        rebuilt against the fresh map (the reference clears the shared
        pointer graph in place under the same stop protocol)."""
        gba = getattr(self.loop_closer, "gba_runner", None)
        if gba is not None:
            # Must happen before taking the map lock (the runner may be
            # waiting on it to merge).
            gba.abort_and_join()
        if self.mapping_worker is not None:
            self.mapping_worker.wait_idle()
        lock = self.map_lock
        if lock is not None:
            lock.acquire()
        try:
            n_feat = max(
                self._n_features(self.config),
                self._n_features(self.init_config),
            )
            localization_only = self.tracker.localization_only
            self.map = MapState.create(self.config.map, n_feat)
            self.tracker = Tracker(self.config, self.map)
            self.tracker.localization_only = localization_only
            self.tracker.profiler = self.profiler
            self.mapper = LocalMapper(self.config, self.map)
            self.mapper.profiler = self.profiler
            if self.kf_database is not None:
                self.kf_database.clear()
                self.tracker.kf_database = self.kf_database
                self.map.remove_kf_hooks = [self.kf_database.erase]
                self.map.grow_hooks = [self.kf_database.grow]
                self.loop_closer = self._build_loop_closer()
                if gba is not None:
                    self.loop_closer.gba_runner = gba
            if self.map_lock is not None:
                self.mapper.map_lock = self.map_lock
            if self.mapping_worker is not None:
                self.mapping_worker.mapper = self.mapper
                self.mapping_worker.loop_closer = self.loop_closer
                self.tracker.mapping_worker = self.mapping_worker
        finally:
            if lock is not None:
                lock.release()

    def save_map(self, path: str) -> None:
        """Persist the full map (the reference's missing SaveMap,
        include/System.h:116-118)."""
        from orb_slam2_commit_tpu.models import serialization

        serialization.save_map(self.map, path)

    def load_map(self, path: str) -> None:
        """Load a map and rewire every pipeline stage to it; typically
        followed by activate_localization_mode()."""
        from orb_slam2_commit_tpu.models import serialization

        self.map = serialization.load_map(path)
        self.tracker.map = self.map
        self.mapper.map = self.map
        # Re-point the tracker at the newest keyframe for relocalization.
        valid = np.where(self.map.kf_valid)[0]
        self.tracker.ref_kf = int(valid[-1]) if valid.size else -1
        self.tracker.state = (
            TrackingState.LOST if valid.size else TrackingState.NOT_INITIALIZED
        )
        if self.kf_database is not None:
            self.kf_database.grow("keyframes", self.map.cfg.max_keyframes)
            self.kf_database.clear()
            serialization.rebuild_database(self.map, self.kf_database)
            self.map.remove_kf_hooks = [self.kf_database.erase]
            self.map.grow_hooks = [self.kf_database.grow]
        if self.loop_closer is not None:
            self.loop_closer.map = self.map

    def shutdown(self) -> None:
        """Drain and stop background workers (oracle: System::Shutdown,
        src/System.cc:315-334 requests finish on all threads and waits)."""
        if self.mapping_worker is not None:
            self.mapping_worker.wait_idle()
            self.mapping_worker.join()
        gba = getattr(self.loop_closer, "gba_runner", None)
        if gba is not None:
            # Let a running global BA finish and merge (the reference's
            # Shutdown spin-waits on isRunningGBA, src/System.cc:327-330).
            gba.join()
        self._shutdown = True

    def timings(self):
        """Per-stage timing summary (see utils/profiling.Profiler):
        {stage: {count, mean_ms, ema_ms, min_ms, max_ms, total_s}}."""
        return self.profiler.summary()

    def map_changed(self) -> int:
        return self.map.big_change_idx

    def tracking_state(self) -> TrackingState:
        return self.tracker.state

    # ------------------------------------------------------------------
    # Trajectory export (reference: src/System.cc:336-486)
    # ------------------------------------------------------------------

    def _resolve_trajectory(self) -> List[Tuple[float, np.ndarray, np.ndarray]]:
        """Frame poses = relative pose composed with the (possibly
        BA-corrected) reference keyframe pose, walking to the spanning-tree
        parent when the reference KF was culled (reference:
        src/System.cc:362-384)."""
        out = []
        for e in self.tracker.trajectory:
            k = e.ref_kf
            R_rel, t_rel = e.R_rel, e.t_rel
            hops = 0
            while k >= 0 and not self.map.kf_valid[k] and hops < 64:
                # The entry's rel pose was stored against a culled KF:
                # chain through its cull-time-frozen Tcp (KeyFrame::mTcp,
                # reference src/System.cc:376-380) — NOT its stale pose
                # arrays, which would mix with the parent's possibly
                # BA-corrected current pose.
                parent = int(self.map.kf_parent[k])
                if parent < 0:
                    break
                R_kp = self.map.kf_tcp_R[k]
                t_kp = self.map.kf_tcp_t[k]
                t_rel = R_rel @ t_kp + t_rel
                R_rel = R_rel @ R_kp
                k = parent
                hops += 1
            if k < 0:
                continue
            Rk, tk = self.map.kf_pose_R[k], self.map.kf_pose_t[k]
            R = R_rel @ Rk
            t = R_rel @ tk + t_rel
            out.append((e.timestamp, R, t))
        return out

    def save_trajectory_tum(self, path: str) -> None:
        traj.write_tum(path, self._resolve_trajectory())

    def save_trajectory_kitti(self, path: str) -> None:
        traj.write_kitti(path, self._resolve_trajectory())

    def save_keyframe_trajectory_tum(self, path: str) -> None:
        entries = []
        for k in range(self.map.next_kf):
            if self.map.kf_valid[k]:
                entries.append(
                    (
                        float(self.map.kf_timestamp[k]),
                        self.map.kf_pose_R[k],
                        self.map.kf_pose_t[k],
                    )
                )
        traj.write_tum(path, entries)

    def trajectory_positions(self) -> np.ndarray:
        """[T, 3] camera centers for evaluation."""
        out = []
        for ts, R, t in self._resolve_trajectory():
            out.append(-R.T @ t)
        return np.asarray(out)
