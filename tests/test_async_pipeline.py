"""Asynchronous (threaded) mapping pipeline test."""

import numpy as np

from orb_slam2_commit_tpu.slam.system import System
from orb_slam2_commit_tpu.slam.tracking import TrackingState
from orb_slam2_commit_tpu.utils import synthetic
from orb_slam2_commit_tpu.utils import trajectory as traj
from orb_slam2_commit_tpu.utils.config import synthetic_config


class TestAsyncPipeline:
    def test_mono_sequence_async(self):
        cfg = synthetic_config(width=400, height=300, n_features=1000)
        images, poses_gt, scene = synthetic.render_sequence(
            cfg.camera, n_frames=30, n_points=400, seed=3, step=0.05
        )
        sys_ = System(cfg, async_mapping=True)
        for i in range(images.shape[0]):
            sys_.track_monocular(images[i], i / 30.0)
        sys_.shutdown()
        assert sys_.tracking_state() == TrackingState.OK
        assert sys_.map.n_keyframes() >= 3
        assert sys_.mapping_worker.processed >= 1

        est = sys_.trajectory_positions()
        lost = np.asarray([e.lost for e in sys_.tracker.trajectory], bool)
        gt = np.asarray([-R.T @ t for R, t in poses_gt])
        offset = len(poses_gt) - len(est)
        ok = ~lost
        rmse = traj.ate_rmse(est[ok], gt[offset:][ok], align_scale=True)
        span = np.linalg.norm(gt[-1] - gt[0])
        assert rmse < 0.10 * span, (rmse, span)

    def test_worker_stop_release(self):
        cfg = synthetic_config(width=320, height=240, n_features=300)
        sys_ = System(cfg, async_mapping=True)
        w = sys_.mapping_worker
        w.request_stop()
        import time

        time.sleep(0.05)
        assert w.is_stopped()
        w.release()
        assert not w.is_stopped()
        sys_.shutdown()


class FakeWorker:
    """Stand-in mapping worker with scriptable idle/queue state."""

    def __init__(self):
        self.busy = False
        self.q = 0
        self.interrupts = 0

    def accept_keyframes(self):
        return not self.busy

    def interrupt_ba(self):
        self.interrupts += 1

    def queued(self):
        return self.q


class TestKeyframeInsertionProtocol:
    """Reference: Tracking::NeedNewKeyFrame consults the mapper's idle
    state (src/Tracking.cc:1240-1295): busy => InterruptBA, then
    monocular refuses insertion while stereo/RGB-D inserts only if the
    queue holds <3 keyframes. InsertKeyFrame itself must never block the
    tracking thread."""

    def test_busy_mapper_gates_mono_insertion(self):
        cfg = synthetic_config(width=400, height=300, n_features=1000)
        images, poses_gt, scene = synthetic.render_sequence(
            cfg.camera, n_frames=30, n_points=400, seed=3, step=0.05
        )
        sys_ = System(cfg)      # synchronous mapper (deterministic)
        fake = FakeWorker()
        i = 0
        # Phase 1: run until the map exists, mapper "idle".
        while i < images.shape[0] and sys_.map.n_keyframes() < 3:
            sys_.track_monocular(images[i], i / 30.0)
            i += 1
        assert sys_.tracking_state() == TrackingState.OK
        sys_.tracker.mapping_worker = fake
        # Phase 2: mapper busy + deep queue -> no mono insertions; the
        # would-be insertions must instead interrupt the running BA.
        fake.busy = True
        fake.q = 5
        kfs_at_block = sys_.map.n_keyframes()
        for j in range(i, min(i + 8, images.shape[0])):
            sys_.track_monocular(images[j], j / 30.0)
        i = min(i + 8, images.shape[0])
        assert sys_.map.n_keyframes() == kfs_at_block
        assert fake.interrupts >= 1  # the gate fired where want was True
        # Phase 3: mapper idle again -> insertion resumes.
        fake.busy = False
        fake.q = 0
        for j in range(i, images.shape[0]):
            sys_.track_monocular(images[j], j / 30.0)
        assert sys_.map.n_keyframes() > kfs_at_block
        assert sys_.tracking_state() == TrackingState.OK
        sys_.shutdown()

    def test_busy_mapper_stereo_shallow_queue_inserts(self):
        cfg = synthetic_config(
            width=400, height=300, n_features=1000, sensor="stereo"
        )
        lefts, rights, poses_gt, _ = synthetic.render_stereo_sequence(
            cfg.camera, n_frames=20, n_points=400, seed=3, step=0.05
        )
        sys_ = System(cfg)
        fake = FakeWorker()
        sys_.track_stereo(lefts[0], rights[0], 0.0)  # stereo init: KF 0
        assert sys_.tracking_state() == TrackingState.OK
        sys_.tracker.mapping_worker = fake
        # Busy mapper, shallow queue: stereo still inserts (<3 queued).
        fake.busy = True
        fake.q = 2
        k0 = sys_.map.n_keyframes()
        for i in range(1, 10):
            sys_.track_stereo(lefts[i], rights[i], i / 30.0)
        assert sys_.map.n_keyframes() > k0
        assert fake.interrupts >= 1
        # Deep queue: refused.
        fake.q = 5
        k1 = sys_.map.n_keyframes()
        for i in range(10, 20):
            sys_.track_stereo(lefts[i], rights[i], i / 30.0)
        assert sys_.map.n_keyframes() == k1
        sys_.shutdown()

    def test_insert_keyframe_never_blocks(self):
        import threading
        import time

        from orb_slam2_commit_tpu.slam.async_pipeline import MappingWorker

        release = threading.Event()

        class StuckMapper:
            abort_ba = False

            def process_keyframe(self, kf):
                release.wait(timeout=30.0)

        w = MappingWorker(StuckMapper(), None, threading.RLock(),
                          max_queue=3)
        try:
            t0 = time.monotonic()
            for k in range(6):      # 1 in-flight + 3 queued + 2 overflow
                w.insert_keyframe(k)
            elapsed = time.monotonic() - t0
            assert elapsed < 1.0, elapsed  # a blocking put would hang
            assert w.dropped >= 1
            assert w.queued() <= 3
        finally:
            release.set()
            w.join()


class TestConcurrencyStress:
    def test_tracking_through_gba_abort_relaunch(self):
        """Tracking continues while local BA runs on the worker AND a
        global BA is aborted mid-flight by a relaunch (the reference's
        new-loop-aborts-old-GBA protocol, src/LoopClosing.cc:556-572 +
        the GBA thread :801). Gate: no deadlock, clean merge/abort
        accounting, trajectory still ORB-SLAM2-class."""
        cfg = synthetic_config(width=400, height=300, n_features=1000)
        images, poses_gt, scene = synthetic.render_sequence(
            cfg.camera, n_frames=30, n_points=400, seed=3, step=0.05
        )
        sys_ = System(cfg, async_mapping=True)   # bundled vocab: gba_runner on
        assert sys_.loop_closer is not None
        gba = sys_.loop_closer.gba_runner
        assert gba is not None
        # Hold every GBA in flight until released: the abort-relaunch
        # overlap must be deterministic, not a race against solve wall
        # time (with a warm compile cache the tiny-map solve finishes
        # between launches and `running` was never observed True).
        import threading as _th

        gate = _th.Event()
        orig_run = gba._run

        def gated_run(m, anchor_kf, n_iters, gen):
            gate.wait(timeout=60.0)
            return orig_run(m, anchor_kf, n_iters, gen)

        gba._run = gated_run
        launched = aborted_relaunch = 0
        for i in range(images.shape[0]):
            sys_.track_monocular(images[i], i / 30.0)
            # After the map exists, keep a GBA permanently in flight and
            # abort-relaunch it while tracking runs.
            if sys_.map.n_keyframes() >= 4 and i % 5 == 0:
                if gba.running:
                    aborted_relaunch += 1
                gba.launch(sys_.map, anchor_kf=0)
                launched += 1
        gate.set()          # release the held solves: stale gens abort
        sys_.shutdown()     # joins the last GBA: merge or clean abort
        assert launched >= 2
        assert aborted_relaunch >= 1
        assert gba.n_merged + gba.n_aborted == launched
        assert not gba.running
        assert sys_.tracking_state() == TrackingState.OK

        est = sys_.trajectory_positions()
        lost = np.asarray([e.lost for e in sys_.tracker.trajectory], bool)
        gt = np.asarray([-R.T @ t for R, t in poses_gt])
        offset = len(poses_gt) - len(est)
        ok = ~lost
        rmse = traj.ate_rmse(est[ok], gt[offset:][ok], align_scale=True)
        span = np.linalg.norm(gt[-1] - gt[0])
        assert rmse < 0.10 * span, (rmse, span)
