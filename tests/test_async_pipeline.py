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
