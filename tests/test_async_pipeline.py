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
