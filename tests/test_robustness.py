"""Failure-recovery robustness through the System facade.

The reference validates these paths only live (kidnap recovery via
Tracking::Relocalization, src/Tracking.cc:1653-1884; rotation-heavy
sequences via the motion-model + keyframe ladder). Here: a kidnap test
(occlusion -> LOST -> BoW relocalization with the reference's 50-inlier
two-stage accept), and a rotation-dominant arc (the geometry that round
2's fundamental-matrix convention bug silently broke)."""

import dataclasses

import numpy as np
import pytest

from orb_slam2_commit_tpu.slam.system import System
from orb_slam2_commit_tpu.slam.tracking import TrackingState
from orb_slam2_commit_tpu.utils import synthetic
from orb_slam2_commit_tpu.utils import trajectory as traj
from orb_slam2_commit_tpu.utils.config import synthetic_config


class TestKidnapRecovery:
    @pytest.fixture(scope="class")
    def kidnap_run(self):
        cfg = synthetic_config(width=400, height=300, n_features=1000)
        images, poses_gt, scene = synthetic.render_sequence(
            cfg.camera, n_frames=40, n_points=500, seed=3, step=0.025,
            motion="sweep", depth_range=(1.5, 4.0), spread=2.0,
        )
        sys_ = System(cfg)   # bundled vocabulary -> BoW reloc candidates
        states = []
        blank = np.full_like(images[0], 96.0)
        poses = []
        for i in range(40):
            ts = i / cfg.camera.fps
            if 22 <= i < 27:
                # Kidnap: full occlusion for 5 frames.
                pose = sys_.track_monocular(blank, ts)
            else:
                pose = sys_.track_monocular(images[i], ts)
            poses.append(pose)
            states.append(sys_.tracker.state)
        return sys_, states, poses, poses_gt

    def test_goes_lost_during_occlusion(self, kidnap_run):
        _, states, _, _ = kidnap_run
        assert TrackingState.LOST in states[22:27]

    def test_relocalizes_after_occlusion(self, kidnap_run):
        sys_, states, _, _ = kidnap_run
        assert states[-1] == TrackingState.OK
        # Recovery happened via the reloc ladder, not re-initialization.
        assert sys_.tracker.last_reloc_frame_id >= 27

    def test_recovered_pose_accuracy(self, kidnap_run):
        """The recovered poses must land on the ground-truth trajectory
        (wrong-pose recoveries are how maps get corrupted)."""
        sys_, states, poses, poses_gt = kidnap_run
        gt = np.asarray([-R.T @ t for R, t in poses_gt])
        est, gsel = [], []
        for i in range(28, 40):
            if poses[i] is None:
                continue
            R, t = poses[i]
            est.append(-R.T @ t)
            gsel.append(gt[i])
        assert len(est) >= 8, "too few tracked frames after recovery"
        est, gsel = np.asarray(est), np.asarray(gsel)
        # Use the pre-kidnap segment to fix the mono scale/frame, then
        # measure post-recovery error in that frame.
        pre_est, pre_gt = [], []
        for i in range(0, 22):
            if poses[i] is None:
                continue
            R, t = poses[i]
            pre_est.append(-R.T @ t)
            pre_gt.append(gt[i])
        s, Ralign, tal = traj.umeyama_alignment(
            np.asarray(pre_est), np.asarray(pre_gt), True
        )
        err = np.linalg.norm(
            (s * est @ Ralign.T + tal) - gsel, axis=1
        )
        span = np.linalg.norm(gt[-1] - gt[0])
        assert np.median(err) < 0.05 * span, (np.median(err), span)


class TestRotationDominant:
    def test_tracks_circular_arc(self):
        """Rotation-dominant survey (~3.6 deg/frame yaw, KITTI-turn-class):
        the map must keep growing through the rotation and tracking must
        survive the whole arc."""
        cfg = synthetic_config(width=400, height=300, n_features=500)
        cfg = dataclasses.replace(
            cfg,
            tracker=dataclasses.replace(cfg.tracker, min_matches_init=60),
        )
        images, poses_gt, scene = synthetic.render_loop_sequence(
            cfg.camera, n_frames=60, frac=0.6, seed=4,
        )
        sys_ = System(cfg, vocabulary=None)
        tracked = 0
        for i in range(60):
            if sys_.track_monocular(images[i], i / 30.0) is not None:
                tracked += 1
        assert sys_.tracking_state() == TrackingState.OK
        assert tracked >= 40, tracked
        # Structure must have been extended well beyond the init map
        # (the F-convention regression froze it near ~120 points).
        assert sys_.map.n_points() > 300, sys_.map.n_points()
        est = sys_.trajectory_positions()
        lost = np.asarray([e.lost for e in sys_.tracker.trajectory], bool)
        gt = np.asarray([-R.T @ t for R, t in poses_gt])
        offset = len(poses_gt) - len(est)
        rmse = traj.ate_rmse(
            est[~lost], gt[offset:][~lost], align_scale=True
        )
        span = np.abs(gt).max() * 2
        assert rmse < 0.03 * span, (rmse, span)


class TestLocalWindowSpanningTree:
    """UpdateLocalKeyFrames adds spanning-tree children and parent of the
    K1 window (reference src/Tracking.cc:1573-1621) — the escape hatch
    when covisibility alone starves (post-relocalization, fast rotation)."""

    def test_tree_links_expand_starved_window(self):
        import numpy as np

        from orb_slam2_commit_tpu.models.map_state import INVALID, MapState
        from orb_slam2_commit_tpu.slam.tracking import Tracker
        from orb_slam2_commit_tpu.utils.config import MapConfig, synthetic_config

        N = 32
        cfg = synthetic_config(width=320, height=240, n_features=N)
        m = MapState.create(MapConfig(max_keyframes=8, max_points=256), N)

        def add_kf(bound_pids):
            xy = np.zeros((N, 2))
            octv = np.zeros(N, np.int32)
            ang = np.zeros(N, np.float32)
            desc = np.zeros((N, 8), np.uint32)
            fvalid = np.zeros(N, bool)
            binding = np.full(N, INVALID, np.int32)
            for slot, pid in enumerate(bound_pids):
                fvalid[slot] = True
                binding[slot] = pid
            return m.add_keyframe(
                np.eye(3), np.zeros(3), xy, octv, ang, desc, fvalid,
                binding, frame_id=m.next_kf, timestamp=float(m.next_kf),
            )

        # KF0 observes points 0-19; KF1 shares only 5 with KF0 (below the
        # covisibility threshold 15) but is KF0's spanning-tree child;
        # KF2 is KF0's parent, sharing nothing.
        pids = m.add_points(
            np.random.default_rng(0).uniform(-1, 1, (40, 3)) + [0, 0, 5],
            first_kf=0,
        )
        kf0 = add_kf(pids[:20])
        kf1 = add_kf(pids[15:20].tolist() + pids[20:35].tolist())
        kf2 = add_kf(pids[35:40])
        m.kf_parent[kf1] = kf0   # child link
        m.kf_parent[kf0] = kf2   # parent link

        tracker = Tracker(cfg, m)
        import types

        frame = types.SimpleNamespace(
            point_ids=np.asarray(pids[:15], np.int32)  # only KF0 observes
        )
        local = set(tracker._local_keyframes(frame).tolist())
        # KF0 is the lone covisible observer; the tree links must pull in
        # both the child (KF1) and the parent (KF2).
        assert kf0 in local
        assert kf1 in local, "spanning-tree child missing from local window"
        assert kf2 in local, "spanning-tree parent missing from local window"
