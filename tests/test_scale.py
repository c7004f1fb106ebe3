"""KITTI-class scale validation (opt-in: set ORB_RUN_SCALE=1).

The reference's operating envelope is full public sequences — thousands
of frames, hundreds of keyframes, 10^5 points (SURVEY.md §4,
Examples/Stereo/stereo_kitti.cc:29-166). This test runs the complete
System on the synthetic city-block drive at that scale and gates on:

  * tracking survives the whole drive and closes the end-of-lap loop;
  * hundreds-to-1000+ keyframes and tens of thousands of points
    actually exercised (defaults: 330 m circuit -> 360+ KFs / 15k+ pts;
    ORB_SCALE_BIG=1 -> 850 m, 1000+ KFs / 40k+ pts);
  * ATE (scale-aligned) < 1.5% of path length after loop closure;
  * per-frame wall time does not grow super-linearly with map size
    (median of the last quarter vs the first quarter, keyframe frames
    excluded by using the median).

The full drive takes ~1-2 h on a 2-core CPU host, hence opt-in; the
always-on tests below cover the drive generator itself. Measured runs:
scale_drive_r4_330m.json (361 KFs, ATE 0.075% of path, loop closed) and
the COMPLETE 850 m-class drive scale_drive_r5_850m.json (2800 frames,
1058 KFs / 46k pts, loop corrected at 965 KFs, ATE 0.341% of the
949.5 m path, zero lost frames; re-validated bit-identical on the PCG
essential-graph path in scale_drive_r5_850m_pcg.json).

Run:
  ORB_RUN_SCALE=1 python -m pytest tests/test_scale.py -q -k full_drive
"""

import os

import numpy as np
import pytest

from orb_slam2_commit_tpu.utils import synthetic
from orb_slam2_commit_tpu.utils.config import synthetic_config


class TestDriveGenerator:
    def test_trajectory_closes_loop(self):
        poses = synthetic.drive_trajectory(400, r0=40.0, frac=1.0)
        c0 = -poses[0][0].T @ poses[0][1]
        c1 = -poses[-1][0].T @ poses[-1][1]
        assert np.linalg.norm(c1 - c0) < 1.0  # full lap returns home

    def test_scene_scale_and_visibility(self):
        cfg = synthetic_config(width=512, height=384, n_features=800)
        rng = np.random.default_rng(0)
        scene = synthetic.drive_scene(rng, n_points=20000, r0=40.0)
        assert scene.points.shape == (20000, 3)
        poses = synthetic.drive_trajectory(10, r0=40.0, frac=0.02)
        img = synthetic.render(
            scene, poses[0][0], poses[0][1], cfg.camera, max_depth=16.0
        )
        assert img.shape == (384, 512)
        # The street canyon must supply a healthy feature field.
        pc = scene.points @ poses[0][0].T + poses[0][1]
        vis = (pc[:, 2] > 0.5) & (pc[:, 2] < 16.0)
        assert vis.sum() > 300

    def test_frames_generator_lazy(self):
        cfg = synthetic_config(width=256, height=192, n_features=200)
        frames, poses, scene = synthetic.drive_frames(
            cfg.camera, n_frames=5, n_points=2000, seed=1, frac=0.01
        )
        out = list(frames())
        assert len(out) == 5
        assert out[0][1].shape == (192, 256)


@pytest.mark.skipif(
    os.environ.get("ORB_RUN_SCALE") != "1",
    reason="full-scale drive takes hours; set ORB_RUN_SCALE=1",
)
class TestFullDrive:
    def test_full_drive(self, tmp_path):
        import dataclasses
        import time

        from orb_slam2_commit_tpu.slam.system import System
        from orb_slam2_commit_tpu.slam.tracking import TrackingState
        from orb_slam2_commit_tpu.utils import trajectory as traj

        # Two measured geometries (artifacts: scale_drive_r4_330m.json /
        # scale_drive_r4_850m.json.log): the default 330 m circuit gives
        # ~360 KFs / ~19.5k pts in ~1 h on a 2-core CPU host; ORB_SCALE_BIG=1
        # selects the 850 m circuit (~1000 KFs / ~45k pts, ~2 h).
        big = os.environ.get("ORB_SCALE_BIG") == "1"
        n_frames = int(os.environ.get(
            "ORB_SCALE_FRAMES", 2800 if big else 1600
        ))
        r0 = 115.0 if big else 40.0
        n_lm = 345000 if big else 120000
        min_kfs, min_pts = (1000, 40000) if big else (300, 15000)
        # Stereo: the reference's KITTI regime is stereo
        # (Examples/Stereo/stereo_kitti.cc), and close-depth point
        # spawning is what reaches the 10^5-point class.
        cfg = synthetic_config(
            width=640, height=480, n_features=1500, sensor="stereo"
        )
        cfg = dataclasses.replace(
            cfg,
            tracker=dataclasses.replace(
                cfg.tracker,
                kf_baseline_depth_ratio=0.08,
                kf_view_angle_deg=8.0,
            ),
        )
        frames, poses_gt, scene = synthetic.drive_frames(
            cfg.camera, n_frames=n_frames, n_points=n_lm, seed=7,
            r0=r0, max_depth=12.0, stereo=True,
        )
        sys_ = System(cfg)
        dt = np.zeros(n_frames)
        for k, left, right in frames():
            t0 = time.perf_counter()
            sys_.track_stereo(left, right, k / 30.0)
            dt[k] = time.perf_counter() - t0
        sys_.shutdown()

        assert sys_.tracking_state() == TrackingState.OK
        assert sys_.map.n_keyframes() >= min_kfs
        assert int(sys_.map.pt_valid.sum()) >= min_pts
        assert sys_.loop_closer.n_loops_closed >= 1

        est = sys_.trajectory_positions()
        lost = np.asarray([e.lost for e in sys_.tracker.trajectory], bool)
        gt = np.asarray([-R.T @ t for R, t in poses_gt])
        offset = len(poses_gt) - len(est)
        ok = ~lost
        rmse = traj.ate_rmse(est[ok], gt[offset:][ok], align_scale=True)
        path_len = float(
            np.linalg.norm(np.diff(gt, axis=0), axis=1).sum()
        )
        assert rmse < 0.015 * path_len, (rmse, path_len)

        # No super-linear per-frame growth: compare the median frame
        # time of the last quarter (400+ KFs in the map) against the
        # first quarter (tens of KFs).
        q1 = float(np.median(dt[: n_frames // 4]))
        q4 = float(np.median(dt[3 * n_frames // 4:]))
        assert q4 < 3.0 * q1, (q1, q4)
