"""Localization-only visual odometry: temporal depth points + mbVO logic.

Reference behavior: in ActivateLocalizationMode sessions with a depth
sensor, Tracking::UpdateLastFrame spawns one-frame "visual odometry"
map points from the last frame's depth (src/Tracking.cc:971-1047) and the
mbVO flag rides motion-model tracking while relocalization is retried
(src/Tracking.cc:382-447). No keyframes or persistent points may be
created.
"""

import numpy as np
import pytest

from orb_slam2_commit_tpu.slam.system import System
from orb_slam2_commit_tpu.slam.tracking import TrackingState
from orb_slam2_commit_tpu.utils import synthetic
from orb_slam2_commit_tpu.utils.config import synthetic_config


@pytest.fixture(scope="module")
def rgbd_localization_session(tmp_path_factory):
    cfg = synthetic_config(
        width=400, height=300, n_features=1000, sensor="rgbd"
    )
    images, poses_gt, scene, depths = synthetic.render_sequence(
        cfg.camera, n_frames=18, n_points=400, seed=5, step=0.05,
        with_depth=True,
    )
    sys_ = System(cfg)
    # Map only the first half of the trajectory.
    for i in range(9):
        sys_.track_rgbd(images[i], depths[i], i / 30.0)
    assert sys_.tracking_state() == TrackingState.OK
    path = str(tmp_path_factory.mktemp("maps") / "rgbd_map.npz")
    sys_.save_map(path)
    return cfg, images, depths, path


def test_vo_session_preserves_map_and_tracks(rgbd_localization_session):
    cfg, images, depths, path = rgbd_localization_session
    sys2 = System(cfg)
    sys2.load_map(path)
    sys2.activate_localization_mode()
    n_kf0 = sys2.map.n_keyframes()
    n_pt0 = sys2.map.n_points()
    next_pt0 = sys2.map.next_pt

    tracked = 0
    vo_frames = 0
    spawned_any = False
    for i in range(4, 18):
        pose = sys2.track_rgbd(images[i], depths[i], i / 30.0)
        if pose is not None:
            tracked += 1
        if sys2.tracker.vo_only:
            vo_frames += 1
        # Temporal points are torn down before track() returns.
        assert sys2.tracker._temporal_points.size == 0
        spawned_any = spawned_any or sys2.map.next_pt != next_pt0
    assert tracked >= 8, tracked
    # The persistent map must be untouched: no keyframes, no leaked
    # points, allocation cursor rolled back after every frame.
    assert sys2.map.n_keyframes() == n_kf0
    assert sys2.map.n_points() == n_pt0
    assert sys2.map.next_pt == next_pt0


def test_vo_points_spawn_for_unbound_depth_features(rgbd_localization_session):
    cfg, images, depths, path = rgbd_localization_session
    sys2 = System(cfg)
    sys2.load_map(path)
    sys2.activate_localization_mode()

    # Track two frames so last_frame has pose + (sparse) bindings.
    sys2.track_rgbd(images[6], depths[6], 0.0)
    sys2.track_rgbd(images[7], depths[7], 1 / 30.0)
    tr = sys2.tracker
    if tr.last_frame is None or tr.last_frame.R is None:
        pytest.skip("localization did not latch onto the map")
    n_pt0 = sys2.map.n_points()
    next_pt0 = sys2.map.next_pt
    tr._spawn_temporal_vo_points()
    n_spawned = tr._temporal_points.size
    unbound_depth = (
        tr.last_frame.valid
        & (tr.last_frame.depth > 0)
    ).sum()
    if unbound_depth:
        assert n_spawned > 0
        # Spawned points are bound into the last frame.
        assert (
            np.isin(tr.last_frame.point_ids, tr._temporal_points).sum()
            == n_spawned
        )
    tr._clear_temporal_vo_points(tr.last_frame)
    assert sys2.map.n_points() == n_pt0
    assert sys2.map.next_pt == next_pt0
