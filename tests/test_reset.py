"""Reset behaviors: auto-reset when tracking is lost right after
initialization (reference: src/Tracking.cc:540-552), and full pipeline
rewiring in System.reset (reference: Tracking::Reset,
src/Tracking.cc:1886-1932 clears map, database and thread state).
"""

import numpy as np

from orb_slam2_commit_tpu.slam.system import System
from orb_slam2_commit_tpu.slam.tracking import TrackingState
from orb_slam2_commit_tpu.utils import synthetic
from orb_slam2_commit_tpu.utils.config import synthetic_config


def test_lost_after_init_triggers_auto_reset_and_recovers():
    cfg = synthetic_config(width=320, height=240, n_features=600)
    images, poses_gt, scene = synthetic.render_sequence(
        cfg.camera, n_frames=6, n_points=300, seed=5, step=0.05
    )
    sys_ = System(cfg)
    for i in range(images.shape[0]):
        sys_.track_monocular(images[i], i / 30.0)
    assert sys_.tracking_state() == TrackingState.OK
    assert sys_.map.n_keyframes() <= 5  # precondition for the auto-reset

    # Unmatchable garbage frames: tracking fails, the map is tiny, so the
    # tracker must request a full reset instead of going LOST.
    rng = np.random.default_rng(0)
    garbage = rng.integers(0, 255, size=images[0].shape).astype(images.dtype)
    out = sys_.track_monocular(garbage, 1.0)
    assert out is None
    assert sys_.tracking_state() in (
        TrackingState.NO_IMAGES_YET, TrackingState.NOT_INITIALIZED
    )
    assert sys_.map.n_keyframes() == 0
    # Every stage must be rewired to the fresh map.
    assert sys_.tracker.map is sys_.map
    assert sys_.mapper.map is sys_.map
    assert not sys_.tracker.request_reset

    # The system must be able to initialize + track again from scratch.
    for i in range(images.shape[0]):
        sys_.track_monocular(images[i], 2.0 + i / 30.0)
    assert sys_.tracking_state() == TrackingState.OK
    assert sys_.map.n_keyframes() >= 2


def test_reset_does_not_fire_in_localization_mode():
    cfg = synthetic_config(width=320, height=240, n_features=600)
    images, _, _ = synthetic.render_sequence(
        cfg.camera, n_frames=6, n_points=300, seed=5, step=0.05
    )
    sys_ = System(cfg)
    for i in range(images.shape[0]):
        sys_.track_monocular(images[i], i / 30.0)
    assert sys_.tracking_state() == TrackingState.OK
    sys_.activate_localization_mode()
    rng = np.random.default_rng(1)
    garbage = rng.integers(0, 255, size=images[0].shape).astype(images.dtype)
    sys_.track_monocular(garbage, 1.0)
    # Lost, but the (possibly loaded) map must survive.
    assert sys_.tracking_state() == TrackingState.LOST
    assert sys_.map.n_keyframes() >= 2
