"""Map save/load + localization-mode session tests."""

import numpy as np
import pytest

from orb_slam2_commit_tpu.models import serialization
from orb_slam2_commit_tpu.slam.system import System
from orb_slam2_commit_tpu.slam.tracking import TrackingState
from orb_slam2_commit_tpu.utils import synthetic
from orb_slam2_commit_tpu.utils.config import synthetic_config


@pytest.fixture(scope="module")
def mapped_session(tmp_path_factory):
    cfg = synthetic_config(width=400, height=300, n_features=1000)
    images, poses_gt, scene = synthetic.render_sequence(
        cfg.camera, n_frames=28, n_points=400, seed=3, step=0.05
    )
    sys_ = System(cfg)
    for i in range(images.shape[0]):
        sys_.track_monocular(images[i], i / 30.0)
    assert sys_.tracking_state() == TrackingState.OK
    path = str(tmp_path_factory.mktemp("maps") / "map.npz")
    sys_.save_map(path)
    return cfg, images, poses_gt, sys_, path


class TestSerialization:
    def test_roundtrip_arrays(self, mapped_session):
        cfg, _, _, sys_, path = mapped_session
        m2 = serialization.load_map(path)
        m1 = sys_.map
        assert m2.next_kf == m1.next_kf
        assert m2.next_pt == m1.next_pt
        np.testing.assert_array_equal(m2.kf_valid, m1.kf_valid)
        np.testing.assert_array_equal(m2.kf_pose_R, m1.kf_pose_R)
        np.testing.assert_array_equal(m2.pt_pos, m1.pt_pos)
        np.testing.assert_array_equal(m2.kf_point_idx, m1.kf_point_idx)
        np.testing.assert_array_equal(m2.cov_weight, m1.cov_weight)

    def test_loop_edges_roundtrip(self, tmp_path):
        from orb_slam2_commit_tpu.models.map_state import MapState
        from orb_slam2_commit_tpu.utils.config import MapConfig

        m = MapState.create(MapConfig(max_keyframes=8, max_points=64), 4)
        m.add_loop_edge(3, 1)
        m.add_loop_edge(1, 3)      # dedup, order-normalized
        path = str(tmp_path / "m.npz")
        serialization.save_map(m, path)
        m2 = serialization.load_map(path)
        assert m2.loop_edges == [(1, 3)]
        assert m2.has_loop_edge(3) and m2.has_loop_edge(1)
        assert not m2.has_loop_edge(0)

    def test_localization_only_session(self, mapped_session):
        """A fresh System loads the map and localizes (pure localization
        mode — the reference's ActivateLocalizationMode use case)."""
        cfg, images, poses_gt, _, path = mapped_session
        sys2 = System(cfg)
        sys2.load_map(path)
        sys2.activate_localization_mode()
        assert sys2.tracking_state() == TrackingState.LOST
        # Feed frames from the mapped sequence: relocalization should fire
        # and tracking proceed without inserting keyframes.
        n_kf_before = sys2.map.n_keyframes()
        tracked = 0
        for i in range(12, 24):
            pose = sys2.track_monocular(images[i], i / 30.0)
            if pose is not None:
                tracked += 1
        assert tracked >= 6, tracked
        assert sys2.map.n_keyframes() == n_kf_before
