"""Headless viewer smoke tests."""

import numpy as np

from orb_slam2_commit_tpu.slam import viewer
from orb_slam2_commit_tpu.slam.frame import Frame
from orb_slam2_commit_tpu.models.map_state import MapState
from orb_slam2_commit_tpu.utils.config import MapConfig


def make_frame(n=20, h=120, w=160):
    rng = np.random.default_rng(0)
    xy = rng.uniform([10, 20], [w - 10, h - 10], (n, 2))
    f = Frame(
        frame_id=0, timestamp=0.0,
        xy=xy, xy_raw=xy.copy(),
        octave=np.zeros(n, np.int32), angle=np.zeros(n, np.float32),
        response=np.ones(n, np.float32),
        desc=np.zeros((n, 8), np.uint32),
        valid=np.ones(n, bool),
        depth=np.full(n, -1.0, np.float32),
        ur=np.full(n, -1.0, np.float32),
    )
    f.point_ids[: n // 2] = np.arange(n // 2)
    return f


class TestViewer:
    def test_draw_frame_overlay(self):
        f = make_frame()
        img = np.full((120, 160), 100.0, np.float32)
        m = MapState.create(MapConfig(max_keyframes=8, max_points=64), 20)
        out = viewer.draw_frame(f, img, "OK", m)
        assert out.shape == (120, 160, 3)
        assert out.dtype == np.uint8
        # Tracked keypoints leave green pixels.
        assert (out[..., 1] > out[..., 0]).any()

    def test_draw_map_topdown(self):
        m = MapState.create(MapConfig(max_keyframes=8, max_points=64), 20)
        ids = m.add_points(
            np.random.default_rng(1).uniform(-3, 3, (30, 3)), first_kf=0
        )
        pi = np.full(20, -1, np.int32)
        pi[:20] = ids[:20]
        m.add_keyframe(
            np.eye(3), np.zeros(3), np.zeros((20, 2)),
            np.zeros(20, np.int32), np.zeros(20, np.float32),
            np.zeros((20, 8), np.uint32), np.ones(20, bool), pi, 0, 0.0,
        )
        out = viewer.draw_map_topdown(m, (np.eye(3), np.zeros(3)))
        assert out.shape == (512, 512, 3)
        assert out.sum() > 0

    def test_topdown_graph_loop_edges_and_follow(self):
        m = MapState.create(MapConfig(max_keyframes=8, max_points=256), 20)
        ids = m.add_points(
            np.random.default_rng(2).uniform(-3, 3, (40, 3)), first_kf=0
        )
        pi = np.full(20, -1, np.int32)
        pi[:20] = ids[:20]
        # Non-colinear camera centers (top-down is x-z) so covisibility,
        # spanning-tree and loop edges draw on distinct pixel runs.
        for k, c in enumerate([(0.0, 0.0), (2.0, 0.0), (1.0, 2.0)]):
            t = -np.array([c[0], 0.0, c[1]])        # R = I -> t = -c
            m.add_keyframe(
                np.eye(3), t, np.zeros((20, 2)),
                np.zeros(20, np.int32), np.zeros(20, np.float32),
                np.zeros((20, 8), np.uint32), np.ones(20, bool), pi, k,
                float(k),
            )
        m.kf_parent[1] = 0
        m.kf_parent[2] = 1
        m.add_loop_edge(0, 2)
        out = viewer.draw_map_topdown(m, (np.eye(3), np.zeros(3)))
        # Loop edge leaves red-dominant pixels.
        red = (out[..., 0] > 200) & (out[..., 1] < 100)
        assert red.any()
        # Spanning-tree pass leaves its dark-green color somewhere.
        tree = (out[..., 1] == 140)
        assert tree.any()
        follow = viewer.draw_map_topdown(
            m, (np.eye(3), np.asarray([-2.0, 0.0, 0.0])), follow=True
        )
        assert follow.shape == out.shape
        assert not np.array_equal(follow, out)

    def test_metrics(self):
        from orb_slam2_commit_tpu.slam.tracking import Tracker
        from orb_slam2_commit_tpu.utils.config import synthetic_config

        cfg = synthetic_config(width=160, height=120, n_features=20)
        m = MapState.create(MapConfig(max_keyframes=8, max_points=64), 20)
        tr = Tracker(cfg, m)
        metrics = viewer.collect_metrics(tr, m)
        assert metrics["n_keyframes"] == 0
        assert metrics["state"] == "NO_IMAGES_YET"
