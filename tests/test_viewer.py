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


class TestViewerLoop:
    """Live render thread (reference Viewer thread, src/Viewer.cc:55-243)."""

    def _mini_system(self):
        import time

        from orb_slam2_commit_tpu.slam.system import System
        from orb_slam2_commit_tpu.utils import synthetic
        from orb_slam2_commit_tpu.utils.config import synthetic_config

        cfg = synthetic_config(width=320, height=240, n_features=600)
        images, poses_gt, scene = synthetic.render_sequence(
            cfg.camera, n_frames=6, n_points=300, seed=3, step=0.05
        )
        return System(cfg), images, cfg

    def test_renders_at_fps_and_menus(self):
        import time

        sys_, images, cfg = self._mini_system()
        vl = viewer.ViewerLoop(sys_, fps=60.0).start()
        for i, im in enumerate(images):
            sys_.track_monocular(im, i / 30.0)
            vl.update(sys_.tracker.last_frame, im)
        # Let it spin a few periods on the final state.
        time.sleep(0.2)
        assert vl.n_rendered >= 5
        assert vl.frame_view is not None and vl.frame_view.ndim == 3
        assert vl.map_view is not None and vl.map_view.shape[0] == 512
        assert vl.metrics["n_keyframes"] == sys_.map.n_keyframes()

        # Menu toggles route to the System like the reference panel.
        vl.set_localization_mode(True)
        assert sys_.tracker.localization_only
        vl.set_localization_mode(False)
        assert not sys_.tracker.localization_only
        vl.follow_camera = False
        time.sleep(0.05)

        # Pause / release (reference RequestStop → isStopped handshake,
        # src/Viewer.cc:203-227): the stop is asynchronous, so poll
        # is_stopped before sampling the frozen render count.
        vl.request_stop()
        deadline = time.time() + 2.0
        while not vl.is_stopped() and time.time() < deadline:
            time.sleep(0.005)
        assert vl.is_stopped()
        n = vl.n_rendered
        time.sleep(0.1)
        assert vl.n_rendered == n
        vl.release()
        time.sleep(0.1)
        assert vl.n_rendered > n

        # Queued reset executes on the viewer thread (menuReset :135-152).
        vl.request_reset()
        time.sleep(0.2)
        assert sys_.map.n_keyframes() == 0

        vl.join(timeout=2.0)
        assert vl.is_finished()
