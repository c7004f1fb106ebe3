"""Profiling subsystem (utils/profiling.py) + System stage wiring."""

import time

import numpy as np

from orb_slam2_commit_tpu.utils.profiling import Profiler, device_trace


def test_profiler_stats():
    p = Profiler()
    for dt in (0.01, 0.02, 0.03):
        p.record("stage_a", dt)
    with p.timed("stage_b"):
        time.sleep(0.005)
    s = p.summary()
    assert s["stage_a"]["count"] == 3
    assert abs(s["stage_a"]["mean_ms"] - 20.0) < 1e-6
    assert s["stage_a"]["max_ms"] >= 30.0 - 1e-6
    assert s["stage_b"]["count"] == 1
    assert s["stage_b"]["mean_ms"] >= 4.0
    report = p.report()
    assert "stage_a" in report and "stage_b" in report
    p.reset()
    assert p.summary() == {}


def test_device_trace_noop_or_active(tmp_path):
    # Must never raise, whatever the backend supports.
    with device_trace(str(tmp_path), enabled=True) as active:
        assert active in (True, False)
    with device_trace(str(tmp_path), enabled=False) as active:
        assert active is False


def test_system_records_stage_timings():
    from orb_slam2_commit_tpu.slam.system import System
    from orb_slam2_commit_tpu.utils import synthetic
    from orb_slam2_commit_tpu.utils.config import synthetic_config

    cfg = synthetic_config(width=160, height=120, n_features=150)
    images, _poses, _scene = synthetic.render_sequence(
        cfg.camera, n_frames=2, n_points=100, seed=1, step=0.05
    )
    sys_ = System(cfg)
    for i in range(2):
        sys_.track_monocular(images[i], i / cfg.camera.fps)
    t = sys_.timings()
    assert t["extract_frame"]["count"] == 2
    assert t["track"]["count"] == 2
    assert t["extract_frame"]["mean_ms"] > 0
