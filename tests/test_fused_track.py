"""Fused single-dispatch tracking (jit_frontend.fused_motion_track) vs the
staged path: same math, one graph. Tolerances allow for float-level
differences from fusion context and f32-vs-f64 undistortion."""

import numpy as np
import pytest

from orb_slam2_commit_tpu.slam.system import System
from orb_slam2_commit_tpu.utils import synthetic
from orb_slam2_commit_tpu.utils.config import synthetic_config


@pytest.fixture(scope="module")
def sequence():
    cfg = synthetic_config(width=320, height=240, n_features=600)
    images, poses_gt, scene = synthetic.render_sequence(
        cfg.camera, n_frames=8, n_points=300, seed=3, step=0.05
    )
    return cfg, images, poses_gt


def _run(cfg, images, fused: bool, monkeypatch):
    monkeypatch.setenv("ORB_TPU_FUSED_TRACK", "1" if fused else "0")
    sys_ = System(cfg)
    poses = []
    for i, im in enumerate(images):
        poses.append(sys_.track_monocular(im, i / cfg.camera.fps))
    return sys_, poses


@pytest.fixture(scope="module")
def stereo_sequence():
    cfg = synthetic_config(width=320, height=240, n_features=600,
                           sensor="stereo")
    lefts, rights, poses_gt, _ = synthetic.render_stereo_sequence(
        cfg.camera, n_frames=8, n_points=300, seed=5, step=0.05
    )
    return cfg, lefts, rights, poses_gt


def _run_stereo(cfg, lefts, rights, fused: bool, monkeypatch):
    monkeypatch.setenv("ORB_TPU_FUSED_TRACK", "1" if fused else "0")
    sys_ = System(cfg)
    poses = []
    for i in range(lefts.shape[0]):
        poses.append(sys_.track_stereo(lefts[i], rights[i],
                                       i / cfg.camera.fps))
    return sys_, poses


def test_fused_stereo_matches_staged(stereo_sequence, monkeypatch):
    cfg, lefts, rights, _gt = stereo_sequence
    s_staged, p_staged = _run_stereo(cfg, lefts, rights, fused=False,
                                     monkeypatch=monkeypatch)
    s_fused, p_fused = _run_stereo(cfg, lefts, rights, fused=True,
                                   monkeypatch=monkeypatch)

    assert s_fused.tracking_state() == s_staged.tracking_state()
    n_tracked_staged = sum(p is not None for p in p_staged)
    n_tracked_fused = sum(p is not None for p in p_fused)
    assert n_tracked_fused >= n_tracked_staged - 1
    assert n_tracked_fused >= 5

    t = s_fused.timings()
    assert "fused_frontend" in t and t["fused_frontend"]["count"] >= 1
    assert "fused_frontend" not in s_staged.timings()

    for pf, ps in zip(p_fused, p_staged):
        if pf is None or ps is None:
            continue
        Rf, tf = pf
        Rs, ts = ps
        assert np.linalg.norm(tf - ts) < 5e-2
        assert np.linalg.norm(Rf - Rs) < 5e-2

    # Stereo depth survives the fused route (metric-scale observations).
    ff = s_fused.tracker.last_frame
    assert (ff.ur >= 0).sum() > 50
    assert (ff.depth > 0).sum() > 50


def test_fused_rgbd_matches_staged(monkeypatch):
    cfg = synthetic_config(width=320, height=240, n_features=600,
                           sensor="rgbd")
    images, _gt, _scene, depths = synthetic.render_sequence(
        cfg.camera, n_frames=8, n_points=300, seed=6, step=0.05,
        with_depth=True,
    )

    def run(fused):
        monkeypatch.setenv("ORB_TPU_FUSED_TRACK", "1" if fused else "0")
        sys_ = System(cfg)
        poses = [
            sys_.track_rgbd(images[i], depths[i], i / cfg.camera.fps)
            for i in range(images.shape[0])
        ]
        return sys_, poses

    s_staged, p_staged = run(False)
    s_fused, p_fused = run(True)
    assert "fused_frontend" in s_fused.timings()
    n_staged = sum(p is not None for p in p_staged)
    n_fused = sum(p is not None for p in p_fused)
    assert n_fused >= n_staged - 1 and n_fused >= 5
    for pf, ps in zip(p_fused, p_staged):
        if pf is None or ps is None:
            continue
        assert np.linalg.norm(pf[1] - ps[1]) < 5e-2
    # Depth rides through the fused route.
    assert (s_fused.tracker.last_frame.depth > 0).sum() > 50


def test_fused_matches_staged(sequence, monkeypatch):
    cfg, images, _gt = sequence
    s_staged, p_staged = _run(cfg, images, fused=False, monkeypatch=monkeypatch)
    s_fused, p_fused = _run(cfg, images, fused=True, monkeypatch=monkeypatch)

    assert s_fused.tracking_state() == s_staged.tracking_state()
    n_tracked_staged = sum(p is not None for p in p_staged)
    n_tracked_fused = sum(p is not None for p in p_fused)
    assert n_tracked_fused >= n_tracked_staged - 1
    assert n_tracked_fused >= 4

    # The fused route must actually have been taken.
    t = s_fused.timings()
    assert "fused_frontend" in t and t["fused_frontend"]["count"] >= 1
    assert "fused_frontend" not in s_staged.timings()

    # Per-frame poses agree closely wherever both tracked.
    for pf, ps in zip(p_fused, p_staged):
        if pf is None or ps is None:
            continue
        Rf, tf = pf
        Rs, ts = ps
        assert np.linalg.norm(tf - ts) < 5e-2
        assert np.linalg.norm(Rf - Rs) < 5e-2

    # Frame bindings overwhelmingly identical.
    ff, fs = s_fused.tracker.last_frame, s_staged.tracker.last_frame
    both = (ff.point_ids >= 0) | (fs.point_ids >= 0)
    if both.sum() > 20:
        agree = (ff.point_ids == fs.point_ids)[both].mean()
        assert agree > 0.9, agree
