"""Abortable background global BA (slam/global_ba.py).

Covers the reference's RunGlobalBundleAdjustment semantics
(src/LoopClosing.cc:884-1020): concurrent solve, generation-token abort,
and the spanning-tree / reference-keyframe propagation of corrections to
keyframes and points created while the solve ran.
"""

import threading

import numpy as np
import pytest

from orb_slam2_commit_tpu.models.map_state import INVALID, MapState
from orb_slam2_commit_tpu.slam.global_ba import GlobalBARunner
from orb_slam2_commit_tpu.slam.tracking import build_ba_problem
from orb_slam2_commit_tpu.utils.config import MapConfig, synthetic_config

N_FEAT = 64


def build_noisy_map(rng, k_kf=6, n_lm=100, pose_noise=0.02, pt_noise=0.02):
    """Keyframes on a line observing a box of landmarks; observations are
    exact projections of TRUE geometry, while map poses/points carry
    noise — global BA should pull them back."""
    cfg = synthetic_config(width=640, height=480, n_features=N_FEAT)
    cam = cfg.camera
    lm = rng.uniform([-2, -1.5, 4], [2, 1.5, 8], (n_lm, 3))

    m = MapState.create(MapConfig(max_keyframes=32, max_points=1024), N_FEAT)
    pids = m.add_points(lm + rng.normal(0, pt_noise, lm.shape), first_kf=0)

    R_true = np.tile(np.eye(3), (k_kf, 1, 1))
    t_true = np.stack(
        [-np.array([0.15 * k, 0.0, 0.0]) for k in range(k_kf)]
    )
    for k in range(k_kf):
        pc = lm @ R_true[k].T + t_true[k]
        u = cam.fx * pc[:, 0] / pc[:, 2] + cam.cx
        v = cam.fy * pc[:, 1] / pc[:, 2] + cam.cy
        vis = (u > 5) & (u < cam.width - 5) & (v > 5) & (v < cam.height - 5)
        sel = np.where(vis)[0][:N_FEAT]
        xy = np.zeros((N_FEAT, 2))
        binding = np.full(N_FEAT, INVALID, np.int32)
        fvalid = np.zeros(N_FEAT, bool)
        xy[: sel.size] = np.stack([u[sel], v[sel]], -1)
        binding[: sel.size] = pids[sel]
        fvalid[: sel.size] = True
        t_noisy = t_true[k] + (rng.normal(0, pose_noise, 3) if k > 0 else 0)
        m.add_keyframe(
            R_true[k], t_noisy, xy,
            np.zeros(N_FEAT, np.int32), np.zeros(N_FEAT, np.float32),
            np.zeros((N_FEAT, 8), np.uint32), fvalid, binding,
            frame_id=k, timestamp=float(k),
        )
    m.refresh_point_stats()
    return cfg, m, R_true, t_true, lm


def reproj_rmse(m, cfg):
    cam = cfg.camera
    errs = []
    for k in np.where(m.kf_valid)[0]:
        sel = m.kf_point_idx[k] >= 0
        if not sel.any():
            continue
        pw = m.pt_pos[m.kf_point_idx[k][sel]]
        pc = pw @ m.kf_pose_R[k].T + m.kf_pose_t[k]
        uv = np.stack(
            [cam.fx * pc[:, 0] / pc[:, 2] + cam.cx,
             cam.fy * pc[:, 1] / pc[:, 2] + cam.cy], -1
        )
        errs.append(np.linalg.norm(uv - m.kf_xy[k][sel], axis=1))
    e = np.concatenate(errs)
    return float(np.sqrt((e ** 2).mean()))


class TestGlobalBARunner:
    def test_blocking_solve_reduces_error(self):
        rng = np.random.default_rng(0)
        cfg, m, *_ = build_noisy_map(rng)
        before = reproj_rmse(m, cfg)
        runner = GlobalBARunner(cfg)
        runner.launch(m, anchor_kf=0, n_iters=10, blocking=True)
        after = reproj_rmse(m, cfg)
        assert runner.n_merged == 1
        assert after < 0.2 * before
        assert m.big_change_idx == 1

    def test_stale_generation_aborts_without_touching_map(self):
        rng = np.random.default_rng(1)
        cfg, m, *_ = build_noisy_map(rng)
        pose_before = m.kf_pose_t.copy()
        pts_before = m.pt_pos.copy()
        runner = GlobalBARunner(cfg)
        runner._run(m, anchor_kf=0, n_iters=4, gen=-1)   # already invalidated
        assert runner.n_aborted == 1
        np.testing.assert_array_equal(m.kf_pose_t, pose_before)
        np.testing.assert_array_equal(m.pt_pos, pts_before)

    def test_merge_propagates_to_keyframes_and_points_created_meanwhile(self):
        # Deterministic re-enactment of "map grew during the solve": take
        # the snapshot, add a child keyframe + a new point, then merge a
        # solution that moves the whole snapshot by a known rigid G. The
        # new KF must follow its spanning-tree parent; the new point must
        # keep its camera-frame position in its reference keyframe
        # (reference :944-963, :984-1004 — here both expectations are
        # exactly G applied to the world).
        rng = np.random.default_rng(2)
        cfg, m, *_ = build_noisy_map(rng)
        runner = GlobalBARunner(cfg)

        valid = np.where(m.kf_valid)[0]
        assembled = build_ba_problem(
            m, free_kfs=valid[1:], fixed_kfs=valid[:1],
            point_ids=np.where(m.pt_valid)[0], orb_cfg=cfg.orb,
        )
        snap_kf, snap_pt = m.next_kf, m.next_pt

        # Map grows during the "solve": child of the last snapshot KF.
        parent = int(valid[-1])
        R_child = m.kf_pose_R[parent].copy()
        t_child = m.kf_pose_t[parent] + np.array([0.1, 0.0, 0.02])
        new_pid = m.add_points(np.array([[0.3, 0.2, 5.0]]), first_kf=snap_kf)[0]
        binding = np.full(N_FEAT, INVALID, np.int32)
        binding[0] = new_pid
        child = m.add_keyframe(
            R_child, t_child, np.zeros((N_FEAT, 2)),
            np.zeros(N_FEAT, np.int32), np.zeros(N_FEAT, np.float32),
            np.zeros((N_FEAT, 8), np.uint32), np.ones(N_FEAT, bool), binding,
            frame_id=99, timestamp=99.0,
        )
        m.kf_parent[child] = parent
        p_old = m.pt_pos[new_pid].copy()

        # Solution: every snapshot pose right-composed with G^-1 (a global
        # rigid remap of the world), points mapped by G.
        theta = 0.2
        Rg = np.array(
            [[np.cos(theta), 0, np.sin(theta)],
             [0, 1, 0],
             [-np.sin(theta), 0, np.cos(theta)]]
        )
        tg = np.array([0.3, -0.1, 0.2])
        K_pad = assembled.problem.R.shape[0]
        R_sol = np.asarray(assembled.problem.R).copy()
        t_sol = np.asarray(assembled.problem.t).copy()
        for ci in range(len(assembled.kf_ids)):
            Rc, tc = R_sol[ci].copy(), t_sol[ci].copy()
            R_sol[ci] = Rc @ Rg.T
            t_sol[ci] = -Rc @ Rg.T @ tg + tc
        pts_sol = np.asarray(assembled.problem.points).copy()
        n_real = assembled.point_ids.size
        pts_sol[:n_real] = pts_sol[:n_real] @ Rg.T + tg
        out = assembled.problem._replace(
            R=R_sol, t=t_sol, points=pts_sol
        )
        runner._merge(m, assembled, out, snap_kf, snap_pt)

        # New KF follows the parent: Tcw_child' = Tcw_child_old @ G^-1.
        exp_R = R_child @ Rg.T
        exp_t = -R_child @ Rg.T @ tg + t_child
        np.testing.assert_allclose(m.kf_pose_R[child], exp_R, atol=1e-10)
        np.testing.assert_allclose(m.kf_pose_t[child], exp_t, atol=1e-10)
        # New point mapped by G.
        np.testing.assert_allclose(
            m.pt_pos[new_pid], Rg @ p_old + tg, atol=1e-10
        )

    def test_loop_closure_with_background_gba(self):
        # Full loop-closing pipeline with the GBA runner attached (the
        # async System wiring): the transient thread must solve and merge
        # concurrently, and the corrected map must match the quality of
        # the synchronous inline GBA path (tests/test_loop_closing.py).
        from orb_slam2_commit_tpu.models.kf_database import KeyFrameDatabase
        from orb_slam2_commit_tpu.models.vocabulary import BinaryVocabulary
        from orb_slam2_commit_tpu.slam.loop_closing import LoopCloser
        from orb_slam2_commit_tpu.utils.trajectory import ate_rmse
        from tests.test_loop_closing import K_KF, build_drifted_loop_map

        rng = np.random.default_rng(0)
        cfg, m, R_true, t_true, _ = build_drifted_loop_map(rng)
        voc = BinaryVocabulary.train(
            rng.integers(0, 2**32, size=(2000, 8), dtype=np.uint32),
            k=8, levels=3, seed=2,
        )
        db = KeyFrameDatabase(voc, m.cfg.max_keyframes)
        closer = LoopCloser(cfg, m, db, essential_min_weight=30)
        lock = threading.RLock()
        closer.gba_runner = GlobalBARunner(cfg, map_lock=lock)
        pre_R, pre_t = m.kf_pose_R.copy(), m.kf_pose_t.copy()
        for k in range(K_KF):
            with lock:
                closer.process_keyframe(k)
        closer.gba_runner.join()
        assert closer.n_loops_closed >= 1
        assert closer.gba_runner.n_merged >= 1

        centers = lambda Rs, ts: np.stack(  # noqa: E731
            [-Rs[k].T @ ts[k] for k in range(K_KF)]
        )
        ate_pre = ate_rmse(
            centers(pre_R, pre_t), centers(R_true, t_true), align_scale=True
        )
        ate_post = ate_rmse(
            centers(m.kf_pose_R, m.kf_pose_t), centers(R_true, t_true),
            align_scale=True,
        )
        assert ate_post < 0.75 * ate_pre, (ate_pre, ate_post)

    def test_threaded_launch_and_abort(self):
        rng = np.random.default_rng(3)
        cfg, m, *_ = build_noisy_map(rng)
        lock = threading.RLock()
        runner = GlobalBARunner(cfg, map_lock=lock)
        runner.launch(m, anchor_kf=0, n_iters=8)
        runner.request_abort()
        runner.join()
        assert runner.n_merged + runner.n_aborted == 1
        # Relaunch runs to completion and merges.
        before = reproj_rmse(m, cfg)
        runner.launch(m, anchor_kf=0, n_iters=10)
        runner.join()
        assert runner.n_merged >= 1
        assert reproj_rmse(m, cfg) <= before * 1.01
