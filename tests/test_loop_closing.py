"""Loop closing integration test on a synthetically drifted circular map.

Builds a MapState directly (no image pipeline): keyframes on a circle
observing ring landmarks, with accumulated drift injected into the later
poses and their anchored map points. The last keyframes revisit the start;
the loop closer must detect the loop via BoW, estimate the drift Sim3,
and pull the map back to consistency.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam2_commit_tpu.models.kf_database import KeyFrameDatabase
from orb_slam2_commit_tpu.models.map_state import INVALID, MapState
from orb_slam2_commit_tpu.models.vocabulary import BinaryVocabulary
from orb_slam2_commit_tpu.ops import lie
from orb_slam2_commit_tpu.slam.loop_closing import LoopCloser
from orb_slam2_commit_tpu.utils.config import MapConfig, synthetic_config

N_FEAT = 96
K_KF = 24
STEP_KF = 18  # keyframes per full circle; K_KF > STEP_KF revisits the start
N_LM = 1100
REUSE_WINDOW = 2  # a landmark binds to an existing point only if seen
                  # within the last REUSE_WINDOW keyframes — revisits after
                  # drift create duplicate points, like real lost tracking.


def build_drifted_loop_map(rng):
    """Returns (config, map_state, true poses, landmark descriptors)."""
    import dataclasses as _dc

    cfg = synthetic_config(width=640, height=480, n_features=N_FEAT)
    # Wide FOV (f = 0.5 w) so successive views overlap well on the circle.
    cfg = _dc.replace(
        cfg,
        camera=_dc.replace(cfg.camera, fx=320.0, fy=320.0),
    )
    cam = cfg.camera

    # Ring of landmarks at radius 8, camera circle radius 2 facing outward.
    ang_lm = rng.uniform(0, 2 * np.pi, N_LM)
    lm = np.stack(
        [8.0 * np.sin(ang_lm), rng.uniform(-2.5, 2.5, N_LM),
         8.0 * np.cos(ang_lm)], -1
    )
    lm_desc = rng.integers(0, 2**32, size=(N_LM, 8), dtype=np.uint32)

    # True keyframe poses: camera on a circle of radius 5, looking outward.
    R_true, t_true = [], []
    for k in range(K_KF):
        a = 2 * np.pi * k / STEP_KF
        R_wc = np.asarray(lie.so3_exp(jnp.asarray([0.0, a, 0.0])))
        c = np.array([2.0 * np.sin(a), 0.0, 2.0 * np.cos(a)])
        R_cw = R_wc.T
        R_true.append(R_cw)
        t_true.append(-R_cw @ c)
    R_true, t_true = np.stack(R_true), np.stack(t_true)

    # Drift: growing SE3 error for k >= 1 (the last KF overlaps KF0's view
    # but with an offset pose).
    R_est = R_true.copy()
    t_est = t_true.copy()
    drift_w = np.array([0.0, 0.004, 0.0])
    acc = np.eye(3)
    for k in range(1, K_KF):
        acc = acc @ np.asarray(lie.so3_exp(jnp.asarray(drift_w)))
        R_est[k] = R_true[k] @ acc
        t_est[k] = t_true[k] + np.array([0.015, 0.0, 0.01]) * k

    map_cfg = MapConfig(max_keyframes=64, max_points=4096)
    m = MapState.create(map_cfg, N_FEAT)

    # Each KF observes landmarks in its true frustum; points anchored at
    # their first observer get that observer's drift applied. Landmarks
    # unseen for more than REUSE_WINDOW keyframes spawn duplicate points.
    pt_id_of_lm = np.full(N_LM, -1, np.int64)
    lm_last_seen = np.full(N_LM, -(10**9), np.int64)
    for k in range(K_KF):
        pc_true = lm @ R_true[k].T + t_true[k]
        z = pc_true[:, 2]
        u = cam.fx * pc_true[:, 0] / np.maximum(z, 1e-6) + cam.cx
        v = cam.fy * pc_true[:, 1] / np.maximum(z, 1e-6) + cam.cy
        vis = (z > 0.5) & (u > 10) & (u < cam.width - 10) & (v > 10) & (v < cam.height - 10)
        vis_ids = np.where(vis)[0][:N_FEAT]

        # Drifted world position for landmarks first seen here (or unseen
        # long enough that tracking would have failed): consistent with the
        # drifted pose (p_drift = T_est^-1 T_true p).
        for li in vis_ids:
            if pt_id_of_lm[li] < 0 or k - lm_last_seen[li] > REUSE_WINDOW:
                p_cam = lm[li] @ R_true[k].T + t_true[k]
                p_drift = (p_cam - t_est[k]) @ R_est[k]
                pid = m.add_points(p_drift[None], first_kf=k)[0]
                pt_id_of_lm[li] = pid
            lm_last_seen[li] = k

        # Observations: project the DRIFTED point with the DRIFTED pose
        # (locally consistent, like a drifted-but-converged SLAM map).
        xy = np.zeros((N_FEAT, 2))
        octv = np.zeros(N_FEAT, np.int32)
        angle = np.zeros(N_FEAT, np.float32)
        desc = np.zeros((N_FEAT, 8), np.uint32)
        fvalid = np.zeros(N_FEAT, bool)
        binding = np.full(N_FEAT, INVALID, np.int32)
        for slot, li in enumerate(vis_ids):
            pid = pt_id_of_lm[li]
            pw = m.pt_pos[pid]
            pc = pw @ R_est[k].T + t_est[k]
            if pc[2] <= 0.1:
                continue
            xy[slot] = [
                cam.fx * pc[0] / pc[2] + cam.cx,
                cam.fy * pc[1] / pc[2] + cam.cy,
            ]
            desc[slot] = lm_desc[li]
            fvalid[slot] = True
            binding[slot] = pid
        m.add_keyframe(
            R_est[k], t_est[k], xy, octv, angle, desc, fvalid, binding,
            frame_id=k, timestamp=float(k),
        )
    m.refresh_point_stats()
    return cfg, m, R_true, t_true, lm_desc


class TestLoopClosing:
    @pytest.fixture(scope="class")
    def closed_map(self):
        rng = np.random.default_rng(0)
        cfg, m, R_true, t_true, lm_desc = build_drifted_loop_map(rng)
        voc = BinaryVocabulary.train(
            rng.integers(0, 2**32, size=(2000, 8), dtype=np.uint32),
            k=8, levels=3, seed=2,
        )
        db = KeyFrameDatabase(voc, m.cfg.max_keyframes)
        closer = LoopCloser(cfg, m, db, essential_min_weight=30)
        pre_poses = (m.kf_pose_R.copy(), m.kf_pose_t.copy())
        closed_at = -1
        for k in range(K_KF):
            if closer.process_keyframe(k) and closed_at < 0:
                closed_at = k
        return cfg, m, R_true, t_true, closer, closed_at, pre_poses

    def test_loop_detected_and_closed(self, closed_map):
        _, _, _, _, closer, closed_at, _ = closed_map
        assert closer.n_loops_closed >= 1
        assert closed_at >= 13  # only after revisiting the start

    def test_loop_edge_retained_and_protected(self, closed_map):
        """The closed loop leaves a permanent edge (reference AddLoopEdge,
        src/LoopClosing.cc:792-793) whose keyframes are protected from
        culling (mbNotErase, src/KeyFrame.cc:532-565)."""
        _, m, _, _, closer, _, _ = closed_map
        assert m.loop_edges, "loop edge not retained"
        a, b = m.loop_edges[0]
        assert m.has_loop_edge(a) and m.has_loop_edge(b)

    def test_drift_removed(self, closed_map):
        """Closure must reduce the aligned ATE of keyframe centers and the
        worst-case rotation error (closure redistributes the loop error —
        absolute per-pose comparison is gauge-dependent, aligned ATE is the
        standard metric)."""
        _, m, R_true, t_true, closer, _, (pre_R, pre_t) = closed_map
        from orb_slam2_commit_tpu.utils.trajectory import ate_rmse

        centers_post = np.stack(
            [-m.kf_pose_R[k].T @ m.kf_pose_t[k] for k in range(K_KF)]
        )
        centers_true = np.stack(
            [-R_true[k].T @ t_true[k] for k in range(K_KF)]
        )
        centers_pre = np.stack(
            [-pre_R[k].T @ pre_t[k] for k in range(K_KF)]
        )
        # Monocular: evaluate with similarity alignment (the essential
        # graph legitimately uses gauge scale to absorb loop error).
        ate_pre = ate_rmse(centers_pre, centers_true, align_scale=True)
        ate_post = ate_rmse(centers_post, centers_true, align_scale=True)
        assert ate_post < 0.75 * ate_pre, (ate_pre, ate_post)

        max_rot_err = 0.0
        for k in range(K_KF):
            c = (np.trace(R_true[k].T @ m.kf_pose_R[k]) - 1) / 2
            max_rot_err = max(
                max_rot_err, np.degrees(np.arccos(np.clip(c, -1, 1)))
            )
        # Worst pre-closure rotation drift is ~5.3 deg.
        assert max_rot_err < 2.0, max_rot_err
