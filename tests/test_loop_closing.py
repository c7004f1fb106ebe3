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


class TestSearchBySim3Augmentation:
    """SearchBySim3 mutual-consistency augmentation (reference
    src/ORBmatcher.cc:1238-1487, called from ComputeSim3 at
    src/LoopClosing.cc:393): the initial brute-force match count sits just
    above the 20-inlier Sim3 gate, and the 40-total-match acceptance gate
    is reachable only with the Sim3-projected augmentation."""

    N = 64
    N_CLEAN = 22     # matched by brute force (identical descriptors)
    N_NOISY = 38     # Hamming ~60: fails TH_LOW=50, passes TH_HIGH=100

    def _build_two_kf_map(self):
        import dataclasses as _dc

        rng = np.random.default_rng(11)
        cfg = synthetic_config(width=640, height=480, n_features=self.N)
        cam = cfg.camera
        n = self.N_CLEAN + self.N_NOISY

        pts = np.stack([
            rng.uniform(-1.8, 1.8, n),
            rng.uniform(-1.3, 1.3, n),
            rng.uniform(4.0, 8.0, n),
        ], -1)
        desc_a = rng.integers(0, 2**32, size=(n, 8), dtype=np.uint32)
        desc_b = desc_a.copy()
        # Corrupt the noisy block: flip exactly 60 of 256 bits.
        for i in range(self.N_CLEAN, n):
            bits = rng.choice(256, size=60, replace=False)
            mask = np.zeros(8, np.uint32)
            for b in bits:
                mask[b // 32] |= np.uint32(1) << np.uint32(b % 32)
            desc_b[i] ^= mask

        R_a, t_a = np.eye(3), np.zeros(3)
        R_b = np.asarray(lie.so3_exp(jnp.asarray([0.0, 0.06, 0.0])))
        t_b = np.array([0.25, 0.0, 0.05])

        map_cfg = MapConfig(max_keyframes=8, max_points=256)
        m = MapState.create(map_cfg, self.N)

        def add_kf(R, t, desc, first_kf):
            pc = pts @ R.T + t
            uv = np.stack([
                cam.fx * pc[:, 0] / pc[:, 2] + cam.cx,
                cam.fy * pc[:, 1] / pc[:, 2] + cam.cy,
            ], -1)
            pid = m.add_points(pts, first_kf=first_kf)
            xy = np.zeros((self.N, 2))
            xy[:n] = uv
            octv = np.zeros(self.N, np.int32)
            angle = np.zeros(self.N, np.float32)
            d = np.zeros((self.N, 8), np.uint32)
            d[:n] = desc
            fvalid = np.zeros(self.N, bool)
            fvalid[:n] = True
            binding = np.full(self.N, INVALID, np.int32)
            binding[:n] = pid
            return m.add_keyframe(
                R, t, xy, octv, angle, d, fvalid, binding,
                frame_id=first_kf, timestamp=float(first_kf),
            )

        kf_a = add_kf(R_a, t_a, desc_a, 0)   # current keyframe
        kf_b = add_kf(R_b, t_b, desc_b, 1)   # loop candidate (duplicate pts)
        m.refresh_point_stats()
        return cfg, m, kf_a, kf_b

    def test_loop_accepted_only_with_augmentation(self):
        from orb_slam2_commit_tpu.models.vocabulary import BinaryVocabulary

        cfg, m, kf_a, kf_b = self._build_two_kf_map()
        rng = np.random.default_rng(5)
        voc = BinaryVocabulary.train(
            rng.integers(0, 2**32, size=(500, 8), dtype=np.uint32),
            k=4, levels=2, seed=2,
        )
        db = KeyFrameDatabase(voc, m.cfg.max_keyframes)
        closer = LoopCloser(cfg, m, db)

        # Without augmentation: 22 brute-force matches pass the Sim3
        # RANSAC but the 40-total gate fails (widening is TH_LOW too).
        empty = (np.zeros(0, np.int64), np.zeros(0, np.int64))
        orig = closer._search_by_sim3
        closer._search_by_sim3 = lambda *a, **k: empty
        ok, *_ = closer.compute_sim3(kf_a, [kf_b])
        assert not ok, "loop must be rejected without augmentation"

        # With augmentation: the 38 TH_HIGH-only pairs are recovered by
        # mutual Sim3 projection and the loop is accepted.
        closer._search_by_sim3 = orig
        ok, loop_kf, s_cw, R_cw, t_cw, matches = closer.compute_sim3(
            kf_a, [kf_b]
        )
        assert ok, "loop must be accepted with augmentation"
        assert loop_kf == kf_b
        assert len(matches) >= 40
        # The recovered matches include noisy-block features.
        noisy_feats = set(range(self.N_CLEAN, self.N_CLEAN + self.N_NOISY))
        assert len(noisy_feats & set(matches.keys())) >= 20

    def test_mutual_consistency_no_false_pairs(self):
        """Augmented pairs must bind each current-KF feature to the
        candidate feature observing the SAME landmark (ground truth known
        by construction)."""
        cfg, m, kf_a, kf_b = self._build_two_kf_map()
        from orb_slam2_commit_tpu.models.vocabulary import BinaryVocabulary

        rng = np.random.default_rng(5)
        voc = BinaryVocabulary.train(
            rng.integers(0, 2**32, size=(500, 8), dtype=np.uint32),
            k=4, levels=2, seed=2,
        )
        db = KeyFrameDatabase(voc, m.cfg.max_keyframes)
        closer = LoopCloser(cfg, m, db)
        # True relative Sim3: p_a = R_ab p_b + t_ab with s = 1.
        R_a, t_a = m.kf_pose_R[kf_a], m.kf_pose_t[kf_a]
        R_b, t_b = m.kf_pose_R[kf_b], m.kf_pose_t[kf_b]
        R_ab = R_a @ R_b.T
        t_ab = t_a - R_ab @ t_b
        seed1 = np.arange(5)           # pretend only 5 pairs matched so far
        new1, new2 = closer._search_by_sim3(
            kf_a, kf_b, 1.0, R_ab, t_ab, seed1, seed1
        )
        assert new1.size >= 40
        # Feature slots are aligned by construction: slot i in both KFs
        # observes landmark i.
        np.testing.assert_array_equal(new1, new2)
