"""The tracking front end: per-frame pose estimation state machine.

TPU-native replacement for Tracking (reference: src/Tracking.cc). Same
state machine (NOT_INITIALIZED -> OK <-> LOST, include/Tracking.h:81-87)
and the same per-frame ladder:

  motion-model tracking -> reference-KF tracking fallback ->
  (relocalization when LOST) -> local-map tracking -> keyframe decision

but every numeric stage is a jitted fixed-shape kernel: projection matching
(slam/matchers.py), pose-only BA (optim/pose_opt.py), two-view bootstrap
(geometry/twoview.py). Host code only orchestrates and does cheap numpy
bookkeeping — the web of per-object mutexes in the reference disappears
because the map has a single writer (the pipeline driver).
"""

from __future__ import annotations

import dataclasses
import enum
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam2_commit_tpu.geometry import pnp, twoview
from orb_slam2_commit_tpu.models.map_state import INVALID, MapState
from orb_slam2_commit_tpu.optim import ba, pose_opt
from orb_slam2_commit_tpu.optim.residuals import BAObservations
from orb_slam2_commit_tpu.slam import matchers
from orb_slam2_commit_tpu.slam.frame import Frame, orthonormalize_rotation
from orb_slam2_commit_tpu.utils.config import SLAMConfig

# Relocalization batches the per-candidate matching + EPnP RANSAC into
# single device dispatches; the batch is capped (best-scored first) and
# padded to a power of two so lost frames reuse compilations.
MAX_RELOC_CANDIDATES = 16


class TrackingState(enum.Enum):
    NO_IMAGES_YET = 0
    NOT_INITIALIZED = 1
    OK = 2
    LOST = 3


@dataclasses.dataclass
class TrajectoryEntry:
    """Relative-pose bookkeeping for trajectory export (reference:
    src/Tracking.cc:563-585 mlRelativeFramePoses)."""

    ref_kf: int
    R_rel: np.ndarray   # Tcw_frame * Twc_refkf
    t_rel: np.ndarray
    timestamp: float
    lost: bool


class Tracker:
    def __init__(self, config: SLAMConfig, map_state: MapState):
        self.config = config
        self.map = map_state
        self.state = TrackingState.NO_IMAGES_YET
        self.last_frame: Optional[Frame] = None
        self.init_ref_frame: Optional[Frame] = None
        self.velocity: Optional[Tuple[np.ndarray, np.ndarray]] = None
        self.ref_kf: int = -1
        self.last_kf_frame_id: int = 0
        self.last_reloc_frame_id: int = -(10 ** 9)
        self.trajectory: List[TrajectoryEntry] = []
        self.n_inliers: int = 0
        self._rng_key = jax.random.key(0)
        self.localization_only = False
        # Visual-odometry mode inside localization-only sessions: the last
        # frame matched almost no persistent map points, so tracking rides
        # temporal depth points while relocalization is attempted each
        # frame (reference mbVO, src/Tracking.cc:382-447,1113-1129).
        self.vo_only = False
        self._temporal_points = np.zeros(0, np.int32)
        # Set when tracking is lost soon after initialization and the map
        # is too small to relocalize against — the System responds with a
        # full reset (reference: src/Tracking.cc:540-552).
        self.request_reset = False
        # Optional place-recognition database (set by the System when the
        # vocabulary stack is enabled).
        self.kf_database = None
        # Optional async mapping worker (set by the System when mapping
        # runs on a background thread); need_new_keyframe consults its
        # idle/queue state like the reference's AcceptKeyFrames gate
        # (src/Tracking.cc:1240-1295). None = synchronous mapper, which
        # is always idle.
        self.mapping_worker = None
        # Optional sub-stage profiler (set by the System; see
        # utils/profiling.Profiler). Stages: track_motion, track_ref_kf,
        # track_local_map, track_reloc, track_need_kf.
        self.profiler = None

    # ------------------------------------------------------------------
    # Pose optimization wrapper
    # ------------------------------------------------------------------

    def _optimize_pose(self, frame: Frame, R0, t0) -> Tuple[np.ndarray, np.ndarray, np.ndarray, int]:
        """Pose-only BA over the frame's current point bindings
        (reference: Optimizer::PoseOptimization call sites
        src/Tracking.cc:957,1110,1162)."""
        cam = self.config.camera
        bound = frame.point_ids >= 0
        pts = self.map.pt_pos[np.maximum(frame.point_ids, 0)]
        inv_sigma2 = (1.0 / self.config.orb.level_sigma2()[0]) / np.asarray(
            self.config.orb.level_sigma2()
        )[np.clip(frame.octave, 0, self.config.orb.n_levels - 1)]
        is_stereo = frame.ur >= 0
        uvr = np.concatenate(
            [frame.xy, np.where(is_stereo, frame.ur, 0.0)[:, None]], axis=1
        )
        obs = BAObservations(
            cam_idx=jnp.zeros(frame.n, jnp.int32),
            pt_idx=jnp.arange(frame.n, dtype=jnp.int32),
            uvr=jnp.asarray(uvr),
            inv_sigma2=jnp.asarray(inv_sigma2),
            is_stereo=jnp.asarray(is_stereo & bound),
            valid=jnp.asarray(bound & frame.valid),
        )
        res = pose_opt.pose_optimization_jit(
            jnp.asarray(R0), jnp.asarray(t0), jnp.asarray(pts), obs,
            cam.fx, cam.fy, cam.cx, cam.cy, cam.bf,
        )
        R_out, t_out = np.asarray(res.R), np.asarray(res.t)
        if not (np.all(np.isfinite(R_out)) and np.all(np.isfinite(t_out))):
            # A degenerate solve (e.g. duplicated zero-parallax bindings)
            # can return NaNs from the device; report failure with the
            # initial pose instead of letting a NaN rotation reach
            # orthonormalize_rotation's SVD (observed crash: replaying
            # the just-tracked frame in localization mode).
            return np.asarray(R0), np.asarray(t0), np.zeros_like(bound), 0
        inliers = np.asarray(res.inliers)
        # Unbind outlier observations (reference: src/Tracking.cc:1119-1133).
        frame.point_ids = np.where(bound & ~inliers, INVALID, frame.point_ids)
        return R_out, t_out, inliers, int(res.n_inliers)

    # ------------------------------------------------------------------
    # Initialization (monocular)
    # ------------------------------------------------------------------

    def _try_initialize_mono(self, frame: Frame) -> bool:
        """Oracle: Tracking::MonocularInitialization (src/Tracking.cc:661-757)
        + CreateInitialMapMonocular (:759-888)."""
        cfg = self.config
        if self.init_ref_frame is None or self.init_ref_frame.valid.sum() < 100:
            self.init_ref_frame = frame
            return False
        if frame.valid.sum() < 100:
            self.init_ref_frame = None
            return False

        ref = self.init_ref_frame
        m = matchers.match_for_initialization(
            jnp.asarray(ref.xy), jnp.asarray(ref.desc), jnp.asarray(ref.angle),
            jnp.asarray(ref.octave), jnp.asarray(ref.valid),
            jnp.asarray(frame.xy), jnp.asarray(frame.desc), jnp.asarray(frame.angle),
            jnp.asarray(frame.octave), jnp.asarray(frame.valid),
        )
        idx = np.asarray(m.idx)
        n_matches = int((idx >= 0).sum())
        if n_matches < self.config.tracker.min_matches_init:
            self.init_ref_frame = frame
            return False

        # Full-size padded pair arrays (fixed shapes -> one XLA compile for
        # every init attempt).
        matched = idx >= 0
        uv1 = jnp.asarray(ref.xy)
        uv2 = jnp.asarray(frame.xy[np.maximum(idx, 0)])
        K = jnp.asarray(np.asarray(cfg.camera.k_matrix))
        self._rng_key, sub = jax.random.split(self._rng_key)
        res = twoview.initialize_two_view_jit(
            sub, uv1, uv2, jnp.asarray(matched), K,
            min_parallax=float(cfg.tracker.init_min_parallax_deg),
        )
        if not bool(res.ok):
            return False

        R21 = np.asarray(res.R21)
        t21 = np.asarray(res.t21)
        good = np.asarray(res.good) & matched

        # Noise-robust parallax gate. The reference gates init on the
        # parallax of the TRIANGULATED points (src/Initializer.cc:1284-1295
        # via ReconstructF/H), but at near-zero true parallax the DLT depths
        # scatter wildly and that estimate is inflated far above truth — a
        # 0.3-0.9 deg two-frame geometry routinely "passes" a 1 deg gate and
        # produces a self-consistent but depth-degenerate map that poisons
        # all later tracking (measured: 3% median structure error at init,
        # 20% ATE by frame 40). Instead measure parallax directly from the
        # correspondences: warp ref pixels by the infinite homography
        # K*R21*K^-1 (pure-rotation prediction); the residual flow is
        # f*tan(parallax) to first order and immune to triangulation
        # noise. Statistic: the 50th-LARGEST flow — the reference's own
        # order statistic (51st-largest parallax, Initializer.cc:1284-1295)
        # — NOT the median: under forward motion flow vanishes toward the
        # epipole, so the median stays small long after the outer image
        # ring has initialization-grade parallax.
        Kc = np.asarray(cfg.camera.k_matrix)
        Hinf = Kc @ R21 @ np.linalg.inv(Kc)
        xy1h = np.concatenate(
            [np.asarray(ref.xy), np.ones((ref.n, 1))], axis=1
        )
        warped = xy1h @ Hinf.T
        warped = warped[:, :2] / np.maximum(warped[:, 2:3], 1e-9)
        flow = np.linalg.norm(np.asarray(frame.xy[np.maximum(idx, 0)]) - warped, axis=1)
        sel = good if good.sum() >= 20 else matched
        if not sel.any():
            return False
        flows = np.sort(flow[sel])[::-1]
        flow_stat = float(flows[min(50, flows.size) - 1])
        f_px = 0.5 * (cfg.camera.fx + cfg.camera.fy)
        min_flow = f_px * np.tan(np.radians(cfg.tracker.init_min_parallax_deg))
        if flow_stat < min_flow:
            return False
        pts = np.asarray(res.points)[good]

        # Median-depth normalization (reference: src/Tracking.cc:846-869).
        depths = pts[:, 2]
        med = np.median(depths)
        if med <= 0 or good.sum() < self.config.tracker.min_matches_init:
            return False
        inv_med = 1.0 / med
        pts = pts * inv_med
        t21 = t21 * inv_med

        # Feature indices of the good triangulations.
        ref_feat = np.where(good)[0]
        cur_feat = idx[good]

        # Keyframes 0 and 1.
        ref.set_pose(np.eye(3), np.zeros(3))
        frame.set_pose(R21, t21)
        pt_ids = self.map.add_points(pts, first_kf=0)
        ref_binding = np.full(ref.n, INVALID, np.int32)
        ref_binding[ref_feat] = pt_ids
        cur_binding = np.full(frame.n, INVALID, np.int32)
        cur_binding[cur_feat] = pt_ids

        kf0 = self.map.add_keyframe(
            ref.R, ref.t, ref.xy, ref.octave, ref.angle, ref.desc,
            ref.valid, ref_binding, ref.frame_id, ref.timestamp,
        )
        kf1 = self.map.add_keyframe(
            frame.R, frame.t, frame.xy, frame.octave, frame.angle, frame.desc,
            frame.valid, cur_binding, frame.frame_id, frame.timestamp,
        )
        frame.point_ids = cur_binding

        # Initial global BA (reference: GlobalBundleAdjustemnt(20),
        # src/Tracking.cc:830) with KF0 fixed.
        self._initial_global_ba(kf0, kf1)
        self.map.refresh_point_stats()

        self.ref_kf = kf1
        self.last_kf_frame_id = frame.frame_id
        self.state = TrackingState.OK
        return True

    def _initial_global_ba(self, kf0: int, kf1: int, n_iters: int = 20) -> None:
        cam = self.config.camera
        problem = build_ba_problem(
            self.map, free_kfs=np.array([kf1]), fixed_kfs=np.array([kf0]),
            point_ids=np.where(self.map.pt_valid)[0],
            orb_cfg=self.config.orb,
        )
        out, result = ba.bundle_adjust_jit(
            problem.problem, cam.fx, cam.fy, cam.cx, cam.cy, cam.bf,
            n_iters=n_iters, point_chunk=512,
        )
        write_back_ba(self.map, problem, out, result)

    # ------------------------------------------------------------------
    # Stereo / RGB-D initialization
    # ------------------------------------------------------------------

    def _try_initialize_depth(self, frame: Frame) -> bool:
        """Oracle: Tracking::StereoInitialization (src/Tracking.cc:590-658):
        first frame with >= 500 features seeds the map directly from depth."""
        if frame.valid.sum() < 500:
            return False
        frame.set_pose(np.eye(3), np.zeros(3))
        cam = self.config.camera
        has_depth = (frame.depth > 0) & frame.valid
        feat = np.where(has_depth)[0]
        if feat.size < 100:
            return False
        z = frame.depth[feat].astype(np.float64)
        x = (frame.xy[feat, 0] - cam.cx) / cam.fx * z
        y = (frame.xy[feat, 1] - cam.cy) / cam.fy * z
        pts = np.stack([x, y, z], axis=-1)
        pt_ids = self.map.add_points(pts, first_kf=0)
        binding = np.full(frame.n, INVALID, np.int32)
        binding[feat] = pt_ids
        frame.point_ids = binding
        self.map.add_keyframe(
            frame.R, frame.t, frame.xy, frame.octave, frame.angle, frame.desc,
            frame.valid, binding, frame.frame_id, frame.timestamp,
            depth=frame.depth, ur=frame.ur,
        )
        self.map.refresh_point_stats()
        self.ref_kf = 0
        self.last_kf_frame_id = frame.frame_id
        self.state = TrackingState.OK
        return True

    # ------------------------------------------------------------------
    # Frame-to-frame tracking
    # ------------------------------------------------------------------

    def can_fuse_motion(self) -> bool:
        """Is the next frame eligible for the single-dispatch fused
        motion-tracking path (slam/jit_frontend.fused_motion_track)?"""
        return (
            self.state == TrackingState.OK
            and self.velocity is not None
            and self.last_frame is not None
            and self.config.sensor in ("monocular", "stereo", "rgbd")
            # Localization mode goes through the staged path: it spawns
            # temporal VO points before matching and drives the mbVO
            # ladder (src/Tracking.cc:396-447), which the fused graph
            # does not model.
            and not self.localization_only
            and int((self.last_frame.point_ids >= 0).sum()) >= 10
        )

    def fused_motion_frame(
        self, image, frame_id: int, timestamp: float,
        image_right=None, depth_image=None,
    ) -> Tuple[Frame, bool]:
        """Run extraction + motion-model matching + pose BA as ONE device
        dispatch and build the host Frame from its outputs. Returns
        (frame, motion_ok); pass motion_ok into track() so the staged
        motion stage is skipped. Must only be called when
        can_fuse_motion(). With image_right, the stereo graph (both
        extractions + epipolar depth + mixed mono/stereo pose BA) runs
        instead."""
        from orb_slam2_commit_tpu.slam import jit_frontend

        self._update_last_frame_pose()
        last = self.last_frame
        Rv, tv = self.velocity
        R_pred = Rv @ last.R
        t_pred = Rv @ last.t + tv
        bound = last.point_ids >= 0
        pt_ids = np.maximum(last.point_ids, 0)
        pt_pos = self.map.pt_pos[pt_ids]
        pt_ok = bound & self.map.pt_valid[pt_ids]

        # Packed-transfer route (see jit_frontend packed section): the
        # point-side inputs travel as ONE f32 matrix + the descriptor
        # table + ONE meta vector, and the result comes back the same
        # way — per-transfer latency dominates remote runtimes.
        m = pt_pos.shape[0]
        pt_f32 = np.empty((m, jit_frontend.IN_PT_COLS), np.float32)
        pt_f32[:, 0:3] = pt_pos
        pt_f32[:, 3] = last.octave
        pt_f32[:, 4] = last.angle
        pt_f32[:, 5] = pt_ok
        # z of the predicted camera center in the LAST frame's coords —
        # drives the stereo/RGB-D forward/backward octave rule
        # (src/ORBmatcher.cc:1522-1529).
        tz_rel = self._tz_rel(last, R_pred, t_pred)
        meta_in = np.empty(jit_frontend.IN_META_LEN, np.float32)
        meta_in[0:9] = np.asarray(R_pred).reshape(-1)
        meta_in[9:12] = t_pred
        meta_in[12] = tz_rel

        args = (jnp.asarray(pt_f32), jnp.asarray(last.desc),
                jnp.asarray(meta_in), self.config)
        if image_right is not None:
            meta, feat, desc = jit_frontend.fused_stereo_motion_track_packed_jit(
                jnp.asarray(image), jnp.asarray(image_right), *args,
            )
        elif depth_image is not None:
            meta, feat, desc = jit_frontend.fused_rgbd_motion_track_packed_jit(
                jnp.asarray(image),
                jnp.asarray(depth_image, jnp.float32), *args,
            )
        else:
            meta, feat, desc = jit_frontend.fused_motion_track_packed_jit(
                jnp.asarray(image), *args,
            )
        dev_feat, dev_desc = feat, desc
        meta = np.asarray(meta)
        feat = np.asarray(feat)
        frame = Frame(
            frame_id=frame_id,
            timestamp=timestamp,
            xy=feat[:, 0:2].astype(np.float64),
            xy_raw=feat[:, 2:4].astype(np.float64),
            response=feat[:, 4].copy(),
            angle=feat[:, 5].copy(),
            octave=feat[:, 6].astype(np.int32),
            valid=feat[:, 7] > 0.5,
            depth=feat[:, 8].astype(np.float32),
            ur=feat[:, 9].astype(np.float32),
            desc=np.asarray(desc),
            dev_feat=dev_feat,
            dev_desc=dev_desc,
        )
        n_matches = int(meta[12]) if np.isfinite(meta[12]) else 0
        n_in = int(meta[13]) if np.isfinite(meta[13]) else 0
        if n_matches < 20 or not np.all(np.isfinite(meta[0:12])):
            # Non-finite device pose (degenerate solve) = motion failure;
            # the staged ladder (ref-KF / reloc) takes over.
            return frame, False
        binding = feat[:, 10].astype(np.int32)
        pid = np.where(
            binding >= 0, last.point_ids[np.maximum(binding, 0)], INVALID
        ).astype(np.int32)
        # Unbind pose-BA outliers, exactly as the staged path's
        # _optimize_pose does (reference: src/Tracking.cc:1102-1119).
        inl = feat[:, 11] > 0.5
        frame.point_ids = np.where((pid >= 0) & ~inl, INVALID, pid).astype(np.int32)
        frame.set_pose(
            meta[0:9].reshape(3, 3).astype(np.float64),
            meta[9:12].astype(np.float64),
        )
        self.n_inliers = n_in
        return frame, n_in >= self.config.tracker.min_inliers_track

    def _spawn_temporal_vo_points(self) -> None:
        """Localization-only stereo/RGB-D: spawn one-frame "visual
        odometry" points from the last frame's depth for its unbound
        features, so motion-model tracking has structure where the loaded
        map is sparse (reference: Tracking::UpdateLastFrame,
        src/Tracking.cc:971-1047 — nearest-first, at least 100 or all
        closer than ThDepth)."""
        self._update_last_frame_pose()
        last = self.last_frame
        cam = self.config.camera
        if (
            not self.localization_only
            or self.config.sensor == "monocular"
            or last is None
            or last.R is None
        ):
            return
        close_th = cam.baseline * cam.th_depth
        unbound = last.valid & (last.point_ids < 0) & (last.depth > 0)
        feats = np.where(unbound)[0]
        if feats.size == 0:
            return
        order = feats[np.argsort(last.depth[feats])]
        z = last.depth[order]
        n_close = int((z < close_th).sum())
        take = order[: max(min(100, order.size), n_close)]
        if take.size == 0:
            return
        zt = last.depth[take].astype(np.float64)
        x = (last.xy[take, 0] - cam.cx) / cam.fx * zt
        y = (last.xy[take, 1] - cam.cy) / cam.fy * zt
        p_cam = np.stack([x, y, zt], -1)
        pw = (p_cam - last.t) @ last.R
        ids = self.map.add_points(pw, first_kf=max(self.ref_kf, 0))
        last.point_ids[take] = ids
        self._temporal_points = ids

    def _clear_temporal_vo_points(self, frame: Frame) -> None:
        """Delete this frame's temporal VO points (reference deletes
        mlpTemporalPoints at the end of every Track(),
        src/Tracking.cc:519-526). Temporal points are never observed by
        keyframes, so invalidating + unbinding from the two live frames is
        a full teardown; their slots are the newest allocations and
        localization mode allocates nothing else, so reclaim them."""
        ids = self._temporal_points
        if ids.size == 0:
            return
        self._temporal_points = np.zeros(0, np.int32)
        self.map.pt_valid[ids] = False
        for f in (self.last_frame, frame):
            if f is not None:
                f.point_ids[np.isin(f.point_ids, ids)] = INVALID
        lo, hi = int(ids.min()), int(ids.max())
        if hi == self.map.next_pt - 1 and ids.size == self.map.next_pt - lo:
            self.map.next_pt = lo

    @staticmethod
    def _tz_rel(last: Frame, R_pred: np.ndarray, t_pred: np.ndarray) -> float:
        """z of the predicted camera center expressed in the last frame's
        camera coords (reference tlc.z, src/ORBmatcher.cc:1502-1507)."""
        c_pred = -np.asarray(R_pred).T @ np.asarray(t_pred)
        return float((last.R @ c_pred + last.t)[2])

    def _track_with_motion_model(self, frame: Frame) -> bool:
        """Oracle: Tracking::TrackWithMotionModel (src/Tracking.cc:1049-1135)."""
        if self.velocity is None or self.last_frame is None:
            return False
        self._update_last_frame_pose()
        cam = self.config.camera
        Rv, tv = self.velocity
        R_pred = Rv @ self.last_frame.R
        t_pred = Rv @ self.last_frame.t + tv

        last = self.last_frame
        bound = last.point_ids >= 0
        if bound.sum() < 10:
            return False
        pt_ids = np.maximum(last.point_ids, 0)
        pt_pos = self.map.pt_pos[pt_ids]
        pt_ok = bound & self.map.pt_valid[pt_ids]

        tz_rel = self._tz_rel(last, R_pred, t_pred)
        for th in (self.config.tracker.search_radius_motion,
                   2 * self.config.tracker.search_radius_motion):
            m = matchers.match_projection_last_frame(
                jnp.asarray(pt_pos), jnp.asarray(last.desc),
                jnp.asarray(last.octave), jnp.asarray(last.angle),
                jnp.asarray(pt_ok),
                jnp.asarray(R_pred), jnp.asarray(t_pred),
                jnp.asarray(frame.xy), jnp.asarray(frame.desc),
                jnp.asarray(frame.angle), jnp.asarray(frame.octave),
                jnp.asarray(frame.valid),
                cam.fx, cam.fy, cam.cx, cam.cy,
                float(cam.width), float(cam.height), th=float(th),
                tz_rel=jnp.asarray(tz_rel),
                mono=self.config.sensor == "monocular",
                baseline=float(cam.baseline),
                n_levels=self.config.orb.n_levels,
                scale=self.config.orb.scale_factor,
            )
            idx = np.asarray(m.idx)
            n_matches = int((idx >= 0).sum())
            if n_matches >= 20:
                break
        if n_matches < 20:
            return False

        # Bind matched features to the last frame's points.
        binding = np.full(frame.n, INVALID, np.int32)
        rows = np.where(idx >= 0)[0]
        binding[idx[rows]] = last.point_ids[rows]
        frame.point_ids = binding

        R, t, inl, n_in = self._optimize_pose(frame, R_pred, t_pred)
        frame.set_pose(R, t)
        self.n_inliers = n_in
        if self.localization_only:
            # Persistent-map inliers vs temporal VO inliers: almost none of
            # the former means we are doing raw visual odometry
            # (reference: src/Tracking.cc:1113-1129, mbVO = nmatchesMap<10).
            b = frame.point_ids[frame.point_ids >= 0]
            n_map_in = (
                int((~np.isin(b, self._temporal_points)).sum()) if b.size else 0
            )
            self.vo_only = n_map_in < 10
            return n_in >= 20
        return n_in >= self.config.tracker.min_inliers_track

    def _track_reference_keyframe(self, frame: Frame) -> bool:
        """Oracle: Tracking::TrackReferenceKeyFrame (src/Tracking.cc:910-969),
        with brute-force+ratio matching standing in for SearchByBoW."""
        if self.ref_kf < 0:
            return False
        k = self.ref_kf
        kf_bound = self.map.kf_point_idx[k] >= 0
        pt_ids = np.maximum(self.map.kf_point_idx[k], 0)
        kf_ok = kf_bound & self.map.pt_valid[pt_ids]
        m = matchers.match_brute_force(
            jnp.asarray(self.map.kf_desc[k]), jnp.asarray(self.map.kf_angle[k]),
            jnp.asarray(kf_ok),
            jnp.asarray(frame.desc), jnp.asarray(frame.angle),
            jnp.asarray(frame.valid),
        )
        idx = np.asarray(m.idx)
        if (idx >= 0).sum() < 15:
            return False
        binding = np.full(frame.n, INVALID, np.int32)
        rows = np.where(idx >= 0)[0]
        binding[idx[rows]] = self.map.kf_point_idx[k][rows]
        frame.point_ids = binding

        R0 = self.last_frame.R if self.last_frame.R is not None else self.map.kf_pose_R[k]
        t0 = self.last_frame.t if self.last_frame.t is not None else self.map.kf_pose_t[k]
        R, t, inl, n_in = self._optimize_pose(frame, R0, t0)
        frame.set_pose(R, t)
        self.n_inliers = n_in
        return n_in >= self.config.tracker.min_inliers_track

    def _relocalize(self, frame: Frame) -> bool:
        """Relocalization: candidate keyframes -> descriptor matching ->
        EPnP RANSAC -> pose optimization (oracle: Tracking::Relocalization,
        src/Tracking.cc:1653-1884).

        Candidates come from the keyframe database when available (BoW
        place recognition), else the most recent keyframes.
        """
        cfg = self.config
        cam = cfg.camera
        if getattr(self, "kf_database", None) is not None:
            cand = self.kf_database.detect_relocalization_candidates(frame)
        else:
            cand = [k for k in range(self.map.next_kf) if self.map.kf_valid[k]][-10:]
        # Best candidates first (the DB returns ascending accumulated
        # score); cap the batch, padding to a power of two so repeated
        # lost frames reuse one compilation.
        cand = [int(k) for k in reversed(list(cand)) if self.map.kf_valid[k]]
        cand = cand[:MAX_RELOC_CANDIDATES]
        if not cand:
            return False
        C = len(cand)
        Cp = max(4, 1 << (C - 1).bit_length())

        # Phase A — ONE batched brute-force match dispatch over all
        # candidates (reference: per-candidate SearchByBoW host loop,
        # src/Tracking.cc:1713-1727).
        ck = np.asarray(cand)
        kf_bound = self.map.kf_point_idx[ck] >= 0                 # [C, N]
        pt_ids = np.maximum(self.map.kf_point_idx[ck], 0)
        kf_ok = kf_bound & self.map.pt_valid[pt_ids]
        n_kf = self.map.kf_desc.shape[1]       # map feature capacity
        desc_a = np.zeros((Cp, n_kf, 8), np.uint32)
        angle_a = np.zeros((Cp, n_kf), np.float32)
        valid_a = np.zeros((Cp, n_kf), bool)
        desc_a[:C] = self.map.kf_desc[ck]
        angle_a[:C] = self.map.kf_angle[ck]
        valid_a[:C] = kf_ok
        m = matchers.match_brute_force_many(
            jnp.asarray(desc_a), jnp.asarray(angle_a), jnp.asarray(valid_a),
            jnp.asarray(frame.desc), jnp.asarray(frame.angle),
            jnp.asarray(frame.valid),
        )
        idx_all = np.asarray(m.idx)                               # [Cp, N]

        # Phase B — per-candidate 2D-3D bindings (host, cheap) and ONE
        # batched EPnP RANSAC dispatch (src/Tracking.cc:1729-1762).
        bindings = np.full((Cp, frame.n), INVALID, np.int32)
        for c in range(C):
            rows = np.where(idx_all[c] >= 0)[0]
            bindings[c, idx_all[c][rows]] = self.map.kf_point_idx[ck[c]][rows]
        n_matches = (bindings >= 0).sum(axis=1)
        attempt = n_matches >= 15
        if not attempt.any():
            return False
        X = self.map.pt_pos[np.maximum(bindings, 0)]              # [Cp, N, 3]
        bound_masks = (bindings >= 0) & frame.valid[None, :] & attempt[:, None]
        sigma2 = np.asarray(cfg.orb.level_sigma2())[
            np.clip(frame.octave, 0, cfg.orb.n_levels - 1)
        ]
        self._rng_key, sub = jax.random.split(self._rng_key)
        keys = jax.random.split(sub, Cp)
        res = pnp.epnp_ransac_many_jit(
            keys, jnp.asarray(X), jnp.asarray(frame.xy),
            jnp.asarray(bound_masks), jnp.asarray(sigma2),
            cam.fx, cam.fy, cam.cx, cam.cy,
        )
        res_ok = np.asarray(res.ok)
        res_R = np.asarray(res.R)
        res_t = np.asarray(res.t)

        # Phase C — per-candidate refinement ladder, best-first; only
        # candidates whose RANSAC succeeded reach the (expensive) pose
        # optimizer (src/Tracking.cc:1764-1884).
        for c in range(C):
            k = cand[c]
            if not attempt[c] or not res_ok[c]:
                continue
            frame.point_ids = bindings[c].copy()
            R, t, inl, n_in = self._optimize_pose(
                frame, res_R[c], res_t[c]
            )
            if n_in < 10:
                continue

            def widen(th):
                """Project the candidate KF's not-yet-bound map points
                through the current pose estimate and bind matches."""
                kf_pts = np.unique(self.map.kf_point_idx[k])
                kf_pts = kf_pts[kf_pts >= 0]
                kf_pts = kf_pts[self.map.pt_valid[kf_pts]]
                bound_now = frame.point_ids[frame.point_ids >= 0]
                if bound_now.size:
                    kf_pts = kf_pts[~np.isin(kf_pts, bound_now)]
                self._project_and_bind(frame, kf_pts, th=th)

            if n_in < 50:
                # Stage 1 widening (reference: src/Tracking.cc:1814-1831):
                # the BoW matches give a coarse pose but too few inliers —
                # project the candidate KF's remaining map points with a
                # wide radius (th=10) and re-optimize.
                frame.set_pose(R, t)
                widen(10.0)
                R, t, inl, n_in = self._optimize_pose(frame, R, t)
                if 30 < n_in < 50:
                    # Stage 2 narrowed re-search (reference :1836-1860):
                    # the pose is now accurate — re-search in a tight
                    # window (th=3) to pull in the rest, final optimize.
                    frame.set_pose(R, t)
                    widen(3.0)
                    R, t, inl, n_in = self._optimize_pose(frame, R, t)
            if n_in >= 50:
                # Reference accept gate: nGood >= 50 (src/Tracking.cc:1864).
                frame.set_pose(R, t)
                self.n_inliers = n_in
                self.ref_kf = k
                self.last_reloc_frame_id = frame.frame_id
                return True
        return False

    # ------------------------------------------------------------------
    # Local map tracking
    # ------------------------------------------------------------------

    def _local_keyframes(self, frame: Frame) -> np.ndarray:
        """K1 = observers of the frame's points, plus top covisible
        neighbors, capped (oracle: UpdateLocalKeyFrames,
        src/Tracking.cc:1518-1651)."""
        bound = frame.point_ids[frame.point_ids >= 0]
        if bound.size == 0:
            return np.zeros(0, int)
        # Vectorized observer counting: mark the frame's points, then one
        # masked gather over the whole observation table.
        mark = np.zeros(self.map.cfg.max_points, bool)
        mark[bound] = True
        kpi = self.map.kf_point_idx
        hit = mark[np.maximum(kpi, 0)] & (kpi >= 0)
        counts = hit.sum(axis=1) * self.map.kf_valid
        k1 = np.where(counts > 0)[0]
        k1 = k1[np.argsort(-counts[k1], kind="stable")]
        cap = self.config.tracker.max_local_keyframes
        local = list(k1[:cap])
        seen = set(local)
        for k in list(local)[:10]:
            if len(local) >= cap:
                break
            k = int(k)
            # Top covisible neighbors, then spanning-tree children and
            # parent (reference :1584-1621) — the tree links are the
            # low-covisibility escape hatch: right after relocalization
            # or under fast rotation the covisible set alone starves.
            extras = [int(n) for n in self.map.covisible_keyframes(k, 10)]
            parent_col = self.map.kf_parent[: self.map.next_kf]
            children = np.where(
                (parent_col == k) & self.map.kf_valid[: self.map.next_kf]
            )[0]
            extras.extend(int(c) for c in children)
            parent = int(self.map.kf_parent[k])
            if parent >= 0 and self.map.kf_valid[parent]:
                extras.append(parent)
            for n in extras:
                if n not in seen:
                    local.append(n)
                    seen.add(n)
                if len(local) >= cap:
                    break
        if k1.size > 0:
            self.ref_kf = int(k1[0])
        return np.asarray(local, int)

    def _project_and_bind(
        self, frame: Frame, cand: np.ndarray, th: float
    ) -> np.ndarray:
        """Frustum-check + projection-match candidate map points into the
        frame's unbound features and bind the matches (reference:
        SearchLocalPoints / SearchByProjection, src/Tracking.cc:1403-1468,
        src/ORBmatcher.cc:46-142). Returns the visibility mask over cand."""
        cam = self.config.camera
        M = self.config.tracker.max_local_points
        cand = cand[:M]
        m_c = cand.size
        pos = np.zeros((M, 3))
        normal = np.zeros((M, 3))
        dmin = np.zeros(M)
        dmax = np.zeros(M)
        desc = np.zeros((M, 8), np.uint32)
        pvalid = np.zeros(M, bool)
        pos[:m_c] = self.map.pt_pos[cand]
        normal[:m_c] = self.map.pt_normal[cand]
        dmin[:m_c] = self.map.pt_min_dist[cand]
        dmax[:m_c] = self.map.pt_max_dist[cand]
        desc[:m_c] = self.map.pt_desc[cand]
        pvalid[:m_c] = True

        info = matchers.frustum_check(
            jnp.asarray(pos), jnp.asarray(normal), jnp.asarray(dmin),
            jnp.asarray(dmax), jnp.asarray(pvalid),
            jnp.asarray(frame.R), jnp.asarray(frame.t),
            cam.fx, cam.fy, cam.cx, cam.cy,
            float(cam.width), float(cam.height),
            n_levels=self.config.orb.n_levels,
            scale=self.config.orb.scale_factor,
        )
        feat_taken = frame.point_ids >= 0
        m = matchers.match_local_map(
            info, jnp.asarray(desc),
            jnp.asarray(frame.xy), jnp.asarray(frame.desc),
            jnp.asarray(frame.octave), jnp.asarray(frame.valid),
            jnp.asarray(feat_taken), th=float(th),
            n_levels=self.config.orb.n_levels,
            scale=self.config.orb.scale_factor,
        )
        idx = np.asarray(m.idx)
        rows = np.where(idx >= 0)[0]
        rows = rows[rows < m_c]
        frame.point_ids[idx[rows]] = cand[rows]
        return np.asarray(info.visible)[:m_c]

    def _track_local_map(self, frame: Frame) -> bool:
        """Oracle: TrackLocalMap + SearchLocalPoints
        (src/Tracking.cc:1137-1202, :1403-1468)."""
        cam = self.config.camera
        cap = self.config.tracker.max_local_points
        local_kfs = self._local_keyframes(frame)
        if local_kfs.size == 0:
            return False

        pts = np.unique(self.map.kf_point_idx[local_kfs])
        pts = pts[pts >= 0]
        pts = pts[self.map.pt_valid[pts]]
        already = set(frame.point_ids[frame.point_ids >= 0].tolist())
        new_mask = ~np.isin(pts, list(already)) if already else np.ones(pts.size, bool)
        cand = pts[new_mask][:cap]

        # Wider search shortly after relocalization (reference:
        # src/Tracking.cc:1460-1464).
        th = self.config.tracker.search_radius_local_map
        if frame.frame_id < self.last_reloc_frame_id + 2:
            th = 5.0

        if frame.dev_feat is not None:
            # Single-dispatch device portion (frustum + projection match
            # + pose BA) on the frontend's device-resident feature
            # buffers — same math as the staged core below, 1 dispatch /
            # 4 uploads / 3 fetches instead of 3 dispatches / ~20
            # transfers (slam/jit_frontend.fused_local_map_track_jit).
            n_in = self._fused_local_map_core(frame, cand, th)
        else:
            visible = self._project_and_bind(frame, cand, th)
            # Visibility counter (reference: IncreaseVisible,
            # src/Tracking.cc:1420-1437).
            self.map.pt_visible[cand[visible]] += 1

            R, t, inl, n_in = self._optimize_pose(frame, frame.R, frame.t)
            frame.set_pose(R, t)
        self.n_inliers = n_in
        # Found counter for culling (reference: IncreaseFound,
        # src/Tracking.cc:1175-1183).
        found = frame.point_ids[frame.point_ids >= 0]
        self.map.pt_found[found] += 1

        min_in = self.config.tracker.min_inliers_local_map
        if frame.frame_id < self.last_reloc_frame_id + cam.fps:
            min_in = self.config.tracker.min_inliers_local_map_recent
        return n_in >= min_in

    def _fused_local_map_core(self, frame: Frame, cand: np.ndarray,
                              th: float) -> int:
        """Device portion of TrackLocalMap as one packed-transfer graph;
        host bookkeeping (bind matches, unbind outliers, counters)
        mirrors _project_and_bind + _optimize_pose exactly."""
        from orb_slam2_commit_tpu.slam import jit_frontend

        M = self.config.tracker.max_local_points
        cand = cand[:M]
        m_c = cand.size
        cand_f32 = np.zeros((M, jit_frontend.LM_CAND_COLS), np.float32)
        cand_f32[:m_c, 0:3] = self.map.pt_pos[cand]
        cand_f32[:m_c, 3:6] = self.map.pt_normal[cand]
        cand_f32[:m_c, 6] = self.map.pt_min_dist[cand]
        cand_f32[:m_c, 7] = self.map.pt_max_dist[cand]
        cand_f32[:m_c, 8] = 1.0
        cand_desc = np.zeros((M, 8), np.uint32)
        cand_desc[:m_c] = self.map.pt_desc[cand]

        bound = frame.point_ids >= 0
        pid = np.maximum(frame.point_ids, 0)
        feat_state = np.zeros(
            (frame.n, jit_frontend.LM_FEAT_COLS), np.float32
        )
        feat_state[:, 0:3] = self.map.pt_pos[pid]
        feat_state[:, 3] = bound

        meta_in = np.empty(jit_frontend.LM_META_LEN, np.float32)
        meta_in[0:9] = frame.R.reshape(-1)
        meta_in[9:12] = frame.t
        meta_in[12] = th

        meta, perfeat, visible = jit_frontend.fused_local_map_track_jit(
            frame.dev_feat, frame.dev_desc,
            jnp.asarray(feat_state), jnp.asarray(cand_f32),
            jnp.asarray(cand_desc), jnp.asarray(meta_in), self.config,
        )
        meta = np.asarray(meta)
        perfeat = np.asarray(perfeat)
        vis = np.asarray(visible) > 0.5

        self.map.pt_visible[cand[vis[:m_c]]] += 1
        binding = perfeat[:, 0].astype(np.int32)
        rows = np.where((binding >= 0) & (binding < m_c))[0]
        frame.point_ids[rows] = cand[binding[rows]]
        # Unbind pose-BA outliers (mirror of _optimize_pose).
        inl = perfeat[:, 1] > 0.5
        b2 = frame.point_ids >= 0
        frame.point_ids = np.where(b2 & ~inl, INVALID, frame.point_ids)
        frame.set_pose(
            meta[0:9].reshape(3, 3).astype(np.float64),
            meta[9:12].astype(np.float64),
        )
        return int(meta[12])

    # ------------------------------------------------------------------
    # Keyframe decision
    # ------------------------------------------------------------------

    def need_new_keyframe(self, frame: Frame) -> bool:
        """Oracle: Tracking::NeedNewKeyFrame (src/Tracking.cc:1205-1309),
        including the mapper-idle gate (:1240-1295): when the mapping
        worker is busy, interrupt its BA and only insert if the backlog
        is small (stereo/RGB-D, queue<3) — monocular refuses outright."""
        if self.localization_only:
            return False
        # Min observations for a "tracked" reference point. The reference
        # uses 3 once nKFs > 2 (src/Tracking.cc:1231-1234); we hold it at 2
        # slightly longer — with exactly 3 keyframes an obs>=3 point must be
        # seen by ALL of them, which deadlocks insertion on slow sequences.
        n_kfs = self.map.n_keyframes()
        min_obs = 3 if n_kfs > 3 else 2
        obs_counts = self.map.observation_count()
        ref_pts = self.map.kf_point_idx[self.ref_kf]
        ref_pts = ref_pts[ref_pts >= 0]
        n_ref_matches = int(
            (obs_counts[ref_pts] >= min_obs).sum()
        ) if ref_pts.size else 0

        # Stereo/RGB-D: many close-depth features not yet in the map means
        # we should insert even if inlier ratios look fine (reference
        # bNeedToInsertClose + c1c, src/Tracking.cc:1236-1272).
        close_needed = False
        if self.config.sensor != "monocular":
            cam = self.config.camera
            close_th = cam.baseline * cam.th_depth
            close = frame.valid & (frame.depth > 0) & (frame.depth < close_th)
            n_tracked_close = int((close & (frame.point_ids >= 0)).sum())
            n_untracked_close = int((close & (frame.point_ids < 0)).sum())
            close_needed = (n_tracked_close < 100) and (n_untracked_close > 70)

        c1a = frame.frame_id >= self.last_kf_frame_id + self.config.tracker.kf_max_frames
        c1b = frame.frame_id >= self.last_kf_frame_id + self.config.tracker.kf_min_frames
        c1c = self.config.sensor != "monocular" and (
            self.n_inliers < n_ref_matches * 0.25 or close_needed
        )
        ratio = self.config.tracker.kf_ref_ratio_mono
        if self.config.sensor != "monocular":
            ratio = self.config.tracker.kf_ref_ratio_stereo
        if n_kfs < 3:
            ratio = 0.4 if self.config.sensor != "monocular" else 0.9
        c2 = (
            (self.n_inliers < n_ref_matches * ratio) or close_needed
        ) and self.n_inliers > 15

        # Baseline/view-angle trigger (beyond reference; rationale at
        # TrackerConfig.kf_baseline_depth_ratio).
        c_geom = False
        tcfg = self.config.tracker
        if (
            (tcfg.kf_baseline_depth_ratio > 0 or tcfg.kf_view_angle_deg > 0)
            and self.n_inliers > 15
            and frame.frame_id > self.last_kf_frame_id
            and frame.R is not None
            and self.map.kf_valid[self.ref_kf]
        ):
            k = int(self.ref_kf)
            c_cur = -frame.R.T @ frame.t
            c_ref = -self.map.kf_pose_R[k].T @ self.map.kf_pose_t[k]
            if tcfg.kf_baseline_depth_ratio > 0:
                bound = frame.point_ids[frame.point_ids >= 0]
                if bound.size >= 10:
                    z = (self.map.pt_pos[bound] @ frame.R[2]) + frame.t[2]
                    med_depth = float(np.median(z[z > 0])) if (z > 0).any() else 0.0
                    if med_depth > 0:
                        baseline = float(np.linalg.norm(c_cur - c_ref))
                        c_geom = baseline > tcfg.kf_baseline_depth_ratio * med_depth
            if not c_geom and tcfg.kf_view_angle_deg > 0:
                R_rel = frame.R @ self.map.kf_pose_R[k].T
                ang = np.degrees(
                    np.arccos(np.clip((np.trace(R_rel) - 1.0) / 2.0, -1.0, 1.0))
                )
                c_geom = ang > tcfg.kf_view_angle_deg

        want = bool(((c1a or c1b or c1c) and c2) or c_geom)
        if not want:
            return False
        worker = self.mapping_worker
        if worker is None or worker.accept_keyframes():
            return True
        # Mapper busy: abort its local BA so it frees up sooner, and only
        # queue when the backlog is shallow (reference src/Tracking.cc:
        # 1281-1293 — stereo/RGB-D insert if <3 queued, mono never).
        worker.interrupt_ba()
        if self.config.sensor != "monocular" and worker.queued() < 3:
            return True
        return False

    # ------------------------------------------------------------------
    # Main entry
    # ------------------------------------------------------------------

    def track(
        self, frame: Frame, motion_ok: Optional[bool] = None
    ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
        """Process one frame; returns (R, t) = Tcw or None while lost.
        Oracle: Tracking::Track (src/Tracking.cc:275-587).

        motion_ok: outcome of an already-run fused motion stage
        (fused_motion_frame); None runs the staged motion stage here."""
        if self.state == TrackingState.NO_IMAGES_YET:
            self.state = TrackingState.NOT_INITIALIZED

        if self.state == TrackingState.NOT_INITIALIZED:
            if self.config.sensor == "monocular":
                self._try_initialize_mono(frame)
            else:
                self._try_initialize_depth(frame)
            self.last_frame = frame
            if self.state == TrackingState.OK:
                self._record_trajectory(frame, lost=False)
                return frame.R, frame.t
            return None

        import contextlib

        def timed(stage):
            if self.profiler is None:
                return contextlib.nullcontext()
            return self.profiler.timed(stage)

        ok = False
        if self.state == TrackingState.OK:
            if motion_ok is not None:
                ok = motion_ok
                if not ok:
                    # Same ladder as the staged path (reference
                    # src/Tracking.cc:359-368): a failed motion stage falls
                    # back to BoW tracking against the reference keyframe.
                    with timed("track_ref_kf"):
                        ok = self._track_reference_keyframe(frame)
            elif self.localization_only and self.vo_only:
                # Visual-odometry mode: ride the motion model on temporal
                # points AND attempt relocalization; a successful reloc
                # wins (reference: src/Tracking.cc:396-447).
                self._spawn_temporal_vo_points()
                ok_mm = self._track_with_motion_model(frame)
                pose_mm = (frame.R, frame.t) if ok_mm else None
                ids_mm = frame.point_ids.copy()
                ok_reloc = self._relocalize(frame)
                if ok_reloc:
                    self.vo_only = False
                    ok = True
                elif ok_mm:
                    frame.set_pose(*pose_mm)
                    frame.point_ids = ids_mm
                    ok = True
            else:
                self._spawn_temporal_vo_points()
                with timed("track_motion"):
                    ok = self._track_with_motion_model(frame)
                if not ok:
                    with timed("track_ref_kf"):
                        ok = self._track_reference_keyframe(frame)
        else:  # LOST
            with timed("track_reloc"):
                ok = self._relocalize(frame)

        if ok and not (self.localization_only and self.vo_only):
            with timed("track_local_map"):
                ok = self._track_local_map(frame)

        if ok:
            self.state = TrackingState.OK
            # Motion model update (reference: src/Tracking.cc:477-487).
            if self.last_frame is not None and self.last_frame.R is not None:
                R_lv = frame.R @ self.last_frame.R.T
                t_lv = frame.t - R_lv @ self.last_frame.t
                self.velocity = (R_lv, t_lv)
        else:
            self.state = TrackingState.LOST
            self.velocity = None
            # Lost soon after initialization with a tiny map: ask the
            # System for a full reset rather than trying to relocalize
            # against <=5 keyframes (reference: src/Tracking.cc:540-552).
            if self.map.n_keyframes() <= 5 and not self.localization_only:
                self.request_reset = True

        self._record_trajectory(frame, lost=not ok)
        self._clear_temporal_vo_points(frame)
        self.last_frame = frame
        return (frame.R, frame.t) if ok else None

    def _record_trajectory(self, frame: Frame, lost: bool) -> None:
        if lost or frame.R is None or self.ref_kf < 0:
            # Reference duplicates the last entry when lost
            # (src/Tracking.cc:575-585).
            if self.trajectory:
                e = self.trajectory[-1]
                self.trajectory.append(
                    TrajectoryEntry(e.ref_kf, e.R_rel, e.t_rel, frame.timestamp, True)
                )
                frame.anchor = self.trajectory[-1]
            return
        Rr = self.map.kf_pose_R[self.ref_kf]
        tr = self.map.kf_pose_t[self.ref_kf]
        R_rel = frame.R @ Rr.T
        t_rel = frame.t - R_rel @ tr
        self.trajectory.append(
            TrajectoryEntry(self.ref_kf, R_rel, t_rel, frame.timestamp, False)
        )
        frame.anchor = self.trajectory[-1]

    def bind_keyframe_anchor(self, frame: Frame, kf: int) -> None:
        """Re-reference this frame's trajectory entry to the keyframe just
        created FROM it. The reference runs CreateNewKeyFrame before the
        relative-pose bookkeeping (src/Tracking.cc:554-585), so the
        KF-spawning frame's stored relative pose is to its OWN keyframe —
        local BA then moves frame and keyframe together."""
        if not self.config.tracker.reanchor_last_frame:
            return
        if not self.trajectory or self.trajectory[-1].lost or frame.R is None:
            return
        Rr = self.map.kf_pose_R[kf]
        tr = self.map.kf_pose_t[kf]
        R_rel = frame.R @ Rr.T
        t_rel = frame.t - R_rel @ tr
        e = TrajectoryEntry(kf, R_rel, t_rel, frame.timestamp, False)
        self.trajectory[-1] = e
        frame.anchor = e

    def _update_last_frame_pose(self) -> None:
        """Re-anchor the last frame's pose through its reference keyframe:
        Tcw_last = Tlr * Tcw_ref(NOW) (oracle: Tracking::UpdateLastFrame
        "Update pose according to reference keyframe",
        src/Tracking.cc:971-980). Without this, local/global BA and loop
        corrections that move the map leave the motion-model prediction
        anchored to the PRE-correction world — measured on synthetic runs
        as an inlier collapse on the first frames after every local BA.

        Walks cull-time-frozen Tcp chains when the reference keyframe was
        culled (same resolution as trajectory export, src/System.cc:376-380).
        """
        if not self.config.tracker.reanchor_last_frame:
            return
        last = self.last_frame
        if last is None or last.R is None:
            return
        e = last.anchor
        if e is None:
            return
        k, R_rel, t_rel = e.ref_kf, e.R_rel, e.t_rel
        hops = 0
        while k >= 0 and not self.map.kf_valid[k] and hops < 64:
            parent = int(self.map.kf_parent[k])
            if parent < 0:
                return
            R_kp = self.map.kf_tcp_R[k]
            t_kp = self.map.kf_tcp_t[k]
            t_rel = R_rel @ t_kp + t_rel
            R_rel = R_rel @ R_kp
            k = parent
            hops += 1
        if k < 0 or not self.map.kf_valid[k]:
            return
        Rk = self.map.kf_pose_R[k]
        tk = self.map.kf_pose_t[k]
        R_new = R_rel @ Rk
        t_new = R_rel @ tk + t_rel
        last.set_pose(R_new, t_new)


# ---------------------------------------------------------------------------
# BA problem assembly from MapState (shared by tracker init & local mapping)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class AssembledBA:
    problem: ba.BAProblem
    kf_ids: np.ndarray       # [K] map keyframe id per problem camera
    point_ids: np.ndarray    # [P] map point id per problem point
    obs_kf: np.ndarray       # [O] map keyframe id per observation
    obs_feat: np.ndarray     # [O] feature index per observation


def _round_up(n: int, m: int) -> int:
    return max(((n + m - 1) // m) * m, m)


def _round_up_pow2(n: int, floor: int) -> int:
    """Next power of two >= max(n, floor). Coarse shape buckets: a
    growing map revisits O(log) executables instead of O(linear) — each
    new bucket is a minutes-long remote compile on the tunneled TPU
    (CLAUDE.md TPU notes), so fewer/coarser buckets win even though the
    padded (masked) rows cost a little extra device compute."""
    v = max(int(n), int(floor))
    return 1 << (v - 1).bit_length()


def build_ba_problem(
    map_state: MapState,
    free_kfs: np.ndarray,
    fixed_kfs: np.ndarray,
    point_ids: np.ndarray,
    orb_cfg,
) -> AssembledBA:
    """Pack a BA problem from map arrays (oracle: the problem construction
    in Optimizer::LocalBundleAdjustment, src/Optimizer.cc:596-736).

    All shapes are padded to coarse buckets (cameras -> multiple of 8,
    points -> 512, observations -> 2048) so repeated calls hit the same XLA
    compilation. Padded cameras are fixed, padded points/observations are
    masked invalid.
    """
    kf_ids = np.concatenate([free_kfs, fixed_kfs]).astype(int)
    K_real = kf_ids.size
    P_real = point_ids.size
    pt_lookup = np.full(map_state.cfg.max_points, -1, np.int64)
    pt_lookup[point_ids] = np.arange(P_real)

    # Vectorized observation gathering over the keyframe block.
    rows = map_state.kf_point_idx[kf_ids]                  # [K, N]
    local_pt = pt_lookup[np.maximum(rows, 0)]
    sel = (rows >= 0) & (local_pt >= 0)
    ci_grid = np.broadcast_to(
        np.arange(K_real)[:, None], rows.shape
    )
    feat_grid = np.broadcast_to(
        np.arange(map_state.n_feat)[None, :], rows.shape
    )
    cam_idx = ci_grid[sel]
    obs_feat = feat_grid[sel]
    obs_kf = np.broadcast_to(kf_ids[:, None], rows.shape)[sel]
    pt_idx = local_pt[sel]
    uv = map_state.kf_xy[obs_kf, obs_feat]
    ur = map_state.kf_ur[obs_kf, obs_feat]
    sigma2 = np.asarray(orb_cfg.level_sigma2())
    octv = np.clip(map_state.kf_octave[obs_kf, obs_feat], 0, sigma2.size - 1)
    is_st = ur >= 0
    uvr = np.concatenate([uv, np.where(is_st, ur, 0.0)[:, None]], axis=1)
    inv_s2 = 1.0 / sigma2[octv]

    O_real = cam_idx.size
    K = _round_up_pow2(K_real, 8)
    P = _round_up_pow2(P_real, 512)
    O = _round_up_pow2(O_real, 2048)

    def pad(a, n, fill=0):
        out = np.full((n,) + a.shape[1:], fill, a.dtype)
        out[: a.shape[0]] = a
        return out

    obs = BAObservations(
        cam_idx=jnp.asarray(pad(cam_idx.astype(np.int32), O)),
        pt_idx=jnp.asarray(pad(pt_idx.astype(np.int32), O)),
        uvr=jnp.asarray(pad(uvr.astype(np.float64), O)),
        inv_sigma2=jnp.asarray(pad(inv_s2, O)),
        is_stereo=jnp.asarray(pad(is_st, O)),
        valid=jnp.asarray(pad(np.ones(O_real, bool), O)),
    )
    fixed = np.ones(K, bool)
    fixed[:free_kfs.size] = False
    fixed[K_real:] = True
    R_pad = np.tile(np.eye(3), (K, 1, 1))
    R_pad[:K_real] = map_state.kf_pose_R[kf_ids]
    t_pad = np.zeros((K, 3))
    t_pad[:K_real] = map_state.kf_pose_t[kf_ids]
    pts_pad = np.zeros((P, 3))
    pts_pad[:P_real] = map_state.pt_pos[point_ids]
    problem = ba.BAProblem(
        R=jnp.asarray(R_pad),
        t=jnp.asarray(t_pad),
        fixed=jnp.asarray(fixed),
        points=jnp.asarray(pts_pad),
        point_valid=jnp.asarray(pad(np.ones(P_real, bool), P)),
        obs=obs,
    )
    return AssembledBA(
        problem=problem,
        kf_ids=kf_ids,
        point_ids=np.asarray(point_ids, int),
        obs_kf=obs_kf.astype(int),
        obs_feat=obs_feat.astype(int),
    )


def write_back_ba(
    map_state: MapState,
    assembled: AssembledBA,
    out_problem: ba.BAProblem,
    result: ba.BAResult,
    erase_outliers: bool = True,
) -> None:
    """Write optimized poses/points back and erase outlier observations
    (oracle: src/Optimizer.cc:800-883)."""
    fixed = np.asarray(out_problem.fixed)
    R = np.asarray(out_problem.R)
    t = np.asarray(out_problem.t)
    for ci, k in enumerate(assembled.kf_ids):
        if not fixed[ci]:
            # Float32 exp-retraction products leave ~1e-7 skew per solve;
            # project back to SO(3) so chained pose compositions stay
            # valid (see frame.orthonormalize_rotation).
            map_state.kf_pose_R[k] = orthonormalize_rotation(R[ci])
            map_state.kf_pose_t[k] = t[ci]
    n_pts = assembled.point_ids.size
    map_state.pt_pos[assembled.point_ids] = np.asarray(out_problem.points)[:n_pts]

    if erase_outliers:
        n_obs = assembled.obs_kf.size
        inlier = np.asarray(result.inlier)[:n_obs]
        bad = np.where(~inlier)[0]
        touched = set()
        for o in bad:
            k = assembled.obs_kf[o]
            f = assembled.obs_feat[o]
            if map_state.kf_point_idx[k, f] >= 0:
                map_state.kf_point_idx[k, f] = INVALID
                touched.add(int(k))
        for k in touched:
            map_state.update_covisibility(k)
