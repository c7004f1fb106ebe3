"""Fully-jitted tracking forward step (the per-frame hot path as ONE graph).

Composes the per-frame pipeline — ORB extraction -> map-point projection
matching -> pose-only BA — into a single jittable function, so XLA fuses
across stage boundaries and the host sees one dispatch per frame. This is
the TPU-native answer to the reference's Tracking::Track hot path
(src/Tracking.cc:275-587, SURVEY.md §3.2).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from orb_slam2_commit_tpu.ops import extractor as ext
from orb_slam2_commit_tpu.ops import matching
from orb_slam2_commit_tpu.optim import pose_opt
from orb_slam2_commit_tpu.optim.residuals import BAObservations
from orb_slam2_commit_tpu.slam import matchers
from orb_slam2_commit_tpu.utils.config import SLAMConfig


class TrackStepResult(NamedTuple):
    R: jnp.ndarray          # [3, 3] optimized Tcw rotation
    t: jnp.ndarray          # [3]
    n_matches: jnp.ndarray
    n_inliers: jnp.ndarray
    feat_xy: jnp.ndarray    # [N, 2] extracted keypoints (diagnostics)


def tracking_forward_step(
    image: jnp.ndarray,         # [H, W] float32 grayscale
    pt_pos: jnp.ndarray,        # [M, 3] local map points (world)
    pt_desc: jnp.ndarray,       # [M, 8] uint32
    pt_octave: jnp.ndarray,     # [M] source octave for search radii
    pt_angle: jnp.ndarray,      # [M]
    pt_valid: jnp.ndarray,      # [M]
    R_pred: jnp.ndarray,        # [3, 3] motion-model pose prediction
    t_pred: jnp.ndarray,        # [3]
    config: SLAMConfig,
) -> TrackStepResult:
    cam = config.camera
    feats = ext.extract_features(image, config.orb, cam.height, cam.width)

    m = matchers.match_projection_last_frame.__wrapped__(
        pt_pos, pt_desc, pt_octave, pt_angle, pt_valid,
        R_pred, t_pred,
        feats.xy, feats.desc, feats.angle, feats.octave, feats.valid,
        cam.fx, cam.fy, cam.cx, cam.cy,
        float(cam.width), float(cam.height),
        th=15.0,
        n_levels=config.orb.n_levels,
        scale=config.orb.scale_factor,
    )

    # Invert point->feature matches into per-feature bindings.
    n_feat = feats.xy.shape[0]
    safe_idx = jnp.maximum(m.idx, 0)
    binding = jnp.full((n_feat,), -1, jnp.int32)
    binding = binding.at[safe_idx].set(
        jnp.where(
            m.idx >= 0,
            jnp.arange(m.idx.shape[0], dtype=jnp.int32),
            -1,
        )
    )
    bound = binding >= 0
    pts_per_feat = pt_pos[jnp.maximum(binding, 0)]

    sigma2 = jnp.asarray(config.orb.level_sigma2())
    inv_sigma2 = 1.0 / sigma2[jnp.clip(feats.octave, 0, config.orb.n_levels - 1)]
    obs = BAObservations(
        cam_idx=jnp.zeros(n_feat, jnp.int32),
        pt_idx=jnp.arange(n_feat, dtype=jnp.int32),
        uvr=jnp.concatenate([feats.xy, jnp.zeros((n_feat, 1))], axis=1),
        inv_sigma2=inv_sigma2,
        is_stereo=jnp.zeros(n_feat, bool),
        valid=bound & feats.valid,
    )
    res = pose_opt.pose_optimization(
        R_pred, t_pred, pts_per_feat, obs,
        cam.fx, cam.fy, cam.cx, cam.cy, cam.bf,
    )
    return TrackStepResult(
        R=res.R,
        t=res.t,
        n_matches=jnp.sum(bound),
        n_inliers=res.n_inliers,
        feat_xy=feats.xy,
    )


@functools.partial(jax.jit, static_argnames=("config",))
def tracking_forward_step_jit(
    image, pt_pos, pt_desc, pt_octave, pt_angle, pt_valid, R_pred, t_pred,
    config: SLAMConfig,
):
    return tracking_forward_step(
        image, pt_pos, pt_desc, pt_octave, pt_angle, pt_valid,
        R_pred, t_pred, config
    )


class FusedMotionResult(NamedTuple):
    """Everything the host Tracker needs from one fused per-frame dispatch."""

    R: jnp.ndarray          # [3, 3] optimized Tcw rotation
    t: jnp.ndarray          # [3]
    n_matches: jnp.ndarray  # scalar int32 (at the accepted search radius)
    n_inliers: jnp.ndarray
    binding: jnp.ndarray    # [N] int32 — row into the PASSED point arrays, -1 none
    inliers: jnp.ndarray    # [N] bool (pose-opt chi2 classification)
    # Extraction outputs (the host builds its Frame from these):
    xy_und: jnp.ndarray     # [N, 2] undistorted
    xy_raw: jnp.ndarray     # [N, 2]
    response: jnp.ndarray
    angle: jnp.ndarray
    octave: jnp.ndarray
    desc: jnp.ndarray
    valid: jnp.ndarray
    depth: jnp.ndarray      # [N] stereo depth (-1 mono / no match)
    ur: jnp.ndarray         # [N] right-image u (-1 mono / no match)


def _fused_match_and_pose(
    feats, xy_und, ur, pt_pos, pt_desc, pt_octave, pt_angle, pt_valid,
    R_pred, t_pred, config: SLAMConfig, tz_rel=0.0,
):
    """Shared tail of the fused motion-tracking graphs: projective match
    against the last frame's points with the widen-on-failure retry
    (src/Tracking.cc:1090-1092), match inversion, pose-only BA (stereo
    observations use the (u, v, ur) residual when ur >= 0, mirroring the
    mixed mono/stereo edges of src/Optimizer.cc:330-435)."""
    cam = config.camera
    th0 = float(config.tracker.search_radius_motion)

    def run_match(th):
        m = matchers.match_projection_last_frame.__wrapped__(
            pt_pos, pt_desc, pt_octave, pt_angle, pt_valid,
            R_pred, t_pred,
            xy_und, feats.desc, feats.angle, feats.octave, feats.valid,
            cam.fx, cam.fy, cam.cx, cam.cy,
            float(cam.width), float(cam.height),
            th=th,
            tz_rel=tz_rel,
            mono=config.sensor == "monocular",
            baseline=float(cam.baseline),
            n_levels=config.orb.n_levels,
            scale=config.orb.scale_factor,
        )
        return m.idx

    idx1 = run_match(th0)
    n1 = jnp.sum(idx1 >= 0)
    idx = jax.lax.cond(n1 >= 20, lambda: idx1, lambda: run_match(2.0 * th0))
    n_matches = jnp.sum(idx >= 0)

    # Invert point->feature matches into per-feature bindings.
    n_feat = feats.xy.shape[0]
    safe_idx = jnp.maximum(idx, 0)
    binding = jnp.full((n_feat,), -1, jnp.int32)
    binding = binding.at[safe_idx].set(
        jnp.where(
            idx >= 0,
            jnp.arange(idx.shape[0], dtype=jnp.int32),
            -1,
        )
    )
    bound = binding >= 0
    pts_per_feat = pt_pos[jnp.maximum(binding, 0)]

    sigma2 = jnp.asarray(config.orb.level_sigma2())
    inv_sigma2 = 1.0 / sigma2[jnp.clip(feats.octave, 0, config.orb.n_levels - 1)]
    has_ur = ur >= 0
    obs = BAObservations(
        cam_idx=jnp.zeros(n_feat, jnp.int32),
        pt_idx=jnp.arange(n_feat, dtype=jnp.int32),
        uvr=jnp.concatenate(
            [xy_und, jnp.where(has_ur, ur, 0.0)[:, None]], axis=1
        ),
        inv_sigma2=inv_sigma2,
        is_stereo=has_ur & bound,
        valid=bound & feats.valid,
    )
    res = pose_opt.pose_optimization(
        R_pred, t_pred, pts_per_feat, obs,
        cam.fx, cam.fy, cam.cx, cam.cy, cam.bf,
    )
    return res, binding, n_matches


def fused_motion_track(
    image: jnp.ndarray,
    pt_pos: jnp.ndarray,        # [M, 3] last frame's bound points (world)
    pt_desc: jnp.ndarray,       # [M, 8]
    pt_octave: jnp.ndarray,     # [M]
    pt_angle: jnp.ndarray,      # [M]
    pt_valid: jnp.ndarray,      # [M]
    R_pred: jnp.ndarray,
    t_pred: jnp.ndarray,
    config: SLAMConfig,
) -> FusedMotionResult:
    """The WHOLE motion-model tracking stage as one graph: extraction,
    undistortion, projective matching with the reference's widen-on-failure
    retry (src/Tracking.cc:1090-1092: fewer than 20 matches -> search again
    at twice the radius), match inversion and pose-only BA.

    The host pipeline's staged path (slam/tracking.py
    _track_with_motion_model) runs the same jitted pieces one dispatch at
    a time with host round-trips between them; on a remote TPU those
    round-trips dominate the frame budget, so System routes monocular
    OK-state frames through this instead (same math, same thresholds).
    """
    from orb_slam2_commit_tpu.ops import camera as cam_ops

    cam = config.camera
    feats = ext.extract_features(image, config.orb, cam.height, cam.width)
    xy_und = cam_ops.undistort_pixels(feats.xy, cam)
    n_feat = feats.xy.shape[0]
    no_ur = jnp.full((n_feat,), -1.0, xy_und.dtype)

    res, binding, n_matches = _fused_match_and_pose(
        feats, xy_und, no_ur, pt_pos, pt_desc, pt_octave, pt_angle,
        pt_valid, R_pred, t_pred, config,
    )
    return FusedMotionResult(
        R=res.R,
        t=res.t,
        n_matches=n_matches,
        n_inliers=res.n_inliers,
        binding=binding,
        inliers=res.inliers,
        xy_und=xy_und,
        xy_raw=feats.xy,
        response=feats.response,
        angle=feats.angle,
        octave=feats.octave,
        desc=feats.desc,
        valid=feats.valid,
        depth=no_ur,
        ur=no_ur,
    )


@functools.partial(jax.jit, static_argnames=("config",))
def fused_motion_track_jit(
    image, pt_pos, pt_desc, pt_octave, pt_angle, pt_valid, R_pred, t_pred,
    config: SLAMConfig,
):
    return fused_motion_track(
        image, pt_pos, pt_desc, pt_octave, pt_angle, pt_valid,
        R_pred, t_pred, config
    )


def fused_stereo_motion_track(
    image_l: jnp.ndarray,
    image_r: jnp.ndarray,
    pt_pos: jnp.ndarray,
    pt_desc: jnp.ndarray,
    pt_octave: jnp.ndarray,
    pt_angle: jnp.ndarray,
    pt_valid: jnp.ndarray,
    R_pred: jnp.ndarray,
    t_pred: jnp.ndarray,
    tz_rel: jnp.ndarray,
    config: SLAMConfig,
) -> FusedMotionResult:
    """Stereo counterpart of fused_motion_track: BOTH extractions, the
    epipolar stereo matcher (ops/stereo.stereo_frontend — the reference's
    dual extraction threads P5 + ComputeStereoMatches live in one XLA
    program here), projective last-frame matching and mixed mono/stereo
    pose BA, all as one device dispatch."""
    from orb_slam2_commit_tpu.ops import camera as cam_ops
    from orb_slam2_commit_tpu.ops import stereo as stereo_ops

    cam = config.camera
    feats, _, smatch = stereo_ops.stereo_frontend(
        image_l, image_r, config.orb, cam.height, cam.width,
        cam.bf, cam.baseline,
    )
    xy_und = cam_ops.undistort_pixels(feats.xy, cam)
    ur = jnp.where(smatch.valid, smatch.u_right, -1.0).astype(xy_und.dtype)

    res, binding, n_matches = _fused_match_and_pose(
        feats, xy_und, ur, pt_pos, pt_desc, pt_octave, pt_angle,
        pt_valid, R_pred, t_pred, config, tz_rel=tz_rel,
    )
    return FusedMotionResult(
        R=res.R,
        t=res.t,
        n_matches=n_matches,
        n_inliers=res.n_inliers,
        binding=binding,
        inliers=res.inliers,
        xy_und=xy_und,
        xy_raw=feats.xy,
        response=feats.response,
        angle=feats.angle,
        octave=feats.octave,
        desc=feats.desc,
        valid=feats.valid,
        depth=jnp.where(smatch.valid, smatch.depth, -1.0),
        ur=ur,
    )


def fused_rgbd_motion_track(
    image: jnp.ndarray,
    depth_image: jnp.ndarray,   # [H, W] float32 raw depth map
    pt_pos: jnp.ndarray,
    pt_desc: jnp.ndarray,
    pt_octave: jnp.ndarray,
    pt_angle: jnp.ndarray,
    pt_valid: jnp.ndarray,
    R_pred: jnp.ndarray,
    t_pred: jnp.ndarray,
    tz_rel: jnp.ndarray,
    config: SLAMConfig,
) -> FusedMotionResult:
    """RGB-D counterpart of fused_motion_track: the per-keypoint depth
    lookup and virtual right-coordinate synthesis (ur = u - bf/z,
    reference Frame::ComputeStereoFromRGBD, src/Frame.cc:791-816) run
    in-graph, so the depth map uploads once and the whole frame is one
    dispatch."""
    from orb_slam2_commit_tpu.ops import camera as cam_ops

    cam = config.camera
    feats = ext.extract_features(image, config.orb, cam.height, cam.width)
    xy_und = cam_ops.undistort_pixels(feats.xy, cam)

    # Nearest-pixel depth at the RAW keypoint location (same as the host
    # path in slam/frame.make_frame).
    u = jnp.clip(jnp.round(feats.xy[:, 0]), 0, cam.width - 1).astype(jnp.int32)
    v = jnp.clip(jnp.round(feats.xy[:, 1]), 0, cam.height - 1).astype(jnp.int32)
    d = depth_image[v, u].astype(xy_und.dtype)
    if cam.depth_map_factor not in (0.0, 1.0):
        d = d / cam.depth_map_factor
    has = d > 0
    depth = jnp.where(has, d, -1.0)
    ur = jnp.where(has, xy_und[:, 0] - cam.bf / jnp.where(has, d, 1.0), -1.0)

    res, binding, n_matches = _fused_match_and_pose(
        feats, xy_und, ur, pt_pos, pt_desc, pt_octave, pt_angle,
        pt_valid, R_pred, t_pred, config, tz_rel=tz_rel,
    )
    return FusedMotionResult(
        R=res.R,
        t=res.t,
        n_matches=n_matches,
        n_inliers=res.n_inliers,
        binding=binding,
        inliers=res.inliers,
        xy_und=xy_und,
        xy_raw=feats.xy,
        response=feats.response,
        angle=feats.angle,
        octave=feats.octave,
        desc=feats.desc,
        valid=feats.valid,
        depth=depth,
        ur=ur,
    )


@functools.partial(jax.jit, static_argnames=("config",))
def fused_rgbd_motion_track_jit(
    image, depth_image, pt_pos, pt_desc, pt_octave, pt_angle, pt_valid,
    R_pred, t_pred, tz_rel, config: SLAMConfig,
):
    return fused_rgbd_motion_track(
        image, depth_image, pt_pos, pt_desc, pt_octave, pt_angle, pt_valid,
        R_pred, t_pred, tz_rel, config
    )


@functools.partial(jax.jit, static_argnames=("config",))
def fused_stereo_motion_track_jit(
    image_l, image_r, pt_pos, pt_desc, pt_octave, pt_angle, pt_valid,
    R_pred, t_pred, tz_rel, config: SLAMConfig,
):
    return fused_stereo_motion_track(
        image_l, image_r, pt_pos, pt_desc, pt_octave, pt_angle, pt_valid,
        R_pred, t_pred, tz_rel, config
    )


# ---------------------------------------------------------------------------
# Packed-transfer route: the same fused graphs with host<->device traffic
# collapsed to 3 buffers each way.
#
# Per-transfer latency, not bandwidth, dominates remote/tunneled runtimes
# (measured ~0.15-0.3 s per fetch through the axon tunnel: the unpacked
# FusedMotionResult's ~12 device->host fetches alone cost ~1.8 s/frame),
# and every transfer is also a host sync on co-located hardware. The host
# packs the per-frame point inputs into ONE f32 matrix + the descriptor
# table + ONE scalar meta vector, and the graph returns ONE f32 feature
# matrix + ONE meta vector + the descriptor table.
# ---------------------------------------------------------------------------

# Input meta layout: R_pred(9) t_pred(3) tz_rel -> [13].
IN_META_LEN = 13
# Packed point columns: pos(3) octave angle valid -> [M, 6].
IN_PT_COLS = 6
# Output meta: R(9) t(3) n_matches n_inliers -> [14].
OUT_META_LEN = 14
# Packed feature columns (all exactly representable in f32):
# xy_und(2) xy_raw(2) response angle octave valid depth ur binding inlier
OUT_FEAT_COLS = 12


def _unpack_inputs(pt_f32, meta_f32):
    # Canonical float dtype: f32 in production, f64 when the test mesh
    # enables x64 — keeps the packed route numerically identical to the
    # unpacked/staged oracles under either precision regime.
    fdt = jnp.result_type(float)
    pt_f32 = pt_f32.astype(fdt)
    meta_f32 = meta_f32.astype(fdt)
    pt_pos = pt_f32[:, 0:3]
    pt_octave = pt_f32[:, 3].astype(jnp.int32)
    pt_angle = pt_f32[:, 4]
    pt_valid = pt_f32[:, 5] > 0.5
    R_pred = meta_f32[0:9].reshape(3, 3)
    t_pred = meta_f32[9:12]
    tz_rel = meta_f32[12]
    return pt_pos, pt_octave, pt_angle, pt_valid, R_pred, t_pred, tz_rel


def _pack_result(res: FusedMotionResult):
    f32 = res.xy_und.dtype
    meta = jnp.concatenate([
        res.R.reshape(-1).astype(f32),
        res.t.astype(f32),
        res.n_matches.astype(f32)[None],
        res.n_inliers.astype(f32)[None],
    ])
    feat = jnp.stack([
        res.xy_und[:, 0], res.xy_und[:, 1],
        res.xy_raw[:, 0], res.xy_raw[:, 1],
        res.response.astype(f32), res.angle.astype(f32),
        res.octave.astype(f32), res.valid.astype(f32),
        res.depth.astype(f32), res.ur.astype(f32),
        res.binding.astype(f32), res.inliers.astype(f32),
    ], axis=1)
    return meta, feat, res.desc


@functools.partial(jax.jit, static_argnames=("config",))
def fused_motion_track_packed_jit(image, pt_f32, pt_desc, meta_f32,
                                  config: SLAMConfig):
    pt_pos, pt_octave, pt_angle, pt_valid, R_pred, t_pred, _ = (
        _unpack_inputs(pt_f32, meta_f32)
    )
    return _pack_result(fused_motion_track(
        image, pt_pos, pt_desc, pt_octave, pt_angle, pt_valid,
        R_pred, t_pred, config
    ))


@functools.partial(jax.jit, static_argnames=("config",))
def fused_rgbd_motion_track_packed_jit(image, depth_image, pt_f32, pt_desc,
                                       meta_f32, config: SLAMConfig):
    pt_pos, pt_octave, pt_angle, pt_valid, R_pred, t_pred, tz_rel = (
        _unpack_inputs(pt_f32, meta_f32)
    )
    return _pack_result(fused_rgbd_motion_track(
        image, depth_image, pt_pos, pt_desc, pt_octave, pt_angle, pt_valid,
        R_pred, t_pred, tz_rel, config
    ))


# ---------------------------------------------------------------------------
# Fused local-map tracking: frustum check -> projection matching -> pose
# BA as ONE packed-transfer graph, consuming the frontend's
# device-resident feature buffers (Frame.dev_feat / dev_desc) with no
# re-upload. The staged path (slam/tracking._track_local_map) is the
# oracle; this is its single-dispatch twin for accelerator runs.
#
# Candidate columns: pos(3) normal(3) dmin dmax valid -> [M, 9].
LM_CAND_COLS = 9
# Per-feature state: bound-point pos(3) has_bound -> [N, 4].
LM_FEAT_COLS = 4
# Input meta: R(9) t(3) th -> [13]; output meta: R(9) t(3) n_in -> [13].
LM_META_LEN = 13


@functools.partial(jax.jit, static_argnames=("config",))
def fused_local_map_track_jit(
    feat_dev,        # [N, OUT_FEAT_COLS] packed frontend features (device)
    desc_dev,        # [N, 8] uint32 (device)
    feat_state,      # [N, LM_FEAT_COLS] f32: current binding state
    cand_f32,        # [M, LM_CAND_COLS] f32 candidate map points
    cand_desc,       # [M, 8] uint32
    meta_f32,        # [LM_META_LEN]
    config: SLAMConfig,
):
    """Oracle: TrackLocalMap's device portion (src/Tracking.cc:1137-1202:
    SearchLocalPoints' frustum gates + SearchByProjection + the final
    PoseOptimization), fused. Returns (meta_out [LM_META_LEN] f32,
    perfeat [N, 2] f32: candidate-row binding (-1 none) and inlier flag,
    visible [M] f32)."""
    cam = config.camera
    fdt = jnp.result_type(float)
    feat_dev = feat_dev.astype(fdt)
    feat_state = feat_state.astype(fdt)
    cand_f32 = cand_f32.astype(fdt)
    meta_f32 = meta_f32.astype(fdt)
    xy_und = feat_dev[:, 0:2]
    angle = feat_dev[:, 5]
    octave = feat_dev[:, 6].astype(jnp.int32)
    f_valid = feat_dev[:, 7] > 0.5
    ur = feat_dev[:, 9]
    bound_pos = feat_state[:, 0:3]
    has_bound = feat_state[:, 3] > 0.5

    R0 = meta_f32[0:9].reshape(3, 3)
    t0 = meta_f32[9:12]
    th = meta_f32[12]

    info = matchers.frustum_check.__wrapped__(
        cand_f32[:, 0:3], cand_f32[:, 3:6], cand_f32[:, 6], cand_f32[:, 7],
        cand_f32[:, 8] > 0.5, R0, t0,
        cam.fx, cam.fy, cam.cx, cam.cy,
        float(cam.width), float(cam.height),
        n_levels=config.orb.n_levels, scale=config.orb.scale_factor,
    )
    m = matchers.match_local_map.__wrapped__(
        info, cand_desc, xy_und, desc_dev, octave, f_valid,
        has_bound, th=th,
        n_levels=config.orb.n_levels, scale=config.orb.scale_factor,
    )
    # Invert candidate->feature matches into per-feature bindings.
    n_feat = xy_und.shape[0]
    idx = m.idx
    safe = jnp.maximum(idx, 0)
    binding = jnp.full((n_feat,), -1, jnp.int32)
    binding = binding.at[safe].set(
        jnp.where(idx >= 0, jnp.arange(idx.shape[0], dtype=jnp.int32), -1)
    )
    new = binding >= 0
    pos = jnp.where(
        new[:, None], cand_f32[jnp.maximum(binding, 0), 0:3], bound_pos
    )
    obs_ok = (new | has_bound) & f_valid

    sigma2 = jnp.asarray(config.orb.level_sigma2())
    inv_sigma2 = 1.0 / sigma2[jnp.clip(octave, 0, config.orb.n_levels - 1)]
    has_ur = ur >= 0
    obs = BAObservations(
        cam_idx=jnp.zeros(n_feat, jnp.int32),
        pt_idx=jnp.arange(n_feat, dtype=jnp.int32),
        uvr=jnp.concatenate(
            [xy_und, jnp.where(has_ur, ur, 0.0)[:, None]], axis=1
        ),
        inv_sigma2=inv_sigma2,
        is_stereo=has_ur & obs_ok,
        valid=obs_ok,
    )
    res = pose_opt.pose_optimization(
        R0, t0, pos, obs, cam.fx, cam.fy, cam.cx, cam.cy, cam.bf,
    )
    f32 = xy_und.dtype
    meta_out = jnp.concatenate([
        res.R.reshape(-1).astype(f32), res.t.astype(f32),
        res.n_inliers.astype(f32)[None],
    ])
    perfeat = jnp.stack(
        [binding.astype(f32), res.inliers.astype(f32)], axis=1
    )
    return meta_out, perfeat, info.visible.astype(f32)


@functools.partial(jax.jit, static_argnames=("config",))
def fused_stereo_motion_track_packed_jit(image_l, image_r, pt_f32, pt_desc,
                                         meta_f32, config: SLAMConfig):
    pt_pos, pt_octave, pt_angle, pt_valid, R_pred, t_pred, tz_rel = (
        _unpack_inputs(pt_f32, meta_f32)
    )
    return _pack_result(fused_stereo_motion_track(
        image_l, image_r, pt_pos, pt_desc, pt_octave, pt_angle, pt_valid,
        R_pred, t_pred, tz_rel, config
    ))
