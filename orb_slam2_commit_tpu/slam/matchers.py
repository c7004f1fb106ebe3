"""Tracker-level matching operations.

Each function here is one ORBmatcher variant (reference: src/ORBmatcher.cc)
expressed as: dense masked Hamming matrix -> best/ratio -> rotation
histogram -> duplicate resolution, over fixed-shape padded arrays.

All functions are pure jnp and jittable; the host passes arrays straight
from Features / MapState.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from orb_slam2_commit_tpu.ops import matching
from orb_slam2_commit_tpu.ops import pallas_matching
from orb_slam2_commit_tpu.ops.matching import (
    BIG_DIST,
    INVALID,
    MatchResult,
    TH_HIGH,
    TH_LOW,
)


def _projection_match(
    pt_desc, proj, radius, oct_lo, oct_hi, valid_a,
    xy, desc, octave, valid_b,
    max_dist, ratio=1.0, ratio_octave_rule=False,
) -> MatchResult:
    """Window + octave-band projection matching, routed to the fused
    Pallas kernel on TPU or the dense XLA path on CPU. Shared by the
    SearchByProjection / Fuse family."""
    if matching.use_pallas():
        best, bidx, second, sidx = pallas_matching.projection_hamming_top2(
            pt_desc, proj, radius, oct_lo, oct_hi, valid_a,
            desc, xy, octave, valid_b,
        )
        return matching.match_from_top2(
            best, bidx, second, sidx, max_dist, ratio,
            octave_b=octave if ratio_octave_rule else None,
        )
    dist = matching.hamming_distance_matrix(pt_desc, desc)
    mask = (
        valid_a[:, None]
        & valid_b[None, :]
        & matching.window_mask(proj, xy, radius)
        & matching.octave_band_mask(octave, oct_lo, oct_hi)
    )
    return matching.best_match_with_ratio(
        dist, mask, max_dist, ratio,
        octave_b=octave if ratio_octave_rule else None,
    )


def _scale_sigmas(n_levels: int = 8, scale: float = 1.2) -> jnp.ndarray:
    return jnp.asarray([scale ** i for i in range(n_levels)], jnp.float32)


@functools.partial(jax.jit, static_argnames=("window", "ratio"))
def match_for_initialization(
    xy1: jnp.ndarray, desc1: jnp.ndarray, angle1: jnp.ndarray,
    octave1: jnp.ndarray, valid1: jnp.ndarray,
    xy2: jnp.ndarray, desc2: jnp.ndarray, angle2: jnp.ndarray,
    octave2: jnp.ndarray, valid2: jnp.ndarray,
    window: float = 100.0, ratio: float = 0.9,
) -> MatchResult:
    """Frame-1 -> frame-2 matches for monocular bootstrap.

    Oracle: SearchForInitialization (src/ORBmatcher.cc:442-587): level-0
    features only, 100 px window, TH_LOW, best/second ratio, rotation
    histogram, one-to-one via duplicate resolution.
    """
    dist = matching.hamming_distance_matrix(desc1, desc2)
    mask = (
        valid1[:, None]
        & valid2[None, :]
        & (octave1[:, None] == 0)
        & (octave2[None, :] == 0)
        & matching.window_mask(xy1, xy2, window)
    )
    m = matching.best_match_with_ratio(dist, mask, TH_LOW, ratio)
    m = matching.rotation_consistency_filter(m, angle1, angle2)
    return matching.resolve_duplicate_targets(m, desc2.shape[0])


@functools.partial(
    jax.jit, static_argnames=("th", "mono", "baseline", "n_levels", "scale")
)
def match_projection_last_frame(
    # Last frame's bound points (world) + feature attributes:
    pt_pos: jnp.ndarray,       # [M, 3]
    pt_desc: jnp.ndarray,      # [M, 8]
    pt_octave: jnp.ndarray,    # [M] octave of the last-frame feature
    pt_angle: jnp.ndarray,     # [M]
    pt_valid: jnp.ndarray,     # [M]
    # Current frame:
    R: jnp.ndarray, t: jnp.ndarray,
    xy: jnp.ndarray, desc: jnp.ndarray, angle: jnp.ndarray,
    octave: jnp.ndarray, valid: jnp.ndarray,
    fx: float, fy: float, cx: float, cy: float,
    width: float, height: float,
    th: float = 15.0,
    tz_rel=0.0,                # z of the current camera center in the LAST
                               # frame's coords (tlc.z, only used if !mono)
    mono: bool = True,
    baseline: float = 0.0,
    n_levels: int = 8,
    scale: float = 1.2,
) -> MatchResult:
    """Motion-model tracking: project last frame's map points with the
    predicted pose and search a window scaled by the source octave.

    Oracle: SearchByProjection(Frame&, const Frame&, th, bMono)
    (src/ORBmatcher.cc:1489-1646): radius = th * sigma(octave), candidate
    octaves [oct-1, oct+1] for mono; for stereo/RGB-D the forward/backward
    rule (:1522-1529, :1555-1570): camera moved forward by more than the
    baseline -> features appear coarser, search octave >= last octave;
    moved backward -> octave <= last.
    """
    sigmas = _scale_sigmas(n_levels, scale)
    pc = jnp.einsum("ij,mj->mi", R, pt_pos) + t
    z = pc[:, 2]
    inv_z = 1.0 / jnp.where(z > 1e-6, z, 1e-6)
    u = fx * pc[:, 0] * inv_z + cx
    v = fy * pc[:, 1] * inv_z + cy
    proj = jnp.stack([u, v], axis=-1)
    in_img = (z > 0) & (u >= 0) & (u < width) & (v >= 0) & (v < height)

    if mono:
        oct_lo, oct_hi = pt_octave - 1, pt_octave + 1
    else:
        fwd = jnp.asarray(tz_rel) > baseline
        bwd = -jnp.asarray(tz_rel) > baseline
        oct_lo = jnp.where(fwd, pt_octave,
                           jnp.where(bwd, -127, pt_octave - 1))
        oct_hi = jnp.where(fwd, 127,
                           jnp.where(bwd, pt_octave, pt_octave + 1))

    radius = th * sigmas[jnp.clip(pt_octave, 0, sigmas.shape[0] - 1)]
    m = _projection_match(
        pt_desc, proj, radius, oct_lo, oct_hi,
        pt_valid & in_img, xy, desc, octave, valid, TH_HIGH,
    )
    m = matching.rotation_consistency_filter(m, pt_angle, angle)
    return matching.resolve_duplicate_targets(m, desc.shape[0])


class FrustumInfo(NamedTuple):
    visible: jnp.ndarray        # [M] passes all frustum gates
    proj: jnp.ndarray           # [M, 2] pixel projection
    pred_octave: jnp.ndarray    # [M] predicted pyramid level
    view_cos: jnp.ndarray       # [M]


@functools.partial(jax.jit, static_argnames=("n_levels", "scale"))
def frustum_check(
    pt_pos: jnp.ndarray,       # [M, 3]
    pt_normal: jnp.ndarray,    # [M, 3]
    pt_min_dist: jnp.ndarray,  # [M]
    pt_max_dist: jnp.ndarray,  # [M]
    pt_valid: jnp.ndarray,     # [M]
    R: jnp.ndarray, t: jnp.ndarray,
    fx: float, fy: float, cx: float, cy: float,
    width: float, height: float,
    n_levels: int = 8, scale: float = 1.2,
) -> FrustumInfo:
    """Frame::isInFrustum (src/Frame.cc:315-378): image bounds, distance
    band [0.8 min, 1.2 max], viewing angle cos >= 0.5, predicted scale
    (MapPoint::PredictScale, src/MapPoint.cc:407-439)."""
    pc = jnp.einsum("ij,mj->mi", R, pt_pos) + t
    z = pc[:, 2]
    inv_z = 1.0 / jnp.where(z > 1e-6, z, 1e-6)
    u = fx * pc[:, 0] * inv_z + cx
    v = fy * pc[:, 1] * inv_z + cy
    proj = jnp.stack([u, v], axis=-1)

    center = -jnp.einsum("ji,j->i", R, t)  # camera center in world
    po = pt_pos - center[None]
    dist = jnp.linalg.norm(po, axis=1)
    view_cos = jnp.sum(po * pt_normal, axis=1) / jnp.maximum(dist, 1e-9)

    log_scale = jnp.log(scale)
    ratio = pt_max_dist / jnp.maximum(dist, 1e-9)
    pred = jnp.ceil(jnp.log(jnp.maximum(ratio, 1e-9)) / log_scale).astype(jnp.int32)
    pred = jnp.clip(pred, 0, n_levels - 1)

    visible = (
        pt_valid
        & (z > 0)
        & (u >= 0) & (u < width) & (v >= 0) & (v < height)
        & (dist >= 0.8 * pt_min_dist)
        & (dist <= 1.2 * pt_max_dist)
        & (view_cos >= 0.5)
    )
    return FrustumInfo(visible, proj, pred, view_cos)


@functools.partial(
    jax.jit, static_argnames=("th", "ratio", "n_levels", "scale")
)
def match_local_map(
    info: FrustumInfo,
    pt_desc: jnp.ndarray,      # [M, 8]
    xy: jnp.ndarray, desc: jnp.ndarray,
    octave: jnp.ndarray, valid: jnp.ndarray,
    feat_taken: jnp.ndarray,   # [N] features already bound by motion tracking
    th: float = 1.0, ratio: float = 0.8,
    n_levels: int = 8, scale: float = 1.2,
) -> MatchResult:
    """Local-map point -> frame matching after frustum_check.

    Oracle: SearchByProjection(Frame&, vector<MapPoint*>&, th)
    (src/ORBmatcher.cc:46-142): radius = RadiusByViewingCos (2.5 if
    cos > 0.998 else 4.0) * th * sigma(predicted level), octaves
    [pred-1, pred], TH_HIGH, ratio 0.8 when best and second-best share an
    octave.
    """
    sigmas = _scale_sigmas(n_levels, scale)
    base_r = jnp.where(info.view_cos > 0.998, 2.5, 4.0)
    radius = base_r * th * sigmas[info.pred_octave]
    m = _projection_match(
        pt_desc, info.proj, radius,
        info.pred_octave - 1, info.pred_octave,
        info.visible, xy, desc, octave, valid & ~feat_taken,
        TH_HIGH, ratio, ratio_octave_rule=True,
    )
    return matching.resolve_duplicate_targets(m, desc.shape[0])


@functools.partial(
    jax.jit, static_argnames=("th", "n_levels", "scale")
)
def match_by_sim3(
    pt_cam: jnp.ndarray,       # [M, 3] points already in the TARGET camera frame
    pt_desc: jnp.ndarray,      # [M, 8]
    pt_min_dist: jnp.ndarray,  # [M]
    pt_max_dist: jnp.ndarray,  # [M]
    pt_valid: jnp.ndarray,     # [M]
    xy: jnp.ndarray, desc: jnp.ndarray,
    octave: jnp.ndarray, valid: jnp.ndarray,
    fx: float, fy: float, cx: float, cy: float,
    width: float, height: float,
    th: float = 7.5, n_levels: int = 8, scale: float = 1.2,
) -> MatchResult:
    """One direction of SearchBySim3 (src/ORBmatcher.cc:1238-1487).

    Points are pre-transformed through the candidate Sim3 into the target
    camera frame; gates are depth > 0, image bounds, scale-invariance
    distance band [0.8 min, 1.2 max] (:1311-1330), window radius
    th * sigma(predicted level) over octaves [pred-1, pred+1] at TH_HIGH
    with no ratio test (:1342-1365). The caller runs both directions and
    keeps mutually consistent pairs (:1442-1455)."""
    z = pt_cam[:, 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) > 1e-9, z, 1e-9)
    u = fx * pt_cam[:, 0] * inv_z + cx
    v = fy * pt_cam[:, 1] * inv_z + cy
    proj = jnp.stack([u, v], axis=-1)
    dist = jnp.linalg.norm(pt_cam, axis=1)
    log_scale = jnp.log(scale)
    ratio_d = pt_max_dist / jnp.maximum(dist, 1e-9)
    pred = jnp.ceil(
        jnp.log(jnp.maximum(ratio_d, 1e-9)) / log_scale
    ).astype(jnp.int32)
    pred = jnp.clip(pred, 0, n_levels - 1)
    ok = (
        pt_valid
        & (z > 0.0)
        & (u >= 0) & (u < width) & (v >= 0) & (v < height)
        & (dist >= 0.8 * pt_min_dist)
        & (dist <= 1.2 * pt_max_dist)
    )
    sigmas = _scale_sigmas(n_levels, scale)
    radius = th * sigmas[pred]
    return _projection_match(
        pt_desc, proj, radius, pred - 1, pred + 1,
        ok, xy, desc, octave, valid, TH_HIGH,
    )


@functools.partial(jax.jit, static_argnames=("max_dist", "ratio"))
def match_brute_force(
    desc_a: jnp.ndarray, angle_a: jnp.ndarray, valid_a: jnp.ndarray,
    desc_b: jnp.ndarray, angle_b: jnp.ndarray, valid_b: jnp.ndarray,
    max_dist: int = TH_LOW, ratio: float = 0.7,
) -> MatchResult:
    """Whole-frame descriptor matching with ratio + rotation checks.

    TPU-native counterpart of SearchByBoW (src/ORBmatcher.cc:175-325) with
    the same gates (TH_LOW, ratio 0.7, rotation histogram, one-to-one) but
    a deliberately different candidate set: the reference restricts
    candidates to features sharing a BoW tree node (:200-298) purely as a
    CPU pruning heuristic, while here the full N x M XOR-popcount matrix
    is one fused device op (~us at 1000x1000) — a strict SUPERSET of the
    node-bucketed candidates under identical acceptance gates, so it can
    only find the same or better-distance matches. Used for reference-KF
    tracking and relocalization.
    """
    dist = matching.hamming_distance_matrix(desc_a, desc_b)
    mask = valid_a[:, None] & valid_b[None, :]
    m = matching.best_match_with_ratio(dist, mask, max_dist, ratio)
    m = matching.rotation_consistency_filter(m, angle_a, angle_b)
    return matching.resolve_duplicate_targets(m, desc_b.shape[0])


@functools.partial(jax.jit, static_argnames=("max_dist", "ratio"))
def match_brute_force_many(
    desc_a: jnp.ndarray,       # [C, N, 8] candidate keyframes
    angle_a: jnp.ndarray,      # [C, N]
    valid_a: jnp.ndarray,      # [C, N]
    desc_b: jnp.ndarray, angle_b: jnp.ndarray, valid_b: jnp.ndarray,
    max_dist: int = TH_LOW, ratio: float = 0.7,
) -> MatchResult:
    """match_brute_force vmapped over a leading candidate axis of side A:
    ONE dispatch matches every relocalization candidate against the frame
    (the reference round-robins SearchByBoW per candidate on the host,
    src/Tracking.cc:1713-1762)."""
    return jax.vmap(
        lambda d, a, v: match_brute_force(
            d, a, v, desc_b, angle_b, valid_b, max_dist, ratio
        )
    )(desc_a, angle_a, valid_a)


@functools.partial(jax.jit, static_argnames=("n_levels", "scale"))
def match_for_triangulation(
    xy1: jnp.ndarray, desc1: jnp.ndarray, angle1: jnp.ndarray,
    free1: jnp.ndarray,
    xy2: jnp.ndarray, desc2: jnp.ndarray, angle2: jnp.ndarray,
    free2: jnp.ndarray,
    F12: jnp.ndarray,
    octave2: jnp.ndarray,
    epipole2: jnp.ndarray,     # [2] projection of camera-1 center in image 2
    min_epipole_dist2: jnp.ndarray,  # scalar: min sq px distance to epipole
    n_levels: int = 8, scale: float = 1.2,
) -> MatchResult:
    """KF1 -> KF2 matches for new-point triangulation.

    Oracle: SearchForTriangulation (src/ORBmatcher.cc:738-911): only
    features without a bound map point, epipolar-band constraint
    (CheckDistEpipolarLine :153-173), epipole proximity rejection
    (:831-838), TH_LOW, rotation histogram.
    """
    sigmas2 = _scale_sigmas(n_levels, scale) ** 2
    sig2 = sigmas2[jnp.clip(octave2, 0, sigmas2.shape[0] - 1)]
    dist = matching.hamming_distance_matrix(desc1, desc2)
    de = xy2 - epipole2[None]
    far_from_epipole = jnp.sum(de * de, axis=1) >= min_epipole_dist2
    mask = (
        free1[:, None]
        & (free2 & far_from_epipole)[None, :]
        & matching.epipolar_mask(xy1, xy2, F12, sig2)
    )
    m = matching.best_match_with_ratio(dist, mask, TH_LOW)
    m = matching.rotation_consistency_filter(m, angle1, angle2)
    return matching.resolve_duplicate_targets(m, desc2.shape[0])


@functools.partial(jax.jit, static_argnames=("th", "n_levels", "scale"))
def match_fuse(
    info: FrustumInfo,
    pt_desc: jnp.ndarray,
    xy: jnp.ndarray, desc: jnp.ndarray,
    octave: jnp.ndarray, valid: jnp.ndarray,
    th: float = 3.0,
    n_levels: int = 8, scale: float = 1.2,
) -> MatchResult:
    """Project map points into a keyframe for duplicate fusion.

    Oracle: ORBmatcher::Fuse (src/ORBmatcher.cc:918-1092): radius =
    th * sigma(predicted level), octaves [pred-1, pred+1], TH_LOW. The host
    decides merge vs bind per returned match (reference :1061-1082).
    """
    sigmas = _scale_sigmas(n_levels, scale)
    radius = th * sigmas[info.pred_octave]
    m = _projection_match(
        pt_desc, info.proj, radius,
        info.pred_octave - 1, info.pred_octave + 1,
        info.visible, xy, desc, octave, valid, TH_LOW,
    )
    return matching.resolve_duplicate_targets(m, desc.shape[0])
