"""Stereo keypoint matching with SAD subpixel refinement.

TPU-native replacement for Frame::ComputeStereoMatches (reference:
src/Frame.cc:547-788). The reference builds per-row candidate lists and
loops; here it is one dense masked Hamming matrix (epipolar row band +
octave band + disparity window), then a vectorized 11x11 SAD scan with
parabola subpixel fit on the matched pairs, then the median-based outlier
cut (:770-787).

Level-dependent image access uses a padded pyramid stack [L, H0, W0] so a
traced octave can index it — no per-level control flow.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from orb_slam2_commit_tpu.ops import matching

SAD_HALF = 5          # 11x11 window (reference w=5, src/Frame.cc:675)
SLIDE = 5             # +/-5 px scan (reference L=5, :683)
TH_ORB = (matching.TH_HIGH + matching.TH_LOW) / 2  # 75 (:556)


def pyramid_stack(levels: Tuple[jnp.ndarray, ...]) -> jnp.ndarray:
    """Pad pyramid levels to level-0 shape and stack [L, H0, W0]."""
    h0, w0 = levels[0].shape
    padded = [
        jnp.pad(lv, ((0, h0 - lv.shape[0]), (0, w0 - lv.shape[1])))
        for lv in levels
    ]
    return jnp.stack(padded, axis=0)


class StereoMatch(NamedTuple):
    u_right: jnp.ndarray   # [N] refined right u in level-0 coords (-1 invalid)
    depth: jnp.ndarray     # [N] metric depth (-1 invalid)
    valid: jnp.ndarray     # [N]


def stereo_frontend(
    image_l: jnp.ndarray,
    image_r: jnp.ndarray,
    orb_config,
    height: int,
    width: int,
    bf: float,
    baseline: float,
):
    """Full stereo front end in one graph: extract both images + match.

    The reference spawns two extraction threads (src/Frame.cc:80-84,
    SURVEY.md §2.4 P5); here both extractions live in one XLA program and
    overlap on-chip.
    """
    from orb_slam2_commit_tpu.ops import extractor as ext
    from orb_slam2_commit_tpu.ops import pyramid as pyr

    # In-graph f32 cast: upload camera frames as uint8 (see
    # ops/extractor.extract_features).
    image_l = image_l.astype(jnp.float32)
    image_r = image_r.astype(jnp.float32)
    feats_l = ext.extract_features(image_l, orb_config, height, width)
    feats_r = ext.extract_features(image_r, orb_config, height, width)
    shapes = orb_config.level_shapes(height, width)
    stack_l = pyramid_stack(pyr.build_pyramid(image_l, shapes))
    stack_r = pyramid_stack(pyr.build_pyramid(image_r, shapes))
    sf = jnp.asarray(orb_config.scale_factors())
    match = stereo_match(
        feats_l.xy, feats_l.octave, feats_l.desc, feats_l.valid,
        feats_r.xy, feats_r.octave, feats_r.desc, feats_r.valid,
        stack_l, stack_r, bf, baseline, sf,
    )
    return feats_l, feats_r, match


stereo_frontend_jit = jax.jit(
    stereo_frontend,
    static_argnames=("orb_config", "height", "width", "bf", "baseline"),
)


def _gather_window(stack, level, yc, xc, half):
    """[N, 2h+1, 2h+1] windows from stack[level] at integer centers."""
    L, H, W = stack.shape
    size = 2 * half + 1
    dy = jnp.arange(-half, half + 1)
    ys = jnp.clip(yc[:, None] + dy[None, :], 0, H - 1)       # [N, size]
    xs = jnp.clip(xc[:, None] + dy[None, :], 0, W - 1)
    flat = (
        level[:, None, None] * (H * W)
        + ys[:, :, None] * W
        + xs[:, None, :]
    )
    return jnp.take(stack.reshape(-1), flat.reshape(-1)).reshape(-1, size, size)


def stereo_match(
    xy_l: jnp.ndarray, octave_l: jnp.ndarray, desc_l: jnp.ndarray,
    valid_l: jnp.ndarray,
    xy_r: jnp.ndarray, octave_r: jnp.ndarray, desc_r: jnp.ndarray,
    valid_r: jnp.ndarray,
    stack_l: jnp.ndarray, stack_r: jnp.ndarray,
    bf: float,
    min_z: float,
    scale_factors: jnp.ndarray,   # [n_levels]
) -> StereoMatch:
    """Match left keypoints to right keypoints along epipolar rows.

    Coordinates in level-0 pixels (rectified pair: epipolar lines are rows).
    min_z = baseline (so maxD = bf / b = fx, reference src/Frame.cc:559-561).
    """
    n_l = xy_l.shape[0]
    max_d = bf / min_z
    min_d = 0.0

    # --- candidate mask + Hamming best match --------------------------------
    dist = matching.hamming_distance_matrix(desc_l, desc_r)
    row_band = jnp.abs(xy_l[:, 1:2] - xy_r[None, :, 1]) <= (
        2.0 * scale_factors[jnp.clip(octave_l, 0, scale_factors.shape[0] - 1)][:, None]
    )
    octave_band = matching.octave_band_mask(octave_r, octave_l - 1, octave_l + 1)
    disp = xy_l[:, 0:1] - xy_r[None, :, 0]
    disp_ok = (disp >= min_d - 2.0) & (disp <= max_d)
    mask = valid_l[:, None] & valid_r[None, :] & row_band & octave_band & disp_ok
    m = matching.best_match_with_ratio(dist, mask, int(TH_ORB))
    has = m.idx >= 0
    ridx = jnp.maximum(m.idx, 0)

    # Left-right consistency (beyond the reference): the matched right
    # keypoint's own best left candidate must be this left keypoint.
    # Gross descriptor mismatches (similar-texture landmarks elsewhere on
    # the row) pass the distance threshold but almost never mutually —
    # without this cut a few percent of stereo depths are wildly wrong,
    # and those seed map points that drag pose optimization (measured:
    # disparity-error tail mean +9 px -> ~0).
    big = jnp.asarray(1 << 20, dist.dtype)
    dist_m = jnp.where(mask, dist, big)
    best_l_for_r = jnp.argmin(dist_m, axis=0)          # [n_r]
    mutual = best_l_for_r[ridx] == jnp.arange(n_l)
    has = has & mutual

    # --- SAD subpixel refinement at the keypoint's own pyramid level --------
    lvl = jnp.clip(octave_l, 0, scale_factors.shape[0] - 1)
    inv_scale = 1.0 / scale_factors[lvl]
    uL = xy_l[:, 0] * inv_scale
    vL = xy_l[:, 1] * inv_scale
    uR0 = xy_r[ridx, 0] * inv_scale
    iuL = jnp.round(uL).astype(jnp.int32)
    ivL = jnp.round(vL).astype(jnp.int32)
    iuR0 = jnp.round(uR0).astype(jnp.int32)

    win_l = _gather_window(stack_l, lvl, ivL, iuL, SAD_HALF)   # [N, 11, 11]
    # Normalize by center intensity (reference :678-681 subtracts center).
    win_l = win_l - win_l[:, SAD_HALF : SAD_HALF + 1, SAD_HALF : SAD_HALF + 1]

    def sad_at(inc):
        win_r = _gather_window(stack_r, lvl, ivL, iuR0 + inc, SAD_HALF)
        win_r = win_r - win_r[
            :, SAD_HALF : SAD_HALF + 1, SAD_HALF : SAD_HALF + 1
        ]
        return jnp.sum(jnp.abs(win_l - win_r), axis=(1, 2))

    sads = jnp.stack(
        [sad_at(i) for i in range(-SLIDE, SLIDE + 1)], axis=1
    )  # [N, 11]
    best = jnp.argmin(sads, axis=1)
    # Parabola fit over the best and its neighbors (reference :719-728).
    ib = jnp.clip(best, 1, 2 * SLIDE - 1)
    s_m = jnp.take_along_axis(sads, (ib - 1)[:, None], 1)[:, 0]
    s_c = jnp.take_along_axis(sads, ib[:, None], 1)[:, 0]
    s_p = jnp.take_along_axis(sads, (ib + 1)[:, None], 1)[:, 0]
    denom = 2.0 * (s_m + s_p - 2.0 * s_c)
    delta = jnp.where(jnp.abs(denom) > 1e-9, (s_m - s_p) / denom, 0.0)
    # Out-of-range parabola offset = no true SAD valley here; the
    # reference REJECTS these (src/Frame.cc:729-730, deltaR<-1||deltaR>1)
    # rather than clipping.
    delta_ok = jnp.abs(delta) <= 1.0
    delta = jnp.clip(delta, -1.0, 1.0)

    u_r_level = iuR0.astype(win_l.dtype) + (ib - SLIDE) + delta
    u_r0 = u_r_level * scale_factors[lvl]
    disparity = xy_l[:, 0] - u_r0
    ok = (
        has
        & delta_ok
        & (disparity > min_d)
        & (disparity < max_d)
        & (best >= 1)
        & (best <= 2 * SLIDE - 1)
    )
    depth = jnp.where(ok, bf / jnp.where(ok, disparity, 1.0), -1.0)

    # --- median-based outlier cut (reference :770-787) ----------------------
    dist_best = jnp.where(ok, m.dist, 1 << 20)
    sorted_d = jnp.sort(dist_best)
    n_ok = jnp.sum(ok)
    median = sorted_d[jnp.clip(n_ok // 2, 0, n_l - 1)].astype(jnp.float32)
    th = 1.5 * 1.4 * median
    keep = ok & (m.dist.astype(jnp.float32) < th)

    return StereoMatch(
        u_right=jnp.where(keep, u_r0, -1.0),
        depth=jnp.where(keep, depth, -1.0),
        valid=keep,
    )
