"""The full ORB feature extractor: pyramid -> FAST -> select -> orient -> BRIEF.

TPU-native replacement for ORBextractor::operator()
(reference: src/ORBextractor.cc:1138-1211). One jitted call per image:
every pyramid level is processed with static shapes, per-level budgets from
the same geometric series as the reference, and all outputs are padded,
masked, fixed-shape arrays in level-0 pixel coordinates.

Output layout (Features):
  xy        [N, 2] float32 — (x, y) in level-0 coords (undistorted later)
  response  [N]    float32
  angle     [N]    float32 — radians
  octave    [N]    int32
  desc      [N, 8] uint32  — 256-bit rotated BRIEF
  valid     [N]    bool
N = sum of per-level budgets (== config n_features up to rounding).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from orb_slam2_commit_tpu.ops import descriptors, fast, pyramid
from orb_slam2_commit_tpu.utils.config import ORBConfig


class Features(NamedTuple):
    xy: jnp.ndarray
    response: jnp.ndarray
    angle: jnp.ndarray
    octave: jnp.ndarray
    desc: jnp.ndarray
    valid: jnp.ndarray

    @property
    def n(self) -> int:
        return self.xy.shape[-2]


def use_packed_route() -> bool:
    """Packed-canvas extraction (one kernel per stage across all levels)?
    Default: on for TPU backends, off on CPU (where per-kernel launch
    latency is negligible and the per-level code doubles as the oracle).
    Override with ORB_TPU_FORCE_PACKED=0/1."""
    import os

    v = os.environ.get("ORB_TPU_FORCE_PACKED")
    if v is not None:
        return v == "1"
    return jax.default_backend() != "cpu"


def detection_border(config: ORBConfig) -> int:
    """Detection border, px. The reference uses EDGE_THRESHOLD-3 = 16
    (src/ORBextractor.cc:822-825); we widen it so that every BRIEF sample
    (|off| <= BRIEF_HALF) plus its blur taps (+/-3) stays strictly inside
    the level — which makes the packed-canvas route (packed_extractor.py)
    bit-exact and removes any dependence on border clamping."""
    return max(config.edge_threshold - 3, descriptors.BRIEF_HALF + 3)


def _border_premask(score: jnp.ndarray, border: int) -> jnp.ndarray:
    """Zero scores within `border` of the level edge BEFORE the cell
    fallback + NMS (same order as the packed route)."""
    h, w = score.shape
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    inside = (
        (ys >= border) & (ys < h - border) & (xs >= border) & (xs < w - border)
    )
    return jnp.where(inside, score, 0.0)


def _extract_level(
    image: jnp.ndarray,
    level: int,
    budget: int,
    config: ORBConfig,
) -> Tuple[jnp.ndarray, ...]:
    """FAST + selection + orientation + descriptors for one pyramid level."""
    border = detection_border(config)
    if descriptors.use_patch_route():
        # Fused Pallas level kernel: blur + both FAST score maps in one
        # HBM pass; per-keypoint stages via the Pallas patch kernel.
        from orb_slam2_commit_tpu.ops import pallas_level

        blurred, s_hi, s_lo = pallas_level.level_preprocess(
            image, float(config.ini_th_fast), float(config.min_th_fast)
        )
        score = fast.combine_two_threshold(
            _border_premask(s_hi, border),
            _border_premask(s_lo, border),
            config.cell_size,
        )
    else:
        d_hi, d_lo = fast.two_threshold_score_maps(
            image, float(config.ini_th_fast), float(config.min_th_fast)
        )
        score = fast.combine_two_threshold(
            _border_premask(d_hi, border),
            _border_premask(d_lo, border),
            config.cell_size,
        )
        blurred = pyramid.gaussian_blur(image)
    yx, response, valid = fast.select_keypoints(
        score, budget, config.cell_size, config.cell_top_k, border
    )
    if descriptors.use_patch_route():
        angle = descriptors.ic_angle_patches(image, yx)
        desc = descriptors.brief_descriptors_patches(blurred, yx, angle)
    else:
        angle = descriptors.ic_angle(image, yx)
        desc = descriptors.brief_descriptors(blurred, yx, angle)
    return yx, response, angle, desc, valid


def extract_features(
    image: jnp.ndarray, config: ORBConfig, height: int, width: int
) -> Features:
    """Run the ORB front end on image[height, width] float32 (grayscale 0-255).

    Static-shape equivalent of ORBextractor::operator()
    (src/ORBextractor.cc:1138-1211): keypoint coords are rescaled to level 0
    by scale_factor**level, same as the reference (:1203-1209).

    On TPU the packed-canvas route (ops/packed_extractor.py) is used: all
    levels run through each stage as ONE kernel, which is what the
    launch-latency-bound hardware wants. The per-level route below is the
    readable oracle (and the CPU path).

    Accepts any integer/float image dtype and casts to float32 IN-GRAPH:
    callers should upload camera frames in their native uint8 so the
    host->device transfer moves 1 byte/pixel, not 4 (the reference
    likewise consumes 8-bit grayscale, src/Tracking.cc:246-259).
    """
    image = image.astype(jnp.float32)
    if use_packed_route():
        from orb_slam2_commit_tpu.ops import packed_extractor

        return packed_extractor.extract_features_packed(
            image, config, height, width
        )
    shapes = config.level_shapes(height, width)
    levels = pyramid.build_pyramid(image, shapes)
    budgets = config.features_per_level()
    scales = config.scale_factors()

    all_xy, all_resp, all_angle, all_oct, all_desc, all_valid = [], [], [], [], [], []
    for lvl, (img_l, budget, scale) in enumerate(zip(levels, budgets, scales)):
        yx, resp, angle, desc, valid = _extract_level(img_l, lvl, budget, config)
        xy_f = yx.astype(jnp.float32)
        if config.subpixel_refine:
            from orb_slam2_commit_tpu.ops import subpix

            xy_f = xy_f + subpix.corner_subpix_offsets(img_l, yx)
        xy0 = xy_f[:, ::-1] * jnp.float32(scale)
        all_xy.append(xy0)
        all_resp.append(resp.astype(jnp.float32))
        all_angle.append(angle.astype(jnp.float32))
        all_oct.append(jnp.full((budget,), lvl, dtype=jnp.int32))
        all_desc.append(desc)
        all_valid.append(valid)

    return Features(
        xy=jnp.concatenate(all_xy, axis=0),
        response=jnp.concatenate(all_resp, axis=0),
        angle=jnp.concatenate(all_angle, axis=0),
        octave=jnp.concatenate(all_oct, axis=0),
        desc=jnp.concatenate(all_desc, axis=0),
        valid=jnp.concatenate(all_valid, axis=0),
    )


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def extract_features_jit(
    image: jnp.ndarray, config: ORBConfig, height: int, width: int
) -> Features:
    return extract_features(image, config, height, width)
