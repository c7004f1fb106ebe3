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


def _extract_level(
    image: jnp.ndarray,
    level: int,
    budget: int,
    config: ORBConfig,
) -> Tuple[jnp.ndarray, ...]:
    """FAST + selection + orientation + descriptors for one pyramid level."""
    if descriptors.use_patch_route():
        # Fused Pallas level kernel: blur + both FAST score maps in one
        # HBM pass; per-keypoint stages via the Pallas patch kernel.
        from orb_slam2_commit_tpu.ops import pallas_level

        blurred, s_hi, s_lo = pallas_level.level_preprocess(
            image, float(config.ini_th_fast), float(config.min_th_fast)
        )
        score = fast.combine_two_threshold(s_hi, s_lo, config.cell_size)
    else:
        score = fast.two_threshold_scores(
            image,
            float(config.ini_th_fast),
            float(config.min_th_fast),
            config.cell_size,
        )
        blurred = pyramid.gaussian_blur(image)
    # The reference detects inside a border of EDGE_THRESHOLD-3 = 16 px
    # (src/ORBextractor.cc:822-825); descriptor sampling needs the blur +
    # patch margin anyway.
    border = config.edge_threshold - 3
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
    """
    shapes = config.level_shapes(height, width)
    levels = pyramid.build_pyramid(image, shapes)
    budgets = config.features_per_level()
    scales = config.scale_factors()

    all_xy, all_resp, all_angle, all_oct, all_desc, all_valid = [], [], [], [], [], []
    for lvl, (img_l, budget, scale) in enumerate(zip(levels, budgets, scales)):
        yx, resp, angle, desc, valid = _extract_level(img_l, lvl, budget, config)
        xy0 = yx[:, ::-1].astype(jnp.float32) * jnp.float32(scale)
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
