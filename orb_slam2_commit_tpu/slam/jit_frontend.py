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
