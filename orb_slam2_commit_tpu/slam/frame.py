"""Per-image measurement bundle (host-side view of device extraction).

TPU-native replacement for Frame (reference: src/Frame.cc): the image is
pushed through the jitted ORB extractor once; keypoints are undistorted;
everything else is fixed-shape numpy mirrors used by the host pipeline and
re-uploaded as needed by the jitted matchers/optimizers.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np

from orb_slam2_commit_tpu.ops import camera as cam_ops
from orb_slam2_commit_tpu.ops import extractor as ext
from orb_slam2_commit_tpu.utils.config import SLAMConfig
from orb_slam2_commit_tpu.utils.rotation import orthonormalize_rotation


@dataclasses.dataclass
class Frame:
    frame_id: int
    timestamp: float
    # Feature arrays, padded to config.orb feature budget N.
    xy: np.ndarray          # [N, 2] undistorted keypoint coords
    xy_raw: np.ndarray      # [N, 2] raw (distorted) coords
    octave: np.ndarray      # [N] int32
    angle: np.ndarray       # [N] float32
    response: np.ndarray    # [N] float32
    desc: np.ndarray        # [N, 8] uint32
    valid: np.ndarray       # [N] bool
    # Stereo / RGB-D channels (<= 0 where absent).
    depth: np.ndarray       # [N]
    ur: np.ndarray          # [N] right-image u coordinate (-1 if none)
    # Pose Tcw (None until tracked).
    R: Optional[np.ndarray] = None
    t: Optional[np.ndarray] = None
    # Map-point binding per feature (-1 none).
    point_ids: Optional[np.ndarray] = None
    # Trajectory entry recorded for this frame (set by the tracker): the
    # relative pose to its reference keyframe, used to RE-ANCHOR the pose
    # when the map moves under BA/loop corrections (reference:
    # Tracking::UpdateLastFrame, src/Tracking.cc:971-980).
    anchor: Optional[object] = None
    # Device-resident packed feature matrix + descriptor table from the
    # fused frontend (jit_frontend packed layout). Downstream fused
    # stages (fused local-map tracking) consume these directly instead of
    # re-uploading host mirrors — zero-copy frame reuse on device.
    dev_feat: Optional[object] = None
    dev_desc: Optional[object] = None

    def __post_init__(self):
        if self.point_ids is None:
            self.point_ids = np.full(self.xy.shape[0], -1, np.int32)

    @property
    def n(self) -> int:
        return self.xy.shape[0]

    def n_tracked(self) -> int:
        return int((self.point_ids >= 0).sum())

    def set_pose(self, R: np.ndarray, t: np.ndarray) -> None:
        self.R = orthonormalize_rotation(np.asarray(R, np.float64))
        self.t = np.asarray(t, np.float64)

    def camera_center(self) -> np.ndarray:
        return -self.R.T @ self.t


def make_frame(
    image: np.ndarray,
    frame_id: int,
    timestamp: float,
    config: SLAMConfig,
    depth_image: Optional[np.ndarray] = None,
) -> Frame:
    """Extract ORB features on device and build the host Frame.

    For RGB-D input, per-feature depth is read from depth_image at the raw
    keypoint location and a virtual right coordinate ur = u - bf/z is
    synthesized (oracle: Frame::ComputeStereoFromRGBD, src/Frame.cc:791-816).
    """
    cam = config.camera
    feats = ext.extract_features_jit(
        jnp.asarray(image), config.orb, cam.height, cam.width
    )
    xy_raw = np.asarray(feats.xy, np.float64)
    valid = np.asarray(feats.valid)
    xy_und = np.asarray(
        cam_ops.undistort_pixels(jnp.asarray(xy_raw), cam), np.float64
    )

    n = xy_raw.shape[0]
    depth = np.full(n, -1.0, np.float32)
    ur = np.full(n, -1.0, np.float32)
    if depth_image is not None:
        u = np.clip(np.round(xy_raw[:, 0]).astype(int), 0, cam.width - 1)
        v = np.clip(np.round(xy_raw[:, 1]).astype(int), 0, cam.height - 1)
        d = depth_image[v, u].astype(np.float32)
        if cam.depth_map_factor not in (0.0, 1.0):
            d = d / cam.depth_map_factor
        has = d > 0
        depth = np.where(has, d, -1.0).astype(np.float32)
        with np.errstate(divide="ignore", invalid="ignore"):
            ur_v = xy_und[:, 0] - cam.bf / np.where(has, d, 1.0)
        ur = np.where(has, ur_v, -1.0).astype(np.float32)

    return Frame(
        frame_id=frame_id,
        timestamp=timestamp,
        xy=xy_und,
        xy_raw=xy_raw,
        octave=np.asarray(feats.octave),
        angle=np.asarray(feats.angle, np.float32),
        response=np.asarray(feats.response, np.float32),
        desc=np.asarray(feats.desc),
        valid=valid,
        depth=depth,
        ur=ur,
    )


def make_stereo_frame(
    image_left: np.ndarray,
    image_right: np.ndarray,
    frame_id: int,
    timestamp: float,
    config: SLAMConfig,
) -> Frame:
    """Stereo frame: joint extraction + epipolar matching in one jitted
    graph (oracle: the stereo Frame ctor, src/Frame.cc:39-124, with
    ComputeStereoMatches :547-788)."""
    from orb_slam2_commit_tpu.ops import stereo as stereo_ops

    cam = config.camera
    feats_l, _, match = stereo_ops.stereo_frontend_jit(
        jnp.asarray(image_left),
        jnp.asarray(image_right),
        config.orb, cam.height, cam.width, cam.bf, cam.baseline,
    )
    xy_raw = np.asarray(feats_l.xy, np.float64)
    xy_und = np.asarray(
        cam_ops.undistort_pixels(jnp.asarray(xy_raw), cam), np.float64
    )
    return Frame(
        frame_id=frame_id,
        timestamp=timestamp,
        xy=xy_und,
        xy_raw=xy_raw,
        octave=np.asarray(feats_l.octave),
        angle=np.asarray(feats_l.angle, np.float32),
        response=np.asarray(feats_l.response, np.float32),
        desc=np.asarray(feats_l.desc),
        valid=np.asarray(feats_l.valid),
        depth=np.asarray(match.depth, np.float32),
        ur=np.asarray(match.u_right, np.float32),
    )
