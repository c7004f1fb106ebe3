"""Dataset loaders: TUM RGB-D, KITTI odometry, EuRoC MAV.

TPU-native replacement for the reference's example drivers' loading code
(reference: Examples/Monocular/mono_tum.cc LoadImages :137-163,
mono_kitti.cc, mono_euroc.cc, Stereo/stereo_kitti.cc, stereo_euroc.cc
:55-98 online rectification, RGB-D/rgbd_tum.cc associations parsing).

Images load lazily as float32 grayscale via imageio/PIL when available;
everything else (timestamps, file lists, associations, rectification
parameters) is plain parsing.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Iterator, List, Optional, Tuple

import numpy as np


def _load_gray(path: str) -> np.ndarray:
    """Load an image as grayscale [H, W].

    8-bit sources stay uint8 so the host->device upload moves 1
    byte/pixel (the extraction graphs cast to f32 in-graph, matching the
    reference's 8-bit grayscale input, src/Tracking.cc:246-259); 16-bit
    sources (TUM depth PNGs) come back float32.
    """
    try:
        from PIL import Image

        img = np.asarray(Image.open(path))
    except ImportError:  # pragma: no cover - PIL is in the image
        import imageio.v3 as iio

        img = iio.imread(path)
    if img.ndim == 3:
        gray = (
            0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
        )
        if img.dtype == np.uint8:
            # cvtColor-style rounding back to 8-bit.
            return np.clip(np.round(gray), 0, 255).astype(np.uint8)
        return gray.astype(np.float32)
    if img.dtype == np.uint8:
        return img
    return img.astype(np.float32)


@dataclasses.dataclass
class Sequence:
    """Lazy frame sequence."""

    timestamps: List[float]
    rgb_paths: List[str]
    depth_paths: Optional[List[str]] = None
    right_paths: Optional[List[str]] = None

    def __len__(self) -> int:
        return len(self.timestamps)

    def frames(self) -> Iterator[Tuple[float, np.ndarray, Optional[np.ndarray]]]:
        for i in range(len(self.timestamps)):
            img = _load_gray(self.rgb_paths[i])
            aux = None
            if self.depth_paths is not None:
                aux = _load_gray(self.depth_paths[i])
            elif self.right_paths is not None:
                aux = _load_gray(self.right_paths[i])
            yield self.timestamps[i], img, aux


def load_tum_mono(root: str) -> Sequence:
    """Parse rgb.txt (oracle: mono_tum.cc LoadImages :137-163)."""
    ts, paths = [], []
    with open(os.path.join(root, "rgb.txt")) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            t, rel = line.split()[:2]
            ts.append(float(t))
            paths.append(os.path.join(root, rel))
    return Sequence(ts, paths)


def load_tum_rgbd(root: str, associations: str) -> Sequence:
    """Parse an associations file of `t1 rgb t2 depth` rows
    (oracle: rgbd_tum.cc LoadImages :140-167)."""
    ts, rgb, depth = [], [], []
    with open(associations) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            ts.append(float(parts[0]))
            rgb.append(os.path.join(root, parts[1]))
            depth.append(os.path.join(root, parts[3]))
    return Sequence(ts, rgb, depth_paths=depth)


def load_kitti(root: str, stereo: bool = False) -> Sequence:
    """Parse times.txt + image_0/image_1 dirs
    (oracle: mono_kitti.cc LoadImages :135-157, stereo_kitti.cc)."""
    ts = []
    with open(os.path.join(root, "times.txt")) as f:
        for line in f:
            if line.strip():
                ts.append(float(line))
    left_dir = os.path.join(root, "image_0")
    left = [
        os.path.join(left_dir, f"{i:06d}.png") for i in range(len(ts))
    ]
    right = None
    if stereo:
        right_dir = os.path.join(root, "image_1")
        right = [
            os.path.join(right_dir, f"{i:06d}.png") for i in range(len(ts))
        ]
    return Sequence(ts, left, right_paths=right)


def load_euroc(root: str, timestamp_file: Optional[str] = None,
               stereo: bool = False) -> Sequence:
    """EuRoC mav0 layout: cam0/data.csv timestamps (ns) + cam0/data/*.png
    (oracle: mono_euroc.cc LoadImages :134-156)."""
    cam0 = os.path.join(root, "mav0", "cam0")
    ts, left = [], []
    with open(os.path.join(cam0, "data.csv")) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            stamp = line.split(",")[0]
            ts.append(float(stamp) * 1e-9)
            left.append(os.path.join(cam0, "data", stamp + ".png"))
    right = None
    if stereo:
        cam1 = os.path.join(root, "mav0", "cam1")
        right = [
            p.replace(cam0, cam1) for p in left
        ]
    return Sequence(ts, left, right_paths=right)


# ---------------------------------------------------------------------------
# Stereo rectification (oracle: stereo_euroc.cc:55-98 —
# initUndistortRectifyMap + per-frame remap)
# ---------------------------------------------------------------------------


def rectify_maps(
    K: np.ndarray, D: np.ndarray, R: np.ndarray, P: np.ndarray,
    width: int, height: int,
):
    """Build undistort+rectify sampling maps (map_x, map_y) like
    cv::initUndistortRectifyMap for a radial-tangential model."""
    ys, xs = np.mgrid[0:height, 0:width].astype(np.float64)
    # Rectified pixel -> normalized rectified ray.
    fx_p, fy_p = P[0, 0], P[1, 1]
    cx_p, cy_p = P[0, 2], P[1, 2]
    xn = (xs - cx_p) / fx_p
    yn = (ys - cy_p) / fy_p
    ones = np.ones_like(xn)
    rays = np.stack([xn, yn, ones], axis=-1) @ R  # R^-1 applied: ray in cam
    x = rays[..., 0] / rays[..., 2]
    y = rays[..., 1] / rays[..., 2]
    # Distort.
    k1, k2, p1, p2 = D[0], D[1], D[2], D[3]
    k3 = D[4] if D.shape[0] > 4 else 0.0
    r2 = x * x + y * y
    radial = 1 + k1 * r2 + k2 * r2 ** 2 + k3 * r2 ** 3
    xd = x * radial + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
    yd = y * radial + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
    map_x = (K[0, 0] * xd + K[0, 2]).astype(np.float32)
    map_y = (K[1, 1] * yd + K[1, 2]).astype(np.float32)
    return map_x, map_y


def remap_bilinear(img: np.ndarray, map_x: np.ndarray, map_y: np.ndarray
                   ) -> np.ndarray:
    """cv::remap INTER_LINEAR equivalent."""
    h, w = img.shape
    x0 = np.clip(np.floor(map_x).astype(int), 0, w - 2)
    y0 = np.clip(np.floor(map_y).astype(int), 0, h - 2)
    fx = np.clip(map_x - x0, 0.0, 1.0)
    fy = np.clip(map_y - y0, 0.0, 1.0)
    out = (
        img[y0, x0] * (1 - fx) * (1 - fy)
        + img[y0, x0 + 1] * fx * (1 - fy)
        + img[y0 + 1, x0] * (1 - fx) * fy
        + img[y0 + 1, x0 + 1] * fx * fy
    )
    invalid = (
        (map_x < 0) | (map_x > w - 1) | (map_y < 0) | (map_y > h - 1)
    )
    out = np.where(invalid, 0.0, out)
    if img.dtype == np.uint8:
        # cv::remap on CV_8U rounds back to 8-bit (keeps the uint8
        # upload path through rectified stereo).
        return np.clip(np.round(out), 0, 255).astype(np.uint8)
    return out.astype(np.float32)
