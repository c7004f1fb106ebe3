"""Augmented-reality anchoring: plane detection in the sparse map + virtual
object overlay on tracked frames.

TPU-native counterpart of the reference's MonoAR node
(Examples/ROS/ORB_SLAM2/src/AR/ViewerAR.h — the only AR source in the
snapshot; it declares Plane detection from tracked MapPoints via RANSAC
[`ViewerAR::DetectPlane`], a plane pose [`Plane::Recompute`], and GL cube /
plane-grid drawing [`ViewerAR::DrawCube/DrawPlane`], rendered over the
live camera image). Here:

  * plane fitting is a BATCHED RANSAC — all hypotheses evaluated in one
    jitted call (3-point minimal sets, cross-product normals, distance
    test against a scene-scaled threshold), followed by an SVD refit on
    the winning consensus set;
  * the virtual cube is projected with the tracker's current pose and
    rasterized into the frame overlay by the headless viewer utilities
    (no Pangolin/GL dependency).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class PlaneFit(NamedTuple):
    normal: jnp.ndarray    # [3] unit normal (world)
    offset: jnp.ndarray    # scalar d: n.x + d = 0 on the plane
    centroid: jnp.ndarray  # [3] centroid of consensus points
    n_inliers: jnp.ndarray
    inliers: jnp.ndarray   # [N] bool


@functools.partial(jax.jit, static_argnames=("n_iters",))
def fit_plane_ransac(
    points: jnp.ndarray,     # [N, 3]
    valid: jnp.ndarray,      # [N] bool
    key: jax.Array,
    n_iters: int = 128,
    rel_threshold: float = 0.02,
) -> PlaneFit:
    """Dominant-plane RANSAC over the map-point cloud.

    Distance threshold is rel_threshold x the scene scale (median distance
    of valid points to their centroid), so the fit is invariant to the
    monocular map's arbitrary scale — mirroring the reference's practice
    of scaling AR geometry by map units (ViewerAR.h Plane uses the map's
    own units for the cube size).
    """
    n = points.shape[0]
    pts = points.astype(jnp.float32)
    w = valid.astype(jnp.float32)
    centroid_all = jnp.sum(pts * w[:, None], axis=0) / jnp.maximum(jnp.sum(w), 1.0)
    dist_c = jnp.linalg.norm(pts - centroid_all, axis=-1)
    big = jnp.max(jnp.where(valid, dist_c, 0.0)) + 1.0
    scale = jnp.median(jnp.where(valid, dist_c, big))
    th = rel_threshold * scale

    idx = jax.random.randint(key, (n_iters, 3), 0, n)
    p0 = pts[idx[:, 0]]
    p1 = pts[idx[:, 1]]
    p2 = pts[idx[:, 2]]
    nrm = jnp.cross(p1 - p0, p2 - p0)                      # [I, 3]
    nn = jnp.linalg.norm(nrm, axis=-1, keepdims=True)
    ok = (
        (nn[:, 0] > 1e-9)
        & valid[idx[:, 0]] & valid[idx[:, 1]] & valid[idx[:, 2]]
    )
    nrm = nrm / jnp.maximum(nn, 1e-12)
    d = -jnp.sum(nrm * p0, axis=-1)                        # [I]

    dist = jnp.abs(pts @ nrm.T + d[None, :])               # [N, I]
    inl = (dist < th) & valid[:, None]
    score = jnp.where(ok, jnp.sum(inl, axis=0), 0)
    best = jnp.argmax(score)
    best_inl = inl[:, best]

    # SVD refit on the consensus set: normal = singular vector of the
    # centered covariance with the smallest singular value.
    wb = best_inl.astype(jnp.float32)
    m = jnp.sum(wb)
    c = jnp.sum(pts * wb[:, None], axis=0) / jnp.maximum(m, 1.0)
    x = (pts - c) * wb[:, None]
    cov = x.T @ x / jnp.maximum(m, 1.0)
    _, vecs = jnp.linalg.eigh(cov)
    n_fit = vecs[:, 0]
    n_fit = n_fit / jnp.maximum(jnp.linalg.norm(n_fit), 1e-12)
    d_fit = -jnp.dot(n_fit, c)
    # Final classification with the refit plane.
    dist_fit = jnp.abs(pts @ n_fit + d_fit)
    inl_fit = (dist_fit < th) & valid
    return PlaneFit(
        normal=n_fit,
        offset=d_fit,
        centroid=c,
        n_inliers=jnp.sum(inl_fit),
        inliers=inl_fit,
    )


def plane_frame(normal: np.ndarray, centroid: np.ndarray,
                cam_center: np.ndarray) -> np.ndarray:
    """Twp [4, 4]: plane-anchored frame (origin at the consensus centroid,
    z along the normal flipped to face the camera) — the role of
    Plane::Recompute's Tpw in the reference (inverted convention here)."""
    n = np.asarray(normal, np.float64)
    n = n / np.linalg.norm(n)
    to_cam = np.asarray(cam_center, np.float64) - np.asarray(centroid, np.float64)
    if np.dot(n, to_cam) < 0:
        n = -n
    a = np.array([1.0, 0.0, 0.0]) if abs(n[0]) < 0.9 else np.array([0.0, 1.0, 0.0])
    x = np.cross(a, n)
    x /= np.linalg.norm(x)
    y = np.cross(n, x)
    Twp = np.eye(4)
    Twp[:3, 0] = x
    Twp[:3, 1] = y
    Twp[:3, 2] = n
    Twp[:3, 3] = np.asarray(centroid, np.float64)
    return Twp


def cube_vertices(size: float) -> np.ndarray:
    """[8, 3] cube corners in plane coords, base ON the plane (z in [0, s])
    — the reference draws its cube sitting on the detected plane."""
    s = size / 2.0
    base = [(-s, -s, 0), (s, -s, 0), (s, s, 0), (-s, s, 0)]
    top = [(x, y, size) for (x, y, _z) in base]
    return np.array(base + top, np.float64)


CUBE_EDGES = [
    (0, 1), (1, 2), (2, 3), (3, 0),
    (4, 5), (5, 6), (6, 7), (7, 4),
    (0, 4), (1, 5), (2, 6), (3, 7),
]


def _draw_line(canvas: np.ndarray, p0, p1, color) -> None:
    """Clipped integer line (Bresenham-free: dense sampling)."""
    h, w = canvas.shape[:2]
    x0, y0 = p0
    x1, y1 = p1
    n = int(max(abs(x1 - x0), abs(y1 - y0), 1)) * 2
    ts = np.linspace(0.0, 1.0, n)
    xs = np.round(x0 + (x1 - x0) * ts).astype(int)
    ys = np.round(y0 + (y1 - y0) * ts).astype(int)
    keep = (xs >= 0) & (xs < w) & (ys >= 0) & (ys < h)
    canvas[ys[keep], xs[keep]] = color


def draw_cube(
    canvas: np.ndarray,
    R: np.ndarray, t: np.ndarray,            # Tcw
    fx: float, fy: float, cx: float, cy: float,
    Twp: np.ndarray,
    size: float,
    color=(255, 90, 40),
) -> bool:
    """Project the plane-anchored cube with the current pose and draw its
    wireframe into canvas [H, W, 3]. Returns False if behind the camera."""
    verts_p = cube_vertices(size)
    verts_w = (Twp[:3, :3] @ verts_p.T).T + Twp[:3, 3]
    pc = (np.asarray(R) @ verts_w.T).T + np.asarray(t)
    if np.any(pc[:, 2] <= 1e-6):
        return False
    u = fx * pc[:, 0] / pc[:, 2] + cx
    v = fy * pc[:, 1] / pc[:, 2] + cy
    col = np.array(color, np.uint8)
    for i, j in CUBE_EDGES:
        _draw_line(canvas, (u[i], v[i]), (u[j], v[j]), col)
    return True


class ARAnchor:
    """Stateful helper: detect a plane once enough map points exist, then
    keep overlaying the cube (the reference re-detects on user click; we
    re-detect when the inlier count degrades)."""

    def __init__(self, min_points: int = 40, cube_rel_size: float = 0.3,
                 seed: int = 0):
        self.min_points = min_points
        self.cube_rel_size = cube_rel_size
        self.Twp: Optional[np.ndarray] = None
        self.size: float = 0.0
        self._key = jax.random.key(seed)

    def update(self, pt_pos: np.ndarray, pt_valid: np.ndarray,
               cam_center: np.ndarray) -> bool:
        n_valid = int(pt_valid.sum())
        if self.Twp is not None or n_valid < self.min_points:
            return self.Twp is not None
        self._key, sub = jax.random.split(self._key)
        fit = fit_plane_ransac(
            jnp.asarray(pt_pos, jnp.float32), jnp.asarray(pt_valid), sub
        )
        if int(fit.n_inliers) < max(12, n_valid // 5):
            return False
        centroid = np.asarray(fit.centroid)
        self.Twp = plane_frame(np.asarray(fit.normal), centroid, cam_center)
        pts = np.asarray(pt_pos)[np.asarray(fit.inliers)]
        spread = np.median(np.linalg.norm(pts - centroid, axis=-1))
        self.size = float(self.cube_rel_size * 2.0 * spread)
        return True

    def overlay(self, canvas: np.ndarray, R: np.ndarray, t: np.ndarray,
                fx, fy, cx, cy) -> bool:
        if self.Twp is None:
            return False
        return draw_cube(canvas, R, t, fx, fy, cx, cy, self.Twp, self.size)
