"""Batched gradient-based subpixel corner refinement.

The reference keeps FAST corners at integer pixel coordinates
(src/ORBextractor.cc:818-946 — no refinement step; its only subpixel
estimate is the stereo SAD parabola, src/Frame.cc:663-746). Integer
corners put a ±0.5 px floor on every reprojection residual, which at
two-view-initialization geometry (depth z, baseline b) becomes a
z^2/(f*b) * 0.5 px depth error on every new map point — the dominant
error source measured on the synthetic sequences (scripts/diag_drift.py).

This module adds the standard gradient-orthogonality refinement
(cv::cornerSubPix): the subpixel corner c solves

    sum_i w_i (g_i g_i^T) (x_i - c) = 0

over a small window — each pixel's intensity gradient g_i should be
orthogonal to (x_i - c) at a corner/saddle. Batched over all keypoints
as one [N, w^2] einsum chain; a few fixed iterations re-center the
Gaussian weights. Offsets are trust-clamped to +-1 px and zeroed where
the 2x2 normal matrix is near-singular (edge/flat neighborhoods).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HALF = 3          # window radius (7x7)
ITERS = 2
MAX_OFFSET = 1.0  # trust region, px


def _gather_window(image: jnp.ndarray, yc, xc, half: int) -> jnp.ndarray:
    h, w = image.shape
    d = jnp.arange(-half, half + 1)
    ys = jnp.clip(yc[:, None] + d[None, :], 0, h - 1)
    xs = jnp.clip(xc[:, None] + d[None, :], 0, w - 1)
    flat = ys[:, :, None] * w + xs[:, None, :]
    return jnp.take(image.reshape(-1), flat.reshape(-1)).reshape(
        -1, 2 * half + 1, 2 * half + 1
    )


def corner_subpix_offsets(image: jnp.ndarray, yx: jnp.ndarray) -> jnp.ndarray:
    """Subpixel offsets [N, 2] (dy, dx) f32 for integer corners yx [N, 2].

    The caller adds the offsets to the reported keypoint coordinates;
    descriptor/orientation sampling stays at the integer location (same
    convention as the reference's stereo subpixel: measurement refined,
    patch grid unchanged)."""
    # Window + 1 px halo so central differences cover the full window.
    win = _gather_window(
        image.astype(jnp.float32), yx[:, 0], yx[:, 1], HALF + 1
    )                                                    # [N, S+2, S+2]
    return offsets_from_windows(win)


def corner_subpix_from_patches(
    patches: jnp.ndarray, center_y: int, center_x: int
) -> jnp.ndarray:
    """Same refinement from pre-gathered per-keypoint patches
    [N, >=2*(HALF+1)+1, ...] whose keypoint sits at (center_y, center_x)
    — lets the TPU route reuse the orientation stage's Pallas patch
    gather instead of paying a second (slow XLA) gather."""
    r = HALF + 1
    win = patches[
        :, center_y - r:center_y + r + 1, center_x - r:center_x + r + 1
    ]
    return offsets_from_windows(win)


def offsets_from_windows(win: jnp.ndarray) -> jnp.ndarray:
    """Core solve on [N, S+2, S+2] windows (S = 2*HALF+1; +1 px halo for
    the central differences)."""
    gy = 0.5 * (win[:, 2:, 1:-1] - win[:, :-2, 1:-1])    # [N, S, S]
    gx = 0.5 * (win[:, 1:-1, 2:] - win[:, 1:-1, :-2])

    s = 2 * HALF + 1
    d = jnp.arange(-HALF, HALF + 1, dtype=jnp.float32)
    px = jnp.broadcast_to(d[None, :], (s, s)).reshape(-1)     # x offsets
    py = jnp.broadcast_to(d[:, None], (s, s)).reshape(-1)     # y offsets
    gxx_all = (gx * gx).reshape(-1, s * s)
    gyy_all = (gy * gy).reshape(-1, s * s)
    gxy_all = (gx * gy).reshape(-1, s * s)

    cy = jnp.zeros(win.shape[0], jnp.float32)
    cx = jnp.zeros(win.shape[0], jnp.float32)
    sigma2 = jnp.float32(HALF * HALF)
    for _ in range(ITERS):
        # Gaussian weights centered at the current estimate.
        wgt = jnp.exp(
            -((px[None] - cx[:, None]) ** 2 + (py[None] - cy[:, None]) ** 2)
            / (2.0 * sigma2)
        )
        a = jnp.sum(wgt * gxx_all, axis=1)     # [N] Gxx
        b = jnp.sum(wgt * gxy_all, axis=1)     # Gxy
        c = jnp.sum(wgt * gyy_all, axis=1)     # Gyy
        bx = jnp.sum(wgt * (gxx_all * px[None] + gxy_all * py[None]), axis=1)
        by = jnp.sum(wgt * (gxy_all * px[None] + gyy_all * py[None]), axis=1)
        det = a * c - b * b
        ok = det > 1e-6 * jnp.maximum(a + c, 1e-12) ** 2
        det_safe = jnp.where(ok, det, 1.0)
        nx = (c * bx - b * by) / det_safe
        ny = (a * by - b * bx) / det_safe
        cx = jnp.where(ok, jnp.clip(nx, -MAX_OFFSET, MAX_OFFSET), cx)
        cy = jnp.where(ok, jnp.clip(ny, -MAX_OFFSET, MAX_OFFSET), cy)

    return jnp.stack([cy, cx], axis=-1)


# ---------------------------------------------------------------------------
# Pallas TPU route: one kernel over pre-gathered patches
# ---------------------------------------------------------------------------

_BLOCK = 128  # keypoints per grid instance


def _subpix_kernel(win_ref, out_ref):
    """Refinement for one block of flattened windows [B, >=81] (row-major
    (S+2)x(S+2) interior in the first 81 lanes), entirely in VMEM.

    Same math and element ordering as offsets_from_windows; strictly 2D
    shapes throughout (Mosaic rejects the 3D formulation's layouts).
    """
    from jax import lax

    w = win_ref[:, :]
    s = 2 * HALF + 1
    sp = s + 2   # 9: window + halo
    # Row-major interior gradients, unrolled over the 7 interior rows.
    gx_rows, gy_rows = [], []
    for r in range(1, sp - 1):
        row = w[:, sp * r:sp * r + sp]
        gx_rows.append(0.5 * (row[:, 2:] - row[:, :-2]))
        up = w[:, sp * (r - 1) + 1:sp * (r - 1) + sp - 1]
        dn = w[:, sp * (r + 1) + 1:sp * (r + 1) + sp - 1]
        gy_rows.append(0.5 * (dn - up))
    gx = jnp.concatenate(gx_rows, axis=1)    # [B, 49]
    gy = jnp.concatenate(gy_rows, axis=1)

    n2 = s * s
    ii = lax.broadcasted_iota(jnp.int32, (1, n2), 1)
    px = (ii % s).astype(jnp.float32) - jnp.float32(HALF)
    py = (ii // s).astype(jnp.float32) - jnp.float32(HALF)
    gxx = gx * gx
    gyy = gy * gy
    gxy = gx * gy

    b = w.shape[0]
    cy = jnp.zeros((b, 1), jnp.float32)
    cx = jnp.zeros((b, 1), jnp.float32)
    sigma2 = jnp.float32(HALF * HALF)
    for _ in range(ITERS):
        wgt = jnp.exp(-((px - cx) ** 2 + (py - cy) ** 2) / (2.0 * sigma2))
        a = jnp.sum(wgt * gxx, axis=1, keepdims=True)
        bb = jnp.sum(wgt * gxy, axis=1, keepdims=True)
        c = jnp.sum(wgt * gyy, axis=1, keepdims=True)
        bx = jnp.sum(wgt * (gxx * px + gxy * py), axis=1, keepdims=True)
        by = jnp.sum(wgt * (gxy * px + gyy * py), axis=1, keepdims=True)
        det = a * c - bb * bb
        ok = det > 1e-6 * jnp.maximum(a + c, 1e-12) ** 2
        det_safe = jnp.where(ok, det, 1.0)
        nx = (c * bx - bb * by) / det_safe
        ny = (a * by - bb * bx) / det_safe
        cx = jnp.where(ok, jnp.clip(nx, -MAX_OFFSET, MAX_OFFSET), cx)
        cy = jnp.where(ok, jnp.clip(ny, -MAX_OFFSET, MAX_OFFSET), cy)

    lane = out_ref.shape[1]
    out_ref[:, :] = jnp.concatenate(
        [cy, cx, jnp.zeros((b, lane - 2), jnp.float32)], axis=1
    )


@functools.partial(
    jax.jit, static_argnames=("center_y", "center_x", "interpret")
)
def corner_subpix_from_patches_pallas(
    patches: jnp.ndarray,     # [K, rows, lanes] from pallas_patches
    center_y: int,
    center_x: int,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Pallas twin of corner_subpix_from_patches: ~15 small XLA kernels
    become ONE pass over flattened refinement windows (sliced out of the
    already-gathered patch array by XLA)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    r = HALF + 1
    k = patches.shape[0]
    sp = 2 * r + 1
    win = patches[
        :, center_y - r:center_y + r + 1, center_x - r:center_x + r + 1
    ].astype(jnp.float32).reshape(k, sp * sp)
    kp = ((max(k, 1) + _BLOCK - 1) // _BLOCK) * _BLOCK
    x = jnp.pad(win, ((0, kp - k), (0, 128 - sp * sp)))
    out = pl.pallas_call(
        _subpix_kernel,
        grid=(kp // _BLOCK,),
        in_specs=[
            pl.BlockSpec((_BLOCK, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BLOCK, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((kp, 128), jnp.float32),
        interpret=interpret,
    )(x)
    return out[:k, :2]
