"""Reprojection residuals + analytic Jacobians for bundle adjustment.

TPU-native replacement for g2o's edge types (reference:
Thirdparty/g2o/g2o/types/types_six_dof_expmap.h:59-202): EdgeSE3ProjectXYZ
(mono, 2D), EdgeStereoSE3ProjectXYZ (3D: u_l, v, u_r) and their OnlyPose
variants — all as one batched function over observations.

Conventions (matching g2o so the math cross-checks):
- Pose is Tcw = (R, t): P_cam = R @ X_world + t.
- Residual e = observed - projected.
- Pose tangent delta = [omega(3), upsilon(3)], applied as
  T <- exp(delta) * T (g2o SE3Quat::exp left-update, se3quat.h oplusImpl).
  Hence dP/d_upsilon = I, dP/d_omega = -hat(P).
- Mono observations embed as (u, v, 0) with a zero third-row weight; stereo
  as (u_l, v, u_r). One kernel covers both.

Robust loss: Huber with per-observation delta (sqrt(5.991) mono,
sqrt(7.815) stereo — reference: src/Optimizer.cc:96-97,434-439).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

CHI2_MONO = 5.991
CHI2_STEREO = 7.815


class BAObservations(NamedTuple):
    """Flat observation table (padded, masked).

    cam_idx   [O] int32 — index into the pose arrays
    pt_idx    [O] int32 — index into the point array
    uvr       [O, 3] float — (u, v, u_right); u_right ignored for mono
    inv_sigma2[O] float — per-observation information (octave-scaled)
    is_stereo [O] bool
    valid     [O] bool
    """

    cam_idx: jnp.ndarray
    pt_idx: jnp.ndarray
    uvr: jnp.ndarray
    inv_sigma2: jnp.ndarray
    is_stereo: jnp.ndarray
    valid: jnp.ndarray


def project_with_jacobians(
    R: jnp.ndarray,
    t: jnp.ndarray,
    X: jnp.ndarray,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    bf: float,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched projection + Jacobians.

    R [O, 3, 3], t [O, 3], X [O, 3] (world points) — one row per observation
    (gather poses/points before calling).

    Returns:
      pred [O, 3]   — (u, v, u_r)
      J_pose [O, 3, 6] — d e / d [omega, upsilon]  (e = obs - pred)
      J_point [O, 3, 3] — d e / d X_world
      z [O] — camera-frame depth (for cheirality gates)
    """
    P = jnp.einsum("oij,oj->oi", R, X) + t
    x, y, z = P[:, 0], P[:, 1], P[:, 2]
    zs = jnp.where(jnp.abs(z) > 1e-9, z, 1e-9)
    inv_z = 1.0 / zs
    inv_z2 = inv_z * inv_z

    u = fx * x * inv_z + cx
    v = fy * y * inv_z + cy
    ur = u - bf * inv_z
    pred = jnp.stack([u, v, ur], axis=-1)

    # A = d proj / d P_cam, rows (u, v, u_r).
    zero = jnp.zeros_like(x)
    A = jnp.stack(
        [
            jnp.stack([fx * inv_z, zero, -fx * x * inv_z2], axis=-1),
            jnp.stack([zero, fy * inv_z, -fy * y * inv_z2], axis=-1),
            jnp.stack(
                [fx * inv_z, zero, -fx * x * inv_z2 + bf * inv_z2], axis=-1
            ),
        ],
        axis=-2,
    )  # [O, 3, 3]

    # dP/d_omega = -hat(P); dP/d_upsilon = I.
    hatP = jnp.zeros((P.shape[0], 3, 3), P.dtype)
    hatP = hatP.at[:, 0, 1].set(-z).at[:, 0, 2].set(y)
    hatP = hatP.at[:, 1, 0].set(z).at[:, 1, 2].set(-x)
    hatP = hatP.at[:, 2, 0].set(-y).at[:, 2, 1].set(x)

    # e = obs - pred  =>  J = -A @ dP/d(delta).
    J_omega = A @ hatP           # -A @ (-hatP)
    J_upsilon = -A               # -A @ I
    J_pose = jnp.concatenate([J_omega, J_upsilon], axis=-1)  # [O, 3, 6]
    J_point = -jnp.einsum("oab,obc->oac", A, R)              # [O, 3, 3]
    return pred, J_pose, J_point, z


def residuals_and_weights(
    pred: jnp.ndarray,
    z: jnp.ndarray,
    obs: BAObservations,
    use_robust: jnp.ndarray | bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Residual e [O, 3], per-row weight matrix diag w [O, 3], chi2 [O].

    chi2 = inv_sigma2 * ||e||^2 over the active rows (2 for mono, 3 stereo)
    — the statistic the reference gates on (src/Optimizer.cc:434-467).
    The combined weight folds information + Huber: w = inv_sigma2 * rho'.
    Rows behind the camera get weight 0 (depth-positivity gate,
    src/Optimizer.cc:780: e->isDepthPositive()).
    """
    e = obs.uvr - pred
    row_mask = jnp.stack(
        [
            jnp.ones_like(z),
            jnp.ones_like(z),
            obs.is_stereo.astype(z.dtype),
        ],
        axis=-1,
    )
    e = e * row_mask
    chi2 = obs.inv_sigma2 * jnp.sum(e * e, axis=-1)

    delta2 = jnp.where(obs.is_stereo, CHI2_STEREO, CHI2_MONO)
    # Huber on the chi2 statistic: rho' = min(1, delta/sqrt(chi2)).
    sqrt_chi2 = jnp.sqrt(jnp.maximum(chi2, 1e-12))
    huber = jnp.minimum(1.0, jnp.sqrt(delta2) / sqrt_chi2)
    huber = jnp.where(jnp.asarray(use_robust), huber, 1.0)

    w = obs.inv_sigma2 * huber
    w = jnp.where(obs.valid & (z > 0), w, 0.0)
    weights = w[:, None] * row_mask
    return e, weights, chi2
