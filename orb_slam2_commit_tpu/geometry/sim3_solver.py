"""Sim(3) estimation: Horn closed form + batched RANSAC.

TPU-native replacement for Sim3Solver (reference: src/Sim3Solver.cc): the
loop-closure relative transform between two keyframes from matched map
points, computed in closed form (Horn 1987 absolute orientation; the
reference's quaternion eigen-decomposition :264-393 is equivalent to the
SVD form used here), wrapped in a vmapped 3-point RANSAC with mutual
reprojection inlier checks (:396-422, chi2 9.21 * sigma^2).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


def horn_sim3(
    x1: jnp.ndarray, x2: jnp.ndarray, fix_scale: bool = False,
    weights: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Closed-form similarity x1 ~ s * R @ x2 + t from paired 3D points.

    x1, x2: [n, 3] (camera-frame map points of KF1/KF2, reference
    :264-393). fix_scale=True for stereo/RGB-D (reference :48,:310-321
    freezes s = 1). Optional 0/1 weights select a subset without reshaping.
    """
    if weights is None:
        weights = jnp.ones(x1.shape[0], x1.dtype)
    wsum = jnp.maximum(jnp.sum(weights), 1e-9)
    c1 = jnp.sum(x1 * weights[:, None], axis=0) / wsum
    c2 = jnp.sum(x2 * weights[:, None], axis=0) / wsum
    y1 = (x1 - c1) * weights[:, None]
    y2 = (x2 - c2) * weights[:, None]

    H = y1.T @ y2                      # [3, 3] correlation
    U, D, Vt = jnp.linalg.svd(H)
    d = jnp.linalg.det(U @ Vt)
    S = jnp.diag(jnp.array([1.0, 1.0, 1.0], H.dtype).at[2].set(d))
    R = U @ S @ Vt

    # Symmetric scale (Horn): s = sqrt(sum|y1|^2 / sum|y2|^2) — the
    # reference uses the asymmetric trace form; both agree at the optimum.
    n1 = jnp.sum(y1 * y1)
    n2 = jnp.sum(y2 * y2)
    s = jnp.sqrt(n1 / jnp.maximum(n2, 1e-12))
    s = jnp.where(jnp.asarray(fix_scale), 1.0, s)

    t = c1 - s * R @ c2
    return s, R, t


class Sim3RansacResult(NamedTuple):
    ok: jnp.ndarray
    s12: jnp.ndarray
    R12: jnp.ndarray
    t12: jnp.ndarray
    inliers: jnp.ndarray
    n_inliers: jnp.ndarray


def sim3_ransac(
    key: jnp.ndarray,
    x1: jnp.ndarray,            # [n, 3] points in KF1 camera frame
    x2: jnp.ndarray,            # [n, 3] matched points in KF2 camera frame
    valid: jnp.ndarray,         # [n]
    uv1: jnp.ndarray,           # [n, 2] observed pixels in image 1
    uv2: jnp.ndarray,           # [n, 2] observed pixels in image 2
    sigma2_1: jnp.ndarray,      # [n] octave sigma^2 in image 1
    sigma2_2: jnp.ndarray,      # [n]
    fx: float, fy: float, cx: float, cy: float,
    fix_scale: bool = False,
    n_iters: int = 128,
    min_inliers: int = 20,
    chi2: float = 9.21,
) -> Sim3RansacResult:
    """Batched 3-point Sim3 RANSAC (oracle: Sim3Solver::iterate,
    src/Sim3Solver.cc:153-239 + CheckInliers :396-422)."""
    n = x1.shape[0]
    p = valid.astype(jnp.float32)
    p = p / jnp.maximum(jnp.sum(p), 1.0)
    keys = jax.random.split(key, n_iters)

    def project(x):
        z = jnp.where(jnp.abs(x[:, 2]) > 1e-9, x[:, 2], 1e-9)
        return jnp.stack(
            [fx * x[:, 0] / z + cx, fy * x[:, 1] / z + cy], axis=-1
        )

    def count_inliers(s, R, t):
        # x2 mapped into camera 1 and projected; x1 mapped into camera 2.
        x2_in_1 = s * x2 @ R.T + t
        s_inv = 1.0 / s
        x1_in_2 = s_inv * (x1 - t) @ R
        e1 = jnp.sum((project(x2_in_1) - uv1) ** 2, axis=1)
        e2 = jnp.sum((project(x1_in_2) - uv2) ** 2, axis=1)
        return valid & (e1 < chi2 * sigma2_1) & (e2 < chi2 * sigma2_2)

    def one_round(k):
        idx = jax.random.choice(k, n, shape=(3,), replace=False, p=p)
        s, R, t = horn_sim3(x1[idx], x2[idx], fix_scale)
        inl = count_inliers(s, R, t)
        return s, R, t, jnp.sum(inl)

    ss, Rs, ts, counts = jax.vmap(one_round)(keys)
    best = jnp.argmax(counts)
    s_b, R_b, t_b = ss[best], Rs[best], ts[best]

    # Refit on the consensus set (weighted Horn) and re-count.
    inl0 = count_inliers(s_b, R_b, t_b)
    s_r, R_r, t_r = horn_sim3(x1, x2, fix_scale, weights=inl0.astype(x1.dtype))
    inl_r = count_inliers(s_r, R_r, t_r)
    use_refit = jnp.sum(inl_r) >= jnp.sum(inl0)
    s_f = jnp.where(use_refit, s_r, s_b)
    R_f = jnp.where(use_refit, R_r, R_b)
    t_f = jnp.where(use_refit, t_r, t_b)
    inl_f = jnp.where(use_refit, inl_r, inl0)

    return Sim3RansacResult(
        ok=jnp.sum(inl_f) >= min_inliers,
        s12=s_f, R12=R_f, t12=t_f,
        inliers=inl_f, n_inliers=jnp.sum(inl_f),
    )


sim3_ransac_jit = jax.jit(
    sim3_ransac,
    static_argnames=(
        "fx", "fy", "cx", "cy", "fix_scale", "n_iters", "min_inliers", "chi2"
    ),
)
