"""Sim3 refinement: single 7-dof vertex LM with paired projection edges.

TPU-native replacement for Optimizer::OptimizeSim3 (reference:
src/Optimizer.cc:1220-1456): refine the loop relative transform S12 by
minimizing forward (points of KF2 projected into image 1 through S12) and
inverse (points of KF1 into image 2 through S12^-1) reprojection errors
with Huber kernels, with a two-stage solve that drops chi2 > 10 outliers
between stages (:1381-1419).

Jacobians come from jax.jacfwd over the 7-dim tangent — the problem is a
single small vertex, so autodiff costs nothing and stays exactly in sync
with the residual definition.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from orb_slam2_commit_tpu.ops import lie
from orb_slam2_commit_tpu.optim import linalg

CHI2_SIM3 = 9.995  # reference th2 = 10 (src/Optimizer.cc:1386)


class Sim3OptResult(NamedTuple):
    s12: jnp.ndarray
    R12: jnp.ndarray
    t12: jnp.ndarray
    inliers: jnp.ndarray
    n_inliers: jnp.ndarray


def _residuals(
    s, R, t, x1, x2, uv1, uv2, fx, fy, cx, cy
):
    """Stacked forward/backward reprojection residuals [n, 4]."""

    def project(x):
        z = jnp.where(jnp.abs(x[:, 2]) > 1e-9, x[:, 2], 1e-9)
        return jnp.stack(
            [fx * x[:, 0] / z + cx, fy * x[:, 1] / z + cy], axis=-1
        )

    x2_in_1 = s * x2 @ R.T + t
    x1_in_2 = (1.0 / s) * (x1 - t) @ R
    e1 = uv1 - project(x2_in_1)
    e2 = uv2 - project(x1_in_2)
    return jnp.concatenate([e1, e2], axis=-1)  # [n, 4]


def optimize_sim3(
    s0: jnp.ndarray, R0: jnp.ndarray, t0: jnp.ndarray,
    x1: jnp.ndarray, x2: jnp.ndarray,
    uv1: jnp.ndarray, uv2: jnp.ndarray,
    inv_sigma2_1: jnp.ndarray, inv_sigma2_2: jnp.ndarray,
    valid: jnp.ndarray,
    fx: float, fy: float, cx: float, cy: float,
    fix_scale: bool = False,
    n_iters: int = 10,
) -> Sim3OptResult:
    """LM on the sim3 tangent with chi2 gating between two stages."""

    def run_stage(s, R, t, active, iters):
        def chi2_of(s_, R_, t_):
            e = _residuals(s_, R_, t_, x1, x2, uv1, uv2, fx, fy, cx, cy)
            c1 = inv_sigma2_1 * jnp.sum(e[:, :2] ** 2, axis=1)
            c2 = inv_sigma2_2 * jnp.sum(e[:, 2:] ** 2, axis=1)
            return c1, c2

        def cost_of(s_, R_, t_):
            c1, c2 = chi2_of(s_, R_, t_)
            return jnp.sum(jnp.where(active, c1 + c2, 0.0))

        def body(_, state):
            s_, R_, t_, lam, cost = state

            def res_of_delta(delta):
                ds, dR, dt = lie.sim3_exp(delta)
                s_n = ds * s_
                R_n = dR @ R_
                t_n = ds * dR @ t_ + dt
                e = _residuals(s_n, R_n, t_n, x1, x2, uv1, uv2, fx, fy, cx, cy)
                w1 = jnp.sqrt(inv_sigma2_1 * active)
                w2 = jnp.sqrt(inv_sigma2_2 * active)
                return jnp.concatenate(
                    [e[:, :2] * w1[:, None], e[:, 2:] * w2[:, None]], axis=1
                ).reshape(-1)

            zero = jnp.zeros(7, x1.dtype)
            r0 = res_of_delta(zero)
            J = jax.jacfwd(res_of_delta)(zero)       # [4n, 7]
            H = J.T @ J
            g = J.T @ r0
            if fix_scale:
                # Freeze the sigma component.
                H = H.at[6, :].set(0.0).at[:, 6].set(0.0).at[6, 6].set(1.0)
                g = g.at[6].set(0.0)
            H_lm = H + lam * jnp.diag(jnp.diag(H)) + 1e-9 * jnp.eye(7, dtype=H.dtype)
            delta = -linalg.chol_solve_spd(H_lm, g)
            ds, dR, dt = lie.sim3_exp(delta)
            s_n = ds * s_
            R_n = dR @ R_
            t_n = ds * dR @ t_ + dt
            new_cost = cost_of(s_n, R_n, t_n)
            accept = new_cost < cost
            s_ = jnp.where(accept, s_n, s_)
            R_ = jnp.where(accept, R_n, R_)
            t_ = jnp.where(accept, t_n, t_)
            lam = jnp.where(accept, lam * 0.5, lam * 4.0)
            cost = jnp.where(accept, new_cost, cost)
            return s_, R_, t_, lam, cost

        lam0 = jnp.asarray(1e-3, x1.dtype)
        s, R, t, _, _ = jax.lax.fori_loop(
            0, iters, body, (s, R, t, lam0, cost_of(s, R, t))
        )
        c1, c2 = chi2_of(s, R, t)
        inl = valid & (c1 <= CHI2_SIM3) & (c2 <= CHI2_SIM3)
        return s, R, t, inl

    s, R, t, inl = run_stage(s0, R0, t0, valid.astype(x1.dtype), n_iters // 2)
    s, R, t, inl = run_stage(s, R, t, inl.astype(x1.dtype), n_iters)
    return Sim3OptResult(
        s12=s, R12=R, t12=t, inliers=inl, n_inliers=jnp.sum(inl)
    )


optimize_sim3_jit = jax.jit(
    optimize_sim3,
    static_argnames=("fx", "fy", "cx", "cy", "fix_scale", "n_iters"),
)
