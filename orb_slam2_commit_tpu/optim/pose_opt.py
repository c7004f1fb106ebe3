"""Pose-only bundle adjustment (motion-only BA).

TPU-native replacement for Optimizer::PoseOptimization (reference:
src/Optimizer.cc:287-528): unary reprojection edges from the current
frame's matched map points, Huber kernels, 4 rounds x 10 LM iterations
with chi2 inlier reclassification between rounds (5.991 mono / 7.815
stereo) and the robust kernel disabled for the final round
(src/Optimizer.cc:495: it==2 -> setRobustKernel(0)).

Everything is one jitted function: fixed iteration counts, masks instead
of edge levels, a 6x6 solve per LM step.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from orb_slam2_commit_tpu.ops import lie
from orb_slam2_commit_tpu.optim import linalg
from orb_slam2_commit_tpu.optim import residuals as res
from orb_slam2_commit_tpu.optim.residuals import BAObservations, CHI2_MONO, CHI2_STEREO


class PoseOptResult(NamedTuple):
    R: jnp.ndarray
    t: jnp.ndarray
    inliers: jnp.ndarray   # [N] bool — the final chi2 classification
    n_inliers: jnp.ndarray


def _robust_cost(chi2, delta2, active, use_robust):
    """Huber-composed total cost used for LM accept/reject."""
    sqrt_c = jnp.sqrt(jnp.maximum(chi2, 1e-12))
    delta = jnp.sqrt(delta2)
    rho = jnp.where(
        chi2 <= delta2, chi2, 2.0 * delta * sqrt_c - delta2
    )
    rho = jnp.where(jnp.asarray(use_robust), rho, chi2)
    return jnp.sum(jnp.where(active, rho, 0.0))


def _eval(R, t, points, obs, cam_params, use_robust, active):
    fx, fy, cx, cy, bf = cam_params
    O = points.shape[0]
    Rb = jnp.broadcast_to(R, (O, 3, 3))
    tb = jnp.broadcast_to(t, (O, 3))
    pred, J_pose, _, z = res.project_with_jacobians(
        Rb, tb, points, fx, fy, cx, cy, bf
    )
    masked_obs = obs._replace(valid=active)
    e, w, chi2 = res.residuals_and_weights(pred, z, masked_obs, use_robust)
    return e, w, chi2, J_pose, z


def _lm_rounds(
    R0, t0, points, obs, cam_params, active, use_robust, n_iters
):
    """n_iters of Levenberg-Marquardt on the 6-dof pose."""
    delta2 = jnp.where(obs.is_stereo, CHI2_STEREO, CHI2_MONO)

    # Convergence threshold on |delta|^2, dtype-aware: 1e-16 is reachable
    # only in float64 — float32 LM stalls around |delta| ~ 1e-6, so on
    # accelerators (x64 off) the loop would always run its full budget.
    # |delta| < 1e-5 means < f*1e-5 ~ 5e-3 px of reprojection motion:
    # numerically converged at either precision.
    step_eps = 1e-16 if jnp.dtype(R0.dtype) == jnp.float64 else 1e-10

    def full_eval(R, t):
        """Residuals, robust weights, Jacobian AND cost in one pass — the
        LM loop below carries this for the accepted point so each
        iteration evaluates the model exactly once (the textbook loop
        evaluates twice: once for the step, once for the accept test)."""
        e, w, chi2, J, z = _eval(R, t, points, obs, cam_params, use_robust, active)
        cost = _robust_cost(chi2, delta2, active & (z > 0), use_robust)
        return e, w, J, cost

    def cond(state):
        i, _R, _t, lam, _cost, _e, _w, _J, converged = state
        # Early termination, like g2o's LM (stop on negligible update or a
        # fully-stalled damping ladder) — iterations after convergence are
        # numerical no-ops, so skipping them changes nothing but time.
        return (i < n_iters) & ~converged & (lam < 1e8)

    def body(state):
        i, R, t, lam, cost, e, w, J = state[:-1]
        # H = sum J^T diag(w) J; b = sum J^T diag(w) e.
        Jw = J * w[..., None]                       # [O, 3, 6]
        H = jnp.einsum("ora,orb->ab", Jw, J)
        b = jnp.einsum("ora,or->a", Jw, e)
        H_lm = H + lam * jnp.diag(jnp.diag(H)) + 1e-9 * jnp.eye(6, dtype=H.dtype)
        # Unrolled SPD Cholesky fuses into the loop body (LU's pivoted
        # dynamic-slice chain cannot); interleaved A/B on v5e
        # (scripts/ab_pose_solver.py): 2.40 vs 3.87 ms median per
        # standalone pose-BA solve, ~38% faster.
        delta = -linalg.chol_solve_spd(H_lm, b)
        dR, dt = lie.se3_exp(delta)
        R_new = dR @ R
        t_new = dR @ t + dt
        e_new, w_new, J_new, new_cost = full_eval(R_new, t_new)
        accept = new_cost < cost
        converged = accept & (jnp.sum(delta * delta) < step_eps)
        R = jnp.where(accept, R_new, R)
        t = jnp.where(accept, t_new, t)
        lam = jnp.where(accept, lam * 0.5, lam * 4.0)
        cost = jnp.where(accept, new_cost, cost)
        e = jnp.where(accept, e_new, e)
        w = jnp.where(accept, w_new, w)
        J = jnp.where(accept, J_new, J)
        return i + 1, R, t, lam, cost, e, w, J, converged

    lam0 = jnp.asarray(1e-3, R0.dtype)
    e0, w0, J0, cost0 = full_eval(R0, t0)
    state = (jnp.int32(0), R0, t0, lam0, cost0, e0, w0, J0,
             jnp.asarray(False))
    state = jax.lax.while_loop(cond, body, state)
    R, t = state[1], state[2]
    # "Settled" = exited on convergence or a fully-stalled damping ladder
    # (either way further iterations would not move the pose), as opposed
    # to running out of the iteration budget.
    settled = state[-1] | (state[3] >= 1e8)
    return R, t, settled


def pose_optimization(
    R0: jnp.ndarray,
    t0: jnp.ndarray,
    points: jnp.ndarray,
    obs: BAObservations,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    bf: float,
    n_rounds: int = 4,
    iters_per_round: int = 10,
) -> PoseOptResult:
    """Optimize Tcw = (R0, t0) against world points [N, 3].

    obs.cam_idx/pt_idx are ignored (unary edges, one camera); obs.valid is
    the match mask. Mirrors the round structure of src/Optimizer.cc:477-508:
    each round refits on the current inlier set, then reclassifies all
    observations (outliers can return, like g2o level-1 edges whose error
    is recomputed, :489-494).
    """
    from orb_slam2_commit_tpu.optim import pallas_pose_opt

    if pallas_pose_opt.use_pallas_pose_opt():
        return pallas_pose_opt.pose_optimization_pallas(
            R0, t0, points, obs, fx, fy, cx, cy, bf, n_rounds, iters_per_round
        )

    cam_params = (fx, fy, cx, cy, bf)
    delta2 = jnp.where(obs.is_stereo, CHI2_STEREO, CHI2_MONO)

    def run_round(rnd, R, t, active):
        use_robust = rnd < n_rounds - 1
        R, t, settled = _lm_rounds(
            R, t, points, obs, cam_params, active, use_robust, iters_per_round
        )
        _, _, chi2, _, z = _eval(
            R, t, points, obs, cam_params, use_robust, obs.valid
        )
        inl = obs.valid & (chi2 <= delta2) & (z > 0)
        return R, t, inl, settled

    # Round 0 always runs.
    R, t, inliers, settled = run_round(0, R0, t0, obs.valid)
    prev_active = obs.valid
    for rnd in range(1, n_rounds):
        # A round whose active set equals the previous round's AND whose
        # starting pose already settled is a numerical no-op — for
        # inliers (chi2 <= delta2) the Huber cost IS the quadratic cost,
        # so even the robust->plain switch of the last round changes
        # nothing on an unchanged inlier set. lax.cond skips the whole
        # LM loop in that case (the common steady-tracking case: only
        # rounds 0-1 do real work).
        active = inliers
        skip = settled & jnp.all(active == prev_active)
        R, t, inliers, settled = jax.lax.cond(
            skip,
            lambda R, t, a: (R, t, a, jnp.asarray(True)),
            functools.partial(run_round, rnd),
            R, t, active,
        )
        prev_active = active

    return PoseOptResult(R=R, t=t, inliers=inliers, n_inliers=jnp.sum(inliers))


@functools.partial(jax.jit, static_argnums=(4, 5, 6, 7, 8, 9, 10))
def pose_optimization_jit(
    R0, t0, points, obs, fx, fy, cx, cy, bf, n_rounds=4, iters_per_round=10
):
    return pose_optimization(
        R0, t0, points, obs, fx, fy, cx, cy, bf, n_rounds, iters_per_round
    )
