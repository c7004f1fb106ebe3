"""Bundle adjustment with Schur-complement marginalization of points.

TPU-native replacement for g2o's BlockSolver + LM stack as used by
Optimizer::LocalBundleAdjustment / BundleAdjustment (reference:
src/Optimizer.cc:530-885, :41-284; Thirdparty/g2o/g2o/core/block_solver.h).

The reference builds a pointer hypergraph and marginalizes 3x3 point blocks
with sparse Schur. Here the whole problem is dense fixed-shape arrays:

  Hcc [K, 6, 6]   camera diagonal blocks   (segment-sum over observations)
  Hpp [P, 3, 3]   point diagonal blocks    (segment-sum)
  Hcp [K, Pc, 6, 3] camera-point blocks, built in point-chunks Pc
  S = Hcc - sum_p Hcp Hpp^-1 Hpc           (chunked einsum -> dense [6K, 6K])
  S dc = -(g_c - Hcp Hpp^-1 g_p)           (Cholesky solve)
  dp = -Hpp^-1 (g_p + Hpc dc)              (back-substitution)

All matmul-shaped work lands on the MXU; scatter-adds are XLA segment sums.
Levenberg-Marquardt accept/reject runs inside one jitted fori_loop. Fixed
poses (gauge anchors / second-ring keyframes, src/Optimizer.cc:87,:618-631)
simply get zeroed Jacobians.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from orb_slam2_commit_tpu.ops import lie
from orb_slam2_commit_tpu.optim import residuals as res
from orb_slam2_commit_tpu.optim.residuals import BAObservations, CHI2_MONO, CHI2_STEREO


class BAProblem(NamedTuple):
    """Fixed-shape BA problem. K poses, P points, O observations."""

    R: jnp.ndarray          # [K, 3, 3] Tcw rotations
    t: jnp.ndarray          # [K, 3]
    fixed: jnp.ndarray      # [K] bool — poses held constant
    points: jnp.ndarray     # [P, 3]
    point_valid: jnp.ndarray  # [P] bool
    obs: BAObservations


class BAResult(NamedTuple):
    R: jnp.ndarray
    t: jnp.ndarray
    points: jnp.ndarray
    chi2: jnp.ndarray       # [O] final per-observation chi2
    inlier: jnp.ndarray     # [O] chi2 <= threshold & positive depth
    cost: jnp.ndarray


def _evaluate(problem: BAProblem, cam_params, use_robust, active):
    fx, fy, cx, cy, bf = cam_params
    obs = problem.obs
    Ro = problem.R[obs.cam_idx]
    to = problem.t[obs.cam_idx]
    Xo = problem.points[obs.pt_idx]
    pred, J_pose, J_point, z = res.project_with_jacobians(
        Ro, to, Xo, fx, fy, cx, cy, bf
    )
    masked = obs._replace(valid=active)
    e, w, chi2 = res.residuals_and_weights(pred, z, masked, use_robust)
    # Fixed cameras and invalid points contribute no derivative blocks.
    J_pose = jnp.where(problem.fixed[obs.cam_idx, None, None], 0.0, J_pose)
    J_point = jnp.where(
        problem.point_valid[obs.pt_idx, None, None], J_point, 0.0
    )
    return e, w, chi2, J_pose, J_point, z


def _robust_total_cost(chi2, delta2, active, use_robust):
    sqrt_c = jnp.sqrt(jnp.maximum(chi2, 1e-12))
    delta = jnp.sqrt(delta2)
    rho = jnp.where(chi2 <= delta2, chi2, 2.0 * delta * sqrt_c - delta2)
    rho = jnp.where(jnp.asarray(use_robust), rho, chi2)
    return jnp.sum(jnp.where(active, rho, 0.0))


def _inv3x3(M: jnp.ndarray) -> jnp.ndarray:
    """Batched closed-form 3x3 inverse (adjugate / det)."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = c * h - b * i
    C = b * f - c * e
    D = f * g - d * i
    E = a * i - c * g
    F = c * d - a * f
    G = d * h - e * g
    H = b * g - a * h
    I = a * e - b * d
    det = a * A + b * D + c * G
    det = jnp.where(jnp.abs(det) > 1e-12, det, 1e-12)
    adj = jnp.stack(
        [
            jnp.stack([A, B, C], axis=-1),
            jnp.stack([D, E, F], axis=-1),
            jnp.stack([G, H, I], axis=-1),
        ],
        axis=-2,
    )
    return adj / det[..., None, None]


class _SegSums(NamedTuple):
    """Segment-reduction plans for the two observation axes.

    TPU scatter-adds with unsorted indices are ~3x slower than sorted
    ones (they serialize on collisions); the observation->camera and
    observation->point index sets never change during a solve, so the
    sort permutations are computed ONCE per bundle_adjust call and every
    segment reduction becomes gather + sorted segment_sum.

    use_sorted is a TRACE-TIME constant: above ~384k observations the
    sorted-reduction graph reliably crashes the v5e libtpu worker
    ("TPU worker process crashed", reproduced at O=576k while every
    constituent op succeeds standalone), so very large problems fall
    back to plain unsorted scatter-adds. Revisit when libtpu moves."""

    use_sorted: bool
    cam_idx: jnp.ndarray
    pt_idx: jnp.ndarray
    perm_k: jnp.ndarray     # [O] observation order sorted by cam_idx
    cam_sorted: jnp.ndarray
    perm_p: jnp.ndarray     # [O] observation order sorted by pt_idx
    pt_sorted: jnp.ndarray


_SORTED_REDUCTION_MAX_OBS = 384 * 1024


def _make_segsums(obs: BAObservations) -> _SegSums:
    use_sorted = obs.cam_idx.shape[0] <= _SORTED_REDUCTION_MAX_OBS
    if use_sorted:
        perm_k = jnp.argsort(obs.cam_idx)
        perm_p = jnp.argsort(obs.pt_idx)
        cam_sorted = obs.cam_idx[perm_k]
        pt_sorted = obs.pt_idx[perm_p]
    else:
        perm_k = perm_p = cam_sorted = pt_sorted = obs.cam_idx  # unused
    return _SegSums(
        use_sorted=use_sorted, cam_idx=obs.cam_idx, pt_idx=obs.pt_idx,
        perm_k=perm_k, cam_sorted=cam_sorted,
        perm_p=perm_p, pt_sorted=pt_sorted,
    )


def _sum_to_cams(ss: _SegSums, vals: jnp.ndarray, K: int) -> jnp.ndarray:
    flat = vals.reshape(vals.shape[0], -1)
    if ss.use_sorted:
        out = jax.ops.segment_sum(
            flat[ss.perm_k], ss.cam_sorted, num_segments=K,
            indices_are_sorted=True,
        )
    else:
        out = jnp.zeros((K, flat.shape[1]), flat.dtype).at[ss.cam_idx].add(flat)
    return out.reshape((K,) + vals.shape[1:])


def _sum_to_points(ss: _SegSums, vals: jnp.ndarray, P: int) -> jnp.ndarray:
    flat = vals.reshape(vals.shape[0], -1)
    if ss.use_sorted:
        out = jax.ops.segment_sum(
            flat[ss.perm_p], ss.pt_sorted, num_segments=P,
            indices_are_sorted=True,
        )
    else:
        out = jnp.zeros((P, flat.shape[1]), flat.dtype).at[ss.pt_idx].add(flat)
    return out.reshape((P,) + vals.shape[1:])


def _schur_pcg(Hcc_d, Hpp_inv, Hcp_o, obs, ss, b, fixed, axis_name,
               n_iters: int = 64, tol: float = 1e-8,
               point_sharded: bool = False):
    """Solve S dc = b with S = Hcc_d - W Hpp^-1 W^T WITHOUT materializing
    S or W: the matvec streams over observations (two segment-sums + two
    batched small matmuls), block-Jacobi preconditioned by Hcc_d^-1.

    This is the inexact-step / conjugate-gradients BA formulation
    ("Bundle Adjustment in the Large" — implicit Schur), which is the
    TPU-scalable shape: the explicit dense Schur is O(K^2 P) to build,
    while each CG iteration here is O(O) segment-sum bandwidth. Under
    observation sharding (axis_name), partial segment-sums are psum'd,
    so the matvec — and therefore the whole solve — is replicated-exact
    across devices.

    point_sharded: points (and every observation of each point) live on
    exactly one device — the point-side segment-sum u is complete locally
    and must NOT be psum'd; only the [K, 6] camera-side vector y2 rides
    the interconnect. One psum of 24K bytes per CG iteration, independent
    of P and O — the scalable communication shape."""
    K = Hcc_d.shape[0]
    P = Hpp_inv.shape[0]
    dtype = b.dtype

    def S_mv(x):                      # x [K, 6]
        y = jnp.einsum("kab,kb->ka", Hcc_d, x)
        xo = x[obs.cam_idx]           # [O, 6]
        u = _sum_to_points(ss, jnp.einsum("oab,oa->ob", Hcp_o, xo), P)
        if axis_name is not None and not point_sharded:
            u = jax.lax.psum(u, axis_name)
        v = jnp.einsum("pab,pb->pa", Hpp_inv, u)
        vo = v[obs.pt_idx]
        y2 = _sum_to_cams(ss, jnp.einsum("oab,ob->oa", Hcp_o, vo), K)
        if axis_name is not None:
            y2 = jax.lax.psum(y2, axis_name)
        return y - y2

    M_inv = jnp.linalg.inv(Hcc_d)     # [K, 6, 6] block-Jacobi preconditioner

    def precond(r):
        return jnp.einsum("kab,kb->ka", M_inv, r)

    x0 = jnp.zeros_like(b)
    r0 = b                             # S x0 = 0
    z0 = precond(r0)
    p0 = z0
    rz0 = jnp.sum(r0 * z0)
    b_norm2 = jnp.maximum(jnp.sum(b * b), 1e-30)

    def cond(state):
        i, x, r, z, p, rz = state
        return (i < n_iters) & (jnp.sum(r * r) > tol * b_norm2)

    def body(state):
        i, x, r, z, p, rz = state
        Sp = S_mv(p)
        denom = jnp.sum(p * Sp)
        alpha = rz / jnp.where(jnp.abs(denom) > 1e-30, denom, 1e-30)
        x = x + alpha * p
        r = r - alpha * Sp
        z = precond(r)
        rz_new = jnp.sum(r * z)
        beta = rz_new / jnp.where(jnp.abs(rz) > 1e-30, rz, 1e-30)
        p = z + beta * p
        return i + 1, x, r, z, p, rz_new

    _, x, _, _, _, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), x0, r0, z0, p0, rz0)
    )
    return jnp.where(fixed[:, None], 0.0, x)


def _solve_step(problem: BAProblem, cam_params, use_robust, active, lam,
                point_chunk: int, axis_name=None, solver: str = "dense",
                ss: _SegSums | None = None, point_sharded: bool = False):
    """One damped Gauss-Newton step. Returns (delta_c [K,6], delta_p [P,3])."""
    K = problem.R.shape[0]
    P = problem.points.shape[0]
    obs = problem.obs
    dtype = problem.points.dtype
    if ss is None:
        ss = _make_segsums(obs)

    e, w, chi2, Jc, Jp, z = _evaluate(problem, cam_params, use_robust, active)
    Jc_w = Jc * w[..., None]
    Jp_w = Jp * w[..., None]

    # Diagonal blocks + gradients via sorted segment reductions (see
    # _SegSums). When running sharded (observations split across devices,
    # axis_name set), each device assembles its shard's partial blocks and
    # the full blocks are reduced over ICI with psum — the distributed
    # Schur-BA scheme of SURVEY.md §2.4 P4.
    Hcc = _sum_to_cams(ss, jnp.einsum("ora,orb->oab", Jc_w, Jc), K)
    Hpp = _sum_to_points(ss, jnp.einsum("ora,orb->oab", Jp_w, Jp), P)
    g_c = _sum_to_cams(ss, jnp.einsum("ora,or->oa", Jc_w, e), K)
    g_p = _sum_to_points(ss, jnp.einsum("ora,or->oa", Jp_w, e), P)
    if axis_name is not None:
        Hcc = jax.lax.psum(Hcc, axis_name)
        g_c = jax.lax.psum(g_c, axis_name)
        if not point_sharded:
            # Observation-sharded, points replicated: point-side partial
            # sums span devices. Point-sharded: every observation of a
            # point is local, Hpp/g_p are complete as-is.
            Hpp = jax.lax.psum(Hpp, axis_name)
            g_p = jax.lax.psum(g_p, axis_name)

    # LM damping (diagonal scaling) + tiny Tikhonov for rank-safety.
    eye6 = jnp.eye(6, dtype=dtype)
    eye3 = jnp.eye(3, dtype=dtype)
    Hcc_d = Hcc + lam * Hcc * eye6 + 1e-8 * eye6
    Hpp_d = Hpp + lam * Hpp * eye3 + 1e-8 * eye3
    # Cameras with no active observations (fixed or unconnected) get an
    # identity block so the dense solve stays well-conditioned; their
    # gradient is zero, so their update is exactly zero.
    cam_unused = jnp.abs(Hcc).sum(axis=(1, 2)) == 0
    Hcc_d = jnp.where(cam_unused[:, None, None], eye6, Hcc_d)
    Hpp_inv = _inv3x3(Hpp_d)

    # Per-observation camera-point cross blocks.
    Hcp_o = jnp.einsum("ora,orb->oab", Jc_w, Jp)  # [O, 6, 3]

    if solver == "pcg":
        # Implicit Schur + preconditioned CG: never materialize S. The
        # reduced-gradient right-hand side b = g_c - W Hpp^-1 g_p streams
        # over observations the same way the matvec does.
        v = jnp.einsum("pab,pb->pa", Hpp_inv, g_p)          # [P, 3]
        vo = v[obs.pt_idx]
        b_corr = _sum_to_cams(ss, jnp.einsum("oab,ob->oa", Hcp_o, vo), K)
        if axis_name is not None:
            b_corr = jax.lax.psum(b_corr, axis_name)
        b_s = g_c - b_corr
        # Same sign convention as the dense path: delta_c = -S^-1 b_s.
        delta_c = _schur_pcg(
            Hcc_d, Hpp_inv, Hcp_o, obs, ss, -b_s, problem.fixed, axis_name,
            point_sharded=point_sharded,
        )
        dc_per_obs = delta_c[obs.cam_idx]
        Hpc_dc = _sum_to_points(
            ss, jnp.einsum("oab,oa->ob", Hcp_o, dc_per_obs), P
        )
        if axis_name is not None and not point_sharded:
            Hpc_dc = jax.lax.psum(Hpc_dc, axis_name)
        delta_p = -jnp.einsum("pab,pb->pa", Hpp_inv, g_p + Hpc_dc)
        delta_p = jnp.where(problem.point_valid[:, None], delta_p, 0.0)
        return delta_c, delta_p

    # Chunked Schur reduction over points; S starts as the (damped) camera
    # block diagonal. Pad the point-side arrays to a whole number of chunks
    # so dynamic_slice never clamps into a misaligned window.
    n_chunks = -(-P // point_chunk)
    pad = n_chunks * point_chunk - P
    Hpp_inv_p = jnp.pad(Hpp_inv, ((0, pad), (0, 0), (0, 0)))
    g_p_pad = jnp.pad(g_p, ((0, pad), (0, 0)))

    # Sharded case: cross-device observation pairs of the same point must
    # appear in the Schur correction, so the scattered W blocks are psum'd
    # over the observation axis before the W Hpp^-1 W^T product.
    def chunk_body(ci, carry):
        S_corr, b_corr = carry
        lo = ci * point_chunk
        in_chunk = (obs.pt_idx >= lo) & (obs.pt_idx < lo + point_chunk)
        local_p = jnp.clip(obs.pt_idx - lo, 0, point_chunk - 1)
        contrib = jnp.where(in_chunk[:, None, None], Hcp_o, 0.0)
        W = jnp.zeros((K, point_chunk, 6, 3), dtype).at[
            obs.cam_idx, local_p
        ].add(contrib)
        if axis_name is not None:
            W = jax.lax.psum(W, axis_name)
        Hpp_inv_chunk = jax.lax.dynamic_slice(
            Hpp_inv_p, (lo, 0, 0), (point_chunk, 3, 3)
        )
        g_p_chunk = jax.lax.dynamic_slice(g_p_pad, (lo, 0), (point_chunk, 3))
        Y = jnp.einsum("kpab,pbc->kpac", W, Hpp_inv_chunk)
        S_corr = S_corr + jnp.einsum("kpac,lpdc->kald", Y, W)
        b_corr = b_corr + jnp.einsum("kpac,pc->ka", Y, g_p_chunk)
        return S_corr, b_corr

    S_corr, b_corr = jax.lax.fori_loop(
        0,
        n_chunks,
        chunk_body,
        (jnp.zeros((K, 6, K, 6), dtype), jnp.zeros((K, 6), dtype)),
    )

    ar = jnp.arange(K)
    S = (-S_corr).at[ar, :, ar, :].add(Hcc_d)
    b_s = g_c - b_corr

    Smat = S.reshape(K * 6, K * 6)
    delta_c = -jnp.linalg.solve(Smat, b_s.reshape(K * 6)).reshape(K, 6)
    delta_c = jnp.where(problem.fixed[:, None], 0.0, delta_c)

    # Back-substitute points: dp = -Hpp^-1 (g_p + Hpc dc).
    dc_per_obs = delta_c[obs.cam_idx]  # [O, 6]
    Hpc_dc = _sum_to_points(
        ss, jnp.einsum("oab,oa->ob", Hcp_o, dc_per_obs), P
    )
    if axis_name is not None:
        Hpc_dc = jax.lax.psum(Hpc_dc, axis_name)
    delta_p = -jnp.einsum("pab,pb->pa", Hpp_inv, g_p + Hpc_dc)
    delta_p = jnp.where(problem.point_valid[:, None], delta_p, 0.0)
    return delta_c, delta_p


def _apply_step(problem: BAProblem, delta_c, delta_p) -> BAProblem:
    dR, dt = lie.se3_exp(delta_c)
    R_new = dR @ problem.R
    t_new = jnp.einsum("kij,kj->ki", dR, problem.t) + dt
    return problem._replace(
        R=R_new, t=t_new, points=problem.points + delta_p
    )


def bundle_adjust(
    problem: BAProblem,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    bf: float,
    n_iters: int = 10,
    use_robust: bool = True,
    point_chunk: int = 1024,
    lam0: float = 1e-4,
    axis_name: str | None = None,
    solver: str = "auto",
    point_sharded: bool = False,
) -> Tuple[BAProblem, BAResult]:
    """Run n_iters of LM. Returns the updated problem + diagnostics.

    With axis_name set (inside shard_map over an observation-sharded mesh
    axis), partial Hessian blocks are psum'd so every device takes the same
    globally-consistent step — the distributed BA of SURVEY.md §2.4 P4.

    point_sharded=True is the scale shape (parallel/distributed_ba
    partition_problem): each device owns a contiguous point range AND all
    observations of those points; Hpp / Hpp_inv / g_p / delta_p and every
    point-side segment-sum stay sharded (per-device point memory and
    compute are 1/n_devices), and only [K, 6]-shaped camera vectors are
    psum'd. Forces the pcg solver (the dense Schur materializes a
    replicated [6K, 6K], which is exactly what this mode exists to avoid).

    solver: "dense" materializes the Schur complement and Cholesky-solves
    it (exact; right for local-BA-sized problems), "pcg" runs implicit
    Schur + preconditioned CG (the map-scale formulation: building dense S
    is O(K^2 P), a CG iteration is O(O) — and in float32 the
    short-recurrence preconditioned iteration is also more robust than an
    f32 LU of the dense S). "auto" switches to pcg at K >= 64; verified
    against a full-dense oracle to 3e-5 (dense path to 2e-14).
    """
    if point_sharded:
        solver = "pcg"
    elif solver == "auto":
        solver = "pcg" if problem.R.shape[0] >= 64 else "dense"
    cam_params = (fx, fy, cx, cy, bf)
    obs = problem.obs
    delta2 = jnp.where(obs.is_stereo, CHI2_STEREO, CHI2_MONO)
    active = obs.valid
    point_chunk = min(point_chunk, problem.points.shape[0])

    def cost_of(p: BAProblem):
        _, _, chi2, _, _, z = _evaluate(p, cam_params, use_robust, active)
        c = _robust_total_cost(chi2, delta2, active & (z > 0), use_robust)
        if axis_name is not None:
            c = jax.lax.psum(c, axis_name)
        return c

    def cond(state):
        i, _p, lam, _cost, converged = state
        # g2o-style early termination (see optim/pose_opt.py): identical
        # results, fewer device iterations. The predicate is replicated
        # across mesh shards (cost/steps are psum'd), so every device
        # exits the while_loop on the same iteration.
        return (i < n_iters) & ~converged & (lam < 1e8)

    ss = _make_segsums(problem.obs)   # index sorts: once per call

    def body(state):
        i, p, lam, cost, _conv = state
        delta_c, delta_p = _solve_step(
            p, cam_params, use_robust, active, lam, point_chunk, axis_name,
            solver, ss, point_sharded,
        )
        p_new = _apply_step(p, delta_c, delta_p)
        new_cost = cost_of(p_new)
        accept = new_cost < cost
        dp_sq = jnp.sum(delta_p * delta_p)
        if axis_name is not None and point_sharded:
            # delta_p is a device-local shard; the convergence predicate
            # must agree across devices, so reduce its norm. delta_c is
            # already replicated (the PCG solve psums its matvecs).
            dp_sq = jax.lax.psum(dp_sq, axis_name)
        step_sq = jnp.sum(delta_c * delta_c) + dp_sq
        # Dtype-aware convergence floor (see optim/pose_opt.py): 1e-16 is
        # unreachable in float32, where LM stalls near |delta| ~ 1e-6.
        step_eps = 1e-16 if problem.points.dtype == jnp.float64 else 1e-10
        converged = accept & (step_sq < step_eps)
        p_out = jax.tree.map(
            lambda a, b: jnp.where(accept, b, a), p, p_new
        )
        lam = jnp.where(accept, lam * 0.5, lam * 4.0)
        cost = jnp.where(accept, new_cost, cost)
        return i + 1, p_out, lam, cost, converged

    lam = jnp.asarray(lam0, problem.points.dtype)
    cost = cost_of(problem)
    _, problem, lam, cost, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), problem, lam, cost, jnp.asarray(False))
    )

    _, _, chi2, _, _, z = _evaluate(problem, cam_params, use_robust, active)
    inlier = active & (chi2 <= delta2) & (z > 0)
    return problem, BAResult(
        R=problem.R,
        t=problem.t,
        points=problem.points,
        chi2=chi2,
        inlier=inlier,
        cost=cost,
    )


bundle_adjust_jit = jax.jit(
    bundle_adjust,
    static_argnames=(
        "fx", "fy", "cx", "cy", "bf", "n_iters", "use_robust",
        "point_chunk", "lam0", "axis_name", "solver", "point_sharded",
    ),
)


def local_bundle_adjust(
    problem: BAProblem,
    fx: float, fy: float, cx: float, cy: float, bf: float,
    first_iters: int = 5,
    second_iters: int = 10,
    point_chunk: int = 1024,
) -> Tuple[BAProblem, BAResult]:
    """The reference's two-stage local BA (src/Optimizer.cc:737-782):
    5 robust iterations, drop chi2 outliers / negative depths, 10 more
    non-robust iterations. Returns final problem + classification (the host
    erases observations flagged !inlier, :838-861)."""
    problem, r1 = bundle_adjust_jit(
        problem, fx, fy, cx, cy, bf, n_iters=first_iters,
        use_robust=True, point_chunk=point_chunk,
    )
    pruned_obs = problem.obs._replace(valid=r1.inlier)
    problem = problem._replace(obs=pruned_obs)
    problem, r2 = bundle_adjust_jit(
        problem, fx, fy, cx, cy, bf, n_iters=second_iters,
        use_robust=False, point_chunk=point_chunk,
    )
    return problem, r2
