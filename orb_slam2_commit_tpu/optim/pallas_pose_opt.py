"""Pose-only bundle adjustment as ONE Pallas TPU kernel.

The XLA route (optim/pose_opt.py) lowers the 4x10 LM loop to a while_loop
whose body is a handful of small fused kernels; through the remote TPU
runtime each iteration pays kernel-launch gaps, so the whole optimization
costs ~0.9 ms despite trivial FLOPs (~1000 observations). This kernel runs
the ENTIRE optimization — every LM iteration of every chi2 round, the 6x6
Cholesky solves, the SE3 exponentials and the final inlier classification —
inside one kernel launch: all observation planes live in VMEM ([N/128, 128]
f32 tiles) and the LM state is scalar registers.

Same math as pose_opt.pose_optimization (oracle:
Optimizer::PoseOptimization, reference src/Optimizer.cc:287-528): Huber
weights at chi2 5.991/7.815, depth-positivity gate, single-eval LM with
accept/reject damping, early exit on convergence/stall, robust kernel off
in the last round.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from orb_slam2_commit_tpu.optim.residuals import CHI2_MONO, CHI2_STEREO

LANE = 128


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def use_pallas_pose_opt() -> bool:
    """Route pose-only BA through the single-kernel Pallas LM.

    Opt-in only (ORB_TPU_POSE_LM=1). Measured on TPU v5e: the fused XLA
    while_loop runs the same optimization in ~2.2 ms standalone / ~0.9 ms
    overlapped, while this kernel takes ~25 ms — the 6x6 Cholesky, SE3
    exponential and LM bookkeeping are scalar-sequential and Mosaic
    executes them orders of magnitude slower than the VPU planes. Kept as
    a correct, tested baseline for a future vectorized-scalar redesign."""
    return os.environ.get("ORB_TPU_POSE_LM") == "1"


# ---------------------------------------------------------------------------
# Scalar SE3 helpers (tuples of traced scalars — no tiny-matrix ops, which
# Mosaic cannot tile)
# ---------------------------------------------------------------------------


def _rot_like(ka, kb, w0, w1, w2, theta2):
    """(1 - kb*theta^2) I + kb w w^T + ka [w]x  as 9 scalars (row-major).

    With (ka, kb) = (sin/theta, (1-cos)/theta^2) this is Rodrigues;
    with ((1-cos)/theta^2, (theta-sin)/theta^3) it is the SO3 left
    Jacobian. Uses W^2 = w w^T - theta^2 I.
    """
    r00 = 1.0 - kb * (w1 * w1 + w2 * w2)
    r11 = 1.0 - kb * (w0 * w0 + w2 * w2)
    r22 = 1.0 - kb * (w0 * w0 + w1 * w1)
    r01 = kb * w0 * w1 - ka * w2
    r10 = kb * w0 * w1 + ka * w2
    r02 = kb * w0 * w2 + ka * w1
    r20 = kb * w0 * w2 - ka * w1
    r12 = kb * w1 * w2 - ka * w0
    r21 = kb * w1 * w2 + ka * w0
    return (r00, r01, r02, r10, r11, r12, r20, r21, r22)


def _se3_exp_scalar(d):
    """exp of [omega, upsilon] (6 scalars) -> (R 9 scalars, t 3 scalars).

    Matches ops/lie.se3_exp: R = Rodrigues(omega), t = J_left(omega) @ v."""
    w0, w1, w2, v0, v1, v2 = d
    theta2 = w0 * w0 + w1 * w1 + w2 * w2
    theta = jnp.sqrt(theta2 + 1e-16)
    small = theta2 < 1e-8
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(
        small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / (theta2 + 1e-16)
    )
    c = jnp.where(
        small,
        1.0 / 6.0 - theta2 / 120.0,
        (theta - jnp.sin(theta)) / (theta2 * theta + 1e-16),
    )
    R = _rot_like(a, b, w0, w1, w2, theta2)
    J = _rot_like(b, c, w0, w1, w2, theta2)
    t0 = J[0] * v0 + J[1] * v1 + J[2] * v2
    t1 = J[3] * v0 + J[4] * v1 + J[5] * v2
    t2 = J[6] * v0 + J[7] * v1 + J[8] * v2
    return R, (t0, t1, t2)


def _mat33_mul(A, B):
    """Row-major 9-scalar 3x3 products."""
    out = []
    for i in range(3):
        for j in range(3):
            out.append(
                A[3 * i + 0] * B[0 + j]
                + A[3 * i + 1] * B[3 + j]
                + A[3 * i + 2] * B[6 + j]
            )
    return tuple(out)


def _mat33_vec(A, v):
    return (
        A[0] * v[0] + A[1] * v[1] + A[2] * v[2],
        A[3] * v[0] + A[4] * v[1] + A[5] * v[2],
        A[6] * v[0] + A[7] * v[1] + A[8] * v[2],
    )


def _chol_solve6(H, b):
    """Solve (6x6 SPD) x = b via unrolled scalar Cholesky.

    H: list of 6 lists of 6 scalars; b: list of 6 scalars."""
    L = [[None] * 6 for _ in range(6)]
    for i in range(6):
        for j in range(i + 1):
            s = H[i][j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][i] = jnp.sqrt(jnp.maximum(s, 1e-20))
            else:
                L[i][j] = s / L[j][j]
    # Forward: L y = b
    y = [None] * 6
    for i in range(6):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    # Backward: L^T x = y
    x = [None] * 6
    for i in reversed(range(6)):
        s = y[i]
        for k in range(i + 1, 6):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return x


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------


def _pose_lm_kernel(
    scal_ref,      # SMEM (17,) f32: fx fy cx cy bf R0(9 row-major) t0(3)
    xx_ref, xy_ref, xz_ref,          # [Nr, 128] world points
    u_ref, v_ref, r_ref,             # observed (u, v, u_right)
    info_ref,                        # inv_sigma2
    st_ref,                          # is_stereo as f32 0/1
    valid_ref,                       # valid as f32 0/1
    pose_out,                        # [8, 128] f32: R in [0,0:9], t in [0,9:12]
    inlier_out,                      # [Nr, 128] f32 0/1
    *,
    n_rounds: int,
    iters_per_round: int,
):
    fx = scal_ref[0]
    fy = scal_ref[1]
    cx = scal_ref[2]
    cy = scal_ref[3]
    bf = scal_ref[4]
    R0 = tuple(scal_ref[5 + i] for i in range(9))
    t0 = tuple(scal_ref[14 + i] for i in range(3))

    Xx = xx_ref[:]
    Xy = xy_ref[:]
    Xz = xz_ref[:]
    u_obs = u_ref[:]
    v_obs = v_ref[:]
    r_obs = r_ref[:]
    info = info_ref[:]
    st = st_ref[:]
    valid = valid_ref[:]
    delta2 = jnp.where(st > 0.5, CHI2_STEREO, CHI2_MONO)
    sqrt_delta2 = jnp.sqrt(delta2)

    def project(R, t):
        Px = R[0] * Xx + R[1] * Xy + R[2] * Xz + t[0]
        Py = R[3] * Xx + R[4] * Xy + R[5] * Xz + t[1]
        Pz = R[6] * Xx + R[7] * Xy + R[8] * Xz + t[2]
        zs = jnp.where(jnp.abs(Pz) > 1e-9, Pz, 1e-9)
        inv_z = 1.0 / zs
        return Px, Py, Pz, inv_z

    def chi2_of(R, t):
        Px, Py, Pz, inv_z = project(R, t)
        up = fx * Px * inv_z + cx
        vp = fy * Py * inv_z + cy
        rp = up - bf * inv_z
        eu = u_obs - up
        ev = v_obs - vp
        er = (r_obs - rp) * st
        chi2 = info * (eu * eu + ev * ev + er * er)
        return chi2, Pz

    def eval_hbc(R, t, active, use_robust):
        """One full evaluation: H (6x6 scalars), b (6), robust cost."""
        Px, Py, Pz, inv_z = project(R, t)
        inv_z2 = inv_z * inv_z
        up = fx * Px * inv_z + cx
        vp = fy * Py * inv_z + cy
        rp = up - bf * inv_z
        eu = u_obs - up
        ev = v_obs - vp
        er = (r_obs - rp) * st
        chi2 = info * (eu * eu + ev * ev + er * er)

        sqrt_chi2 = jnp.sqrt(jnp.maximum(chi2, 1e-12))
        huber = jnp.minimum(1.0, sqrt_delta2 / sqrt_chi2)
        if not use_robust:
            huber = jnp.ones_like(huber)
        gate = active * (Pz > 0)
        w = info * huber * gate

        # A-matrix rows (d proj / d P_cam); a*1 entries are zero.
        au0 = fx * inv_z
        au2 = -fx * Px * inv_z2
        av1 = fy * inv_z
        av2 = -fy * Py * inv_z2
        ar0 = au0
        ar2 = au2 + bf * inv_z2

        # J rows over [omega, upsilon] (e = obs - pred, left-mult update).
        Ju = (-au2 * Py, -au0 * Pz + au2 * Px, au0 * Py, -au0, None, -au2)
        Jv = (av1 * Pz - av2 * Py, av2 * Px, -av1 * Px, None, -av1, -av2)
        Jr = (-ar2 * Py, -ar0 * Pz + ar2 * Px, ar0 * Py, -ar0, None, -ar2)

        H = [[None] * 6 for _ in range(6)]
        bvec = [None] * 6
        wst = w * st
        for a in range(6):
            for c in range(a, 6):
                term = 0.0
                if Ju[a] is not None and Ju[c] is not None:
                    term = term + w * (Ju[a] * Ju[c])
                if Jv[a] is not None and Jv[c] is not None:
                    term = term + w * (Jv[a] * Jv[c])
                if Jr[a] is not None and Jr[c] is not None:
                    term = term + wst * (Jr[a] * Jr[c])
                s = (
                    jnp.sum(term)
                    if not isinstance(term, float)
                    else jnp.asarray(0.0, jnp.float32)
                )
                H[a][c] = s
                H[c][a] = s
            term = 0.0
            if Ju[a] is not None:
                term = term + w * (Ju[a] * eu)
            if Jv[a] is not None:
                term = term + w * (Jv[a] * ev)
            if Jr[a] is not None:
                term = term + wst * (Jr[a] * er)
            bvec[a] = (
                jnp.sum(term)
                if not isinstance(term, float)
                else jnp.asarray(0.0, jnp.float32)
            )

        if use_robust:
            rho = jnp.where(
                chi2 <= delta2,
                chi2,
                2.0 * sqrt_delta2 * sqrt_chi2 - delta2,
            )
        else:
            rho = chi2
        cost = jnp.sum(jnp.where(gate > 0, rho, 0.0))
        return H, bvec, cost

    def pack(R, t, H, bvec, extra):
        flat = list(R) + list(t)
        for a in range(6):
            for c in range(a, 6):
                flat.append(H[a][c])
        flat += list(bvec) + list(extra)
        return tuple(flat)

    def unpack(flat):
        R = flat[0:9]
        t = flat[9:12]
        H = [[None] * 6 for _ in range(6)]
        i = 12
        for a in range(6):
            for c in range(a, 6):
                H[a][c] = flat[i]
                H[c][a] = flat[i]
                i += 1
        bvec = list(flat[i:i + 6])
        extra = flat[i + 6:]
        return R, t, H, bvec, extra

    def lm_round(R, t, active, use_robust):
        H0, b0, cost0 = eval_hbc(R, t, active, use_robust)
        state0 = pack(
            R, t, H0, b0,
            (jnp.float32(1e-3), cost0, jnp.int32(0), jnp.int32(0)),
        )

        def cond(state):
            lam, i, converged = state[-4], state[-2], state[-1]
            return (i < iters_per_round) & (converged == 0) & (lam < 1e8)

        def body(state):
            R, t, H, bvec, extra = unpack(state)
            lam, cost, i, _ = extra
            Hlm = [[None] * 6 for _ in range(6)]
            for a in range(6):
                for c in range(6):
                    v = H[a][c]
                    if a == c:
                        v = v + lam * H[a][a] + 1e-9
                    Hlm[a][c] = v
            step = _chol_solve6(Hlm, [-bv for bv in bvec])
            dR, dt = _se3_exp_scalar(step)
            R_new = _mat33_mul(dR, R)
            t_new0 = _mat33_vec(dR, t)
            t_new = (t_new0[0] + dt[0], t_new0[1] + dt[1], t_new0[2] + dt[2])
            H_new, b_new, cost_new = eval_hbc(R_new, t_new, active, use_robust)
            accept = cost_new < cost
            step2 = sum(s * s for s in step)
            converged = (accept & (step2 < 1e-16)).astype(jnp.int32)

            def sel(x_new, x_old):
                return jnp.where(accept, x_new, x_old)

            R_o = tuple(sel(a, b) for a, b in zip(R_new, R))
            t_o = tuple(sel(a, b) for a, b in zip(t_new, t))
            H_o = [[sel(H_new[a][c], H[a][c]) for c in range(6)] for a in range(6)]
            b_o = [sel(b_new[a], bvec[a]) for a in range(6)]
            lam_o = jnp.where(accept, lam * 0.5, lam * 4.0)
            cost_o = sel(cost_new, cost)
            return pack(R_o, t_o, H_o, b_o, (lam_o, cost_o, i + 1, converged))

        state = jax.lax.while_loop(cond, body, state0)
        R, t, _, _, _ = unpack(state)
        return R, t

    R, t = R0, t0
    active = valid
    for rnd in range(n_rounds):
        use_robust = rnd < n_rounds - 1
        R, t = lm_round(R, t, active, use_robust)
        chi2, Pz = chi2_of(R, t)
        inlier = (valid > 0) & (chi2 <= delta2) & (Pz > 0)
        active = jnp.where(inlier, 1.0, 0.0)

    inlier_out[:] = active
    # Scatter the 12 pose scalars into lane slots of row 0 with vector
    # selects (scalar stores into VMEM lanes don't lower well in Mosaic).
    lane_id = jax.lax.broadcasted_iota(jnp.int32, (8, LANE), 1)
    row_id = jax.lax.broadcasted_iota(jnp.int32, (8, LANE), 0)
    buf = jnp.zeros((8, LANE), jnp.float32)
    for i, val in enumerate(list(R) + list(t)):
        buf = jnp.where((row_id == 0) & (lane_id == i), val, buf)
    pose_out[:] = buf


# ---------------------------------------------------------------------------
# Wrapper
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit, static_argnames=("fx", "fy", "cx", "cy", "bf", "n_rounds",
                              "iters_per_round")
)
def pose_optimization_pallas(
    R0, t0, points, obs, fx, fy, cx, cy, bf,
    n_rounds: int = 4, iters_per_round: int = 10,
):
    """Drop-in for pose_opt.pose_optimization (unary edges, one camera).

    Returns (R [3,3], t [3], inliers [O] bool, n_inliers) as a tuple
    matching PoseOptResult fields."""
    from orb_slam2_commit_tpu.optim.pose_opt import PoseOptResult

    O = points.shape[0]
    n_pad = (-O) % LANE
    Np = O + n_pad
    nr = Np // LANE

    def plane(x, fill=0.0):
        x = jnp.asarray(x, jnp.float32)
        x = jnp.pad(x, (0, n_pad), constant_values=fill)
        return x.reshape(nr, LANE)

    pts = jnp.asarray(points, jnp.float32)
    scal = jnp.concatenate(
        [
            jnp.asarray([fx, fy, cx, cy, bf], jnp.float32),
            jnp.asarray(R0, jnp.float32).reshape(9),
            jnp.asarray(t0, jnp.float32).reshape(3),
        ]
    )
    args = (
        plane(pts[:, 0]), plane(pts[:, 1]), plane(pts[:, 2]),
        plane(obs.uvr[:, 0]), plane(obs.uvr[:, 1]), plane(obs.uvr[:, 2]),
        plane(obs.inv_sigma2),
        plane(obs.is_stereo.astype(jnp.float32)),
        plane(obs.valid.astype(jnp.float32)),
    )
    kernel = functools.partial(
        _pose_lm_kernel, n_rounds=n_rounds, iters_per_round=iters_per_round
    )
    pose_buf, inlier_buf = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((8, LANE), jnp.float32),
            jax.ShapeDtypeStruct((nr, LANE), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 9,
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=_interpret(),
    )(scal, *args)

    R = pose_buf[0, :9].reshape(3, 3).astype(points.dtype)
    t = pose_buf[0, 9:12].astype(points.dtype)
    inliers = inlier_buf.reshape(Np)[:O] > 0.5
    return PoseOptResult(R=R, t=t, inliers=inliers, n_inliers=jnp.sum(inliers))
