"""Interleaved A/B: LU (jnp.linalg.solve) vs unrolled Cholesky inside the
pose-BA LM loop, measured in one process so tunnel drift cancels.

Methodology per block: distinct observation buffers, depth-2 data
dependence, value fetch. Blocks alternate A,B,A,B,...; report per-variant
median of block means.

Usage: python scripts/ab_pose_solver.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from orb_slam2_commit_tpu.optim import linalg, pose_opt
    from orb_slam2_commit_tpu.optim.residuals import BAObservations

    fx = fy = 500.0
    cx, cy = 320.0, 240.0
    O = 1024
    rng = np.random.default_rng(0)

    def make_problem(seed):
        r = np.random.default_rng(seed)
        X = np.stack([r.uniform(-3, 3, O), r.uniform(-2, 2, O),
                      r.uniform(4, 12, O)], -1).astype(np.float32)
        R0 = np.eye(3, dtype=np.float32)
        t0 = np.zeros(3, np.float32)
        uv = X[:, :2] / X[:, 2:3] * fx + np.array([cx, cy], np.float32)
        uv += r.normal(0, 0.7, uv.shape).astype(np.float32)
        uvr = np.concatenate([uv, np.zeros((O, 1), np.float32)], -1)
        obs = BAObservations(
            cam_idx=jnp.zeros(O, jnp.int32), pt_idx=jnp.arange(O, dtype=jnp.int32),
            uvr=jnp.asarray(uvr), inv_sigma2=jnp.ones(O, jnp.float32),
            is_stereo=jnp.zeros(O, bool), valid=jnp.ones(O, bool),
        )
        # Perturbed initial pose (motion-model-like error).
        ang = r.normal(0, 0.01, 3).astype(np.float32)
        from orb_slam2_commit_tpu.ops import lie
        dR, _ = lie.se3_exp(jnp.asarray(np.concatenate([ang, np.zeros(3, np.float32)])))
        return (jnp.asarray(dR @ R0), jnp.asarray(t0 + r.normal(0, 0.02, 3).astype(np.float32)),
                jnp.asarray(X), obs)

    problems = [make_problem(i) for i in range(8)]

    def run(fn_jit, n=48):
        outs = [jnp.zeros(()), jnp.zeros(())]
        t0 = time.perf_counter()
        for i in range(n):
            R0, t0_, X, obs = problems[i % 8]
            r = fn_jit(R0, t0_ + 0.0 * outs[i % 2], X, obs)
            outs[i % 2] = r.t[0] + r.n_inliers.astype(jnp.float32)
        _ = float(outs[0]) + float(outs[1])
        return (time.perf_counter() - t0) / n

    def make_fn():
        def f(R0, t0_, X, obs):
            return pose_opt.pose_optimization(
                R0, t0_, X, obs, fx, fy, cx, cy, 0.0)
        return jax.jit(f)

    # pose_opt calls linalg.chol_solve_spd directly, so the A/B swaps THAT
    # symbol. jit traces at the FIRST CALL, not at jax.jit() time, so each
    # variant must be traced (warmed) while its patch is active.
    orig_chol = linalg.chol_solve_spd
    linalg.chol_solve_spd = lambda H, b: jnp.linalg.solve(H, b)
    fA = make_fn()          # LU
    for p in problems:
        jax.block_until_ready(fA(*p))
    linalg.chol_solve_spd = orig_chol
    fB = make_fn()          # unrolled Cholesky
    for p in problems:
        jax.block_until_ready(fB(*p))

    tA, tB = [], []
    for _ in range(5):
        tA.append(run(fA))
        tB.append(run(fB))
    print("LU       blocks ms:", [f"{x*1e3:.3f}" for x in tA])
    print("cholesky blocks ms:", [f"{x*1e3:.3f}" for x in tB])
    print(f"median LU {np.median(tA)*1e3:.3f} ms | "
          f"median chol {np.median(tB)*1e3:.3f} ms")


if __name__ == "__main__":
    main()
