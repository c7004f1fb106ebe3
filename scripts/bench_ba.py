"""Schur bundle-adjustment throughput at production problem sizes.

Times optim/ba.bundle_adjust (the local/global BA core) on the available
accelerator at three scales: local-BA-sized (what every keyframe pays),
mid (loop neighborhood), and KITTI-00-global-sized. Honest timing:
alternating problem instances, value-fetch chain.

Usage: python scripts/bench_ba.py [--iters 10]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FX = FY = 500.0
CX, CY = 320.0, 240.0
BF = 50.0


def make_problem(seed, n_cams, n_pts, obs_per_pt):
    import jax.numpy as jnp

    from orb_slam2_commit_tpu.optim import ba
    from orb_slam2_commit_tpu.optim.residuals import BAObservations

    rng = np.random.default_rng(seed)
    X = rng.uniform([-10, -5, 4], [10, 5, 40], (n_pts, 3))
    R = np.tile(np.eye(3), (n_cams, 1, 1))
    t = np.stack([-np.array([0.3 * k, 0, 0]) for k in range(n_cams)])

    cam_of = (
        np.arange(n_pts)[:, None] * 7919 + np.arange(obs_per_pt)[None, :]
    ) % n_cams
    pt_idx = np.repeat(np.arange(n_pts), obs_per_pt)
    cam_idx = cam_of.reshape(-1)
    # Project with the true poses.
    pw = X[pt_idx]
    Rc = R[cam_idx]
    pcam = np.einsum("oij,oj->oi", Rc, pw) + t[cam_idx]
    z = np.maximum(pcam[:, 2], 1e-3)
    u = FX * pcam[:, 0] / z + CX
    v = FY * pcam[:, 1] / z + CY
    uvr = np.stack([u, v, np.zeros_like(u)], -1)
    O = uvr.shape[0]

    obs = BAObservations(
        cam_idx=jnp.asarray(cam_idx, jnp.int32),
        pt_idx=jnp.asarray(pt_idx, jnp.int32),
        uvr=jnp.asarray(uvr, jnp.float32),
        inv_sigma2=jnp.ones(O, jnp.float32),
        is_stereo=jnp.zeros(O, bool),
        valid=jnp.ones(O, bool),
    )
    # Noisy initialization.
    fixed = np.zeros(n_cams, bool)
    fixed[0] = True
    problem = ba.BAProblem(
        R=jnp.asarray(R, jnp.float32),
        t=jnp.asarray(t + rng.normal(0, 0.02, t.shape), jnp.float32),
        fixed=jnp.asarray(fixed),
        points=jnp.asarray(X + rng.normal(0, 0.05, X.shape), jnp.float32),
        point_valid=jnp.ones(n_pts, bool),
        obs=obs,
    )
    return problem


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    from orb_slam2_commit_tpu.optim import ba

    scales = [
        ("local  (K=16,  P=4k,   O=24k)", 16, 4096, 6),
        ("mid    (K=64,  P=16k,  O=96k)", 64, 16384, 6),
        ("global (K=512, P=96k,  O=576k)", 512, 98304, 6),
    ]
    for name, K, P, opp in scales:
        probs = [make_problem(s, K, P, opp) for s in (0, 1)]
        for solver in ("dense", "pcg"):
            if solver == "dense" and K > 128:
                print(f"{name}  [{solver:5s}]   (skipped: O(K^2 P) build)")
                continue

            def solve(p):
                out, res = ba.bundle_adjust_jit(
                    p, FX, FY, CX, CY, BF, n_iters=args.iters,
                    point_chunk=1024, solver=solver,
                )
                return out, res
            out, res = solve(probs[0])
            jax.block_until_ready(res.cost)
            for p in probs:
                _ = float(solve(p)[1].cost)
            n = 6
            start = time.perf_counter()
            carry = 0.0
            for i in range(n):
                p = probs[i % 2]
                p = p._replace(t=p.t + 0.0 * carry)
                out, res = solve(p)
                carry = float(res.cost) * 0.0
            el = (time.perf_counter() - start) / n
            print(f"{name}  [{solver:5s}] {el * 1e3:9.1f} ms "
                  f"/ {args.iters}-iter solve (final cost {float(res.cost):.1f})")


if __name__ == "__main__":
    main()
