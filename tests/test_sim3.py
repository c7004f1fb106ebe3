"""Sim3 solver, Sim3 refinement, and essential-graph optimization tests."""

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam2_commit_tpu.geometry import sim3_solver
from orb_slam2_commit_tpu.ops import lie
from orb_slam2_commit_tpu.optim import pose_graph, sim3_opt

FX, FY, CX, CY = 400.0, 400.0, 320.0, 240.0


def rand_rot(rng, scale=0.3):
    return np.asarray(lie.so3_exp(jnp.asarray(rng.normal(0, scale, 3))))


def make_sim3_pair(rng, n=60, s_true=1.3, noise=0.0, outlier_frac=0.0):
    """Matched camera-frame point sets: x1 = s R x2 + t."""
    x2 = np.stack(
        [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), rng.uniform(4, 9, n)],
        -1,
    )
    R = rand_rot(rng, 0.2)
    t = rng.normal(0, 0.4, 3)
    x1 = s_true * x2 @ R.T + t
    # Push x1 in front of "camera 1".
    x1[:, 2] += max(0.0, 1.0 - x1[:, 2].min())
    t = t + np.array([0, 0, max(0.0, 1.0 - (s_true * x2 @ R.T + t)[:, 2].min())])
    x1 = s_true * x2 @ R.T + t

    def proj(x):
        return np.stack(
            [FX * x[:, 0] / x[:, 2] + CX, FY * x[:, 1] / x[:, 2] + CY], -1
        )

    uv1 = proj(x1) + rng.normal(0, noise, (n, 2))
    uv2 = proj(x2) + rng.normal(0, noise, (n, 2))
    n_out = int(outlier_frac * n)
    out = rng.choice(n, n_out, replace=False) if n_out else np.array([], int)
    if n_out:
        x2[out] += rng.uniform(0.5, 2.0, (n_out, 3))
    return x1, x2, uv1, uv2, s_true, R, t, out


def rot_err(Ra, Rb):
    c = (np.trace(Ra.T @ Rb) - 1) / 2
    return np.degrees(np.arccos(np.clip(c, -1, 1)))


class TestHornSim3:
    def test_exact(self):
        rng = np.random.default_rng(0)
        x1, x2, _, _, s, R, t, _ = make_sim3_pair(rng)
        s_e, R_e, t_e = sim3_solver.horn_sim3(jnp.asarray(x1), jnp.asarray(x2))
        assert abs(float(s_e) - s) < 1e-6
        assert rot_err(np.asarray(R_e), R) < 1e-4
        np.testing.assert_allclose(np.asarray(t_e), t, atol=1e-6)

    def test_fix_scale(self):
        rng = np.random.default_rng(1)
        x1, x2, _, _, s, R, t, _ = make_sim3_pair(rng, s_true=1.0)
        s_e, R_e, t_e = sim3_solver.horn_sim3(
            jnp.asarray(x1), jnp.asarray(x2), fix_scale=True
        )
        assert float(s_e) == 1.0
        assert rot_err(np.asarray(R_e), R) < 1e-4

    def test_minimal_three_points(self):
        rng = np.random.default_rng(2)
        x1, x2, _, _, s, R, t, _ = make_sim3_pair(rng, n=3)
        s_e, R_e, t_e = sim3_solver.horn_sim3(jnp.asarray(x1), jnp.asarray(x2))
        assert abs(float(s_e) - s) < 1e-5
        assert rot_err(np.asarray(R_e), R) < 1e-3


class TestSim3Ransac:
    def test_with_outliers(self):
        rng = np.random.default_rng(3)
        n = 80
        x1, x2, uv1, uv2, s, R, t, out = make_sim3_pair(
            rng, n=n, noise=0.3, outlier_frac=0.25
        )
        res = sim3_solver.sim3_ransac_jit(
            jax.random.key(0),
            jnp.asarray(x1), jnp.asarray(x2), jnp.ones(n, bool),
            jnp.asarray(uv1), jnp.asarray(uv2),
            jnp.ones(n), jnp.ones(n),
            FX, FY, CX, CY,
        )
        assert bool(res.ok)
        assert abs(float(res.s12) - s) < 0.02
        assert rot_err(np.asarray(res.R12), R) < 0.5
        assert not np.asarray(res.inliers)[out].any()


class TestOptimizeSim3:
    def test_refines_perturbed_estimate(self):
        rng = np.random.default_rng(4)
        n = 60
        x1, x2, uv1, uv2, s, R, t, _ = make_sim3_pair(rng, n=n, noise=0.2)
        dR = rand_rot(rng, 0.02)
        res = sim3_opt.optimize_sim3_jit(
            jnp.asarray(s * 1.05), jnp.asarray(dR @ R), jnp.asarray(t + 0.05),
            jnp.asarray(x1), jnp.asarray(x2),
            jnp.asarray(uv1), jnp.asarray(uv2),
            jnp.ones(n), jnp.ones(n), jnp.ones(n, bool),
            FX, FY, CX, CY,
        )
        assert abs(float(res.s12) - s) < 0.01
        assert rot_err(np.asarray(res.R12), R) < 0.2
        np.testing.assert_allclose(np.asarray(res.t12), t, atol=0.05)
        assert int(res.n_inliers) >= 0.9 * n


class TestEssentialGraph:
    def test_loop_correction_distributes_drift(self):
        """Chain of keyframes with accumulated drift; a loop edge back to
        the start pulls everything consistent (the CorrectLoop scenario,
        src/LoopClosing.cc:785)."""
        rng = np.random.default_rng(5)
        K = 12
        # Ground-truth poses on a circle (world->kf), scale 1.
        s_true = np.ones(K)
        R_true, t_true = [], []
        for k in range(K):
            ang = 2 * np.pi * k / K
            R = np.asarray(
                lie.so3_exp(jnp.asarray([0.0, ang, 0.0]))
            )
            c = np.array([np.sin(ang) * 3, 0.0, 3 - np.cos(ang) * 3])
            R_true.append(R)
            t_true.append(-R @ c)
        R_true = np.stack(R_true)
        t_true = np.stack(t_true)

        # Drifted estimates: small error accumulating along the chain.
        s_est = np.ones(K)
        R_est = R_true.copy()
        t_est = t_true.copy()
        drift_R = rand_rot(rng, 0.003)
        acc_R = np.eye(3)
        for k in range(1, K):
            acc_R = acc_R @ drift_R
            R_est[k] = R_true[k] @ acc_R
            t_est[k] = t_true[k] + rng.normal(0, 0.02 * k, 3)
        s_est[1:] *= np.cumprod(np.full(K - 1, 1.01))  # scale drift

        # Edges: consecutive chain with TRUE relative measurements + loop
        # edge (K-1 -> 0) with the true measurement.
        ei, ej, ms, mR, mt = [], [], [], [], []

        def rel(i, j):
            # S_ij = S_i * S_j^-1 with s=1 ground truth.
            Rij = R_true[i] @ R_true[j].T
            tij = t_true[i] - Rij @ t_true[j]
            return 1.0, Rij, tij

        for k in range(K - 1):
            s_m, R_m, t_m = rel(k + 1, k)
            ei.append(k + 1)
            ej.append(k)
            ms.append(s_m)
            mR.append(R_m)
            mt.append(t_m)
        s_m, R_m, t_m = rel(0, K - 1)
        ei.append(0)
        ej.append(K - 1)
        ms.append(s_m)
        mR.append(R_m)
        mt.append(t_m)

        fixed = np.zeros(K, bool)
        fixed[0] = True
        graph = pose_graph.Sim3Graph(
            s=jnp.asarray(s_est), R=jnp.asarray(R_est), t=jnp.asarray(t_est),
            fixed=jnp.asarray(fixed),
            edge_i=jnp.asarray(ei, jnp.int32), edge_j=jnp.asarray(ej, jnp.int32),
            meas_s=jnp.asarray(ms), meas_R=jnp.asarray(np.stack(mR)),
            meas_t=jnp.asarray(np.stack(mt)),
            edge_valid=jnp.ones(len(ei), bool),
        )
        out = pose_graph.optimize_sim3_graph_jit(graph, n_iters=25)
        # All vertices should land on the ground truth.
        for k in range(K):
            assert abs(float(out.s[k]) - 1.0) < 0.01, k
            assert rot_err(np.asarray(out.R[k]), R_true[k]) < 0.5, k
            np.testing.assert_allclose(
                np.asarray(out.t[k]), t_true[k], atol=0.05
            )


def _drifted_loop_graph(K, seed=5, skip_every=7):
    """Chain-with-loop Sim3 graph: drifted estimates, ground-truth
    measurements (the CorrectLoop scenario at parametric size)."""
    from orb_slam2_commit_tpu.optim import pose_graph

    rng = np.random.default_rng(seed)
    R_true, t_true = [], []
    for k in range(K):
        ang = 2 * np.pi * k / K
        R = np.asarray(lie.so3_exp(jnp.asarray([0.0, ang, 0.0])))
        c = np.array([np.sin(ang) * 10, 0.0, 10 - np.cos(ang) * 10])
        R_true.append(R)
        t_true.append(-R @ c)
    R_true, t_true = np.stack(R_true), np.stack(t_true)
    R_est, t_est = R_true.copy(), t_true.copy()
    drift_R = rand_rot(rng, 0.002)
    acc = np.eye(3)
    for k in range(1, K):
        acc = acc @ drift_R
        R_est[k] = R_true[k] @ acc
        t_est[k] = t_true[k] + rng.normal(0, 0.01 * k, 3)

    def rel(i, j):
        Rij = R_true[i] @ R_true[j].T
        return Rij, t_true[i] - Rij @ t_true[j]

    ei, ej, mR, mt = [], [], [], []
    for k in range(K - 1):
        Rm, tm = rel(k + 1, k)
        ei.append(k + 1); ej.append(k); mR.append(Rm); mt.append(tm)
        if k % skip_every == 0:
            j2 = (k + 4) % K
            Rm, tm = rel(k, j2)
            ei.append(k); ej.append(j2); mR.append(Rm); mt.append(tm)
    Rm, tm = rel(0, K - 1)
    ei.append(0); ej.append(K - 1); mR.append(Rm); mt.append(tm)
    fixed = np.zeros(K, bool)
    fixed[0] = True
    graph = pose_graph.Sim3Graph(
        s=jnp.ones(K), R=jnp.asarray(R_est), t=jnp.asarray(t_est),
        fixed=jnp.asarray(fixed),
        edge_i=jnp.asarray(ei, jnp.int32), edge_j=jnp.asarray(ej, jnp.int32),
        meas_s=jnp.ones(len(ei)), meas_R=jnp.asarray(np.stack(mR)),
        meas_t=jnp.asarray(np.stack(mt)),
        edge_valid=jnp.ones(len(ei), bool),
    )
    return graph, R_true, t_true


class TestPoseGraphPCG:
    """The sparse CG essential-graph solver (optim/pose_graph._pcg_solve)
    — the map-scale path (auto above 256 vertices): the dense [7K,7K]
    system was 440 MB + a 65 s warm solve at the 850 m drive's 1058-KF
    closure vs 0.4 s for PCG with bit-matching output
    (scripts/bench_correction.py)."""

    def test_pcg_matches_dense_small(self):
        from orb_slam2_commit_tpu.optim import pose_graph

        graph, R_true, t_true = _drifted_loop_graph(K=40)
        out_d = pose_graph.optimize_sim3_graph_jit(
            graph, n_iters=20, fix_scale=True, solver="dense")
        out_p = pose_graph.optimize_sim3_graph_jit(
            graph, n_iters=20, fix_scale=True, solver="pcg")
        c_d = -np.einsum("kba,kb->ka", np.asarray(out_d.R),
                         np.asarray(out_d.t))
        c_p = -np.einsum("kba,kb->ka", np.asarray(out_p.R),
                         np.asarray(out_p.t))
        assert np.linalg.norm(c_d - c_p, axis=1).max() < 1e-3

    def test_pcg_large_loop_converges(self):
        """300-vertex drifted loop (above the auto threshold): the PCG
        path must distribute the closure error and land on the truth."""
        from orb_slam2_commit_tpu.optim import pose_graph

        graph, R_true, t_true = _drifted_loop_graph(K=300)
        out = pose_graph.optimize_sim3_graph_jit(
            graph, n_iters=20, fix_scale=True)  # auto -> pcg
        c = -np.einsum("kba,kb->ka", np.asarray(out.R), np.asarray(out.t))
        c_true = -np.einsum("kba,kb->ka", R_true, t_true)
        err = np.linalg.norm(c - c_true, axis=1)
        # Pre-solve drift is ~3 m at the chain end (0.01*k ramp).
        assert err.max() < 0.10, err.max()
