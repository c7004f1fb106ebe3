"""Optimizer tests: pose-only BA and Schur-complement BA on synthetic data."""

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam2_commit_tpu.ops import lie
from orb_slam2_commit_tpu.optim import ba, pose_opt
from orb_slam2_commit_tpu.optim.residuals import BAObservations

FX, FY, CX, CY = 500.0, 500.0, 320.0, 240.0
BF = 0.0


def project_np(R, t, X):
    pc = X @ R.T + t
    return np.stack(
        [FX * pc[:, 0] / pc[:, 2] + CX, FY * pc[:, 1] / pc[:, 2] + CY], -1
    )


def rot_angle(Ra, Rb):
    c = (np.trace(Ra.T @ Rb) - 1) / 2
    return np.degrees(np.arccos(np.clip(c, -1, 1)))


def make_obs(uv, n_outliers=0, rng=None, valid=None):
    n = uv.shape[0]
    uvr = np.concatenate([uv, np.zeros((n, 1))], -1)
    if n_outliers:
        idx = rng.choice(n, n_outliers, replace=False)
        uvr[idx, :2] += rng.uniform(15, 60, size=(n_outliers, 2)) * rng.choice(
            [-1, 1], size=(n_outliers, 2)
        )
    if valid is None:
        valid = np.ones(n, bool)
    return BAObservations(
        cam_idx=jnp.zeros(n, jnp.int32),
        pt_idx=jnp.arange(n, dtype=jnp.int32),
        uvr=jnp.asarray(uvr),
        inv_sigma2=jnp.ones(n),
        is_stereo=jnp.zeros(n, bool),
        valid=jnp.asarray(valid),
    ), idx if n_outliers else np.array([], int)


class TestPoseOptimization:
    def _setup(self, seed, n=120):
        rng = np.random.default_rng(seed)
        X = np.stack(
            [
                rng.uniform(-3, 3, n),
                rng.uniform(-2, 2, n),
                rng.uniform(4, 10, n),
            ],
            -1,
        )
        w_true = rng.normal(0, 0.1, 3)
        R_true = np.asarray(lie.so3_exp(jnp.asarray(w_true)))
        t_true = rng.normal(0, 0.3, 3)
        uv = project_np(R_true, t_true, X)
        return rng, X, R_true, t_true, uv

    def test_converges_from_perturbed_start(self):
        rng, X, R_true, t_true, uv = self._setup(0)
        obs, _ = make_obs(uv)
        dR = np.asarray(lie.so3_exp(jnp.asarray([0.02, -0.03, 0.01])))
        R0 = dR @ R_true
        t0 = t_true + np.array([0.05, -0.04, 0.08])
        r = pose_opt.pose_optimization(
            jnp.asarray(R0), jnp.asarray(t0), jnp.asarray(X), obs,
            FX, FY, CX, CY, BF,
        )
        assert rot_angle(np.asarray(r.R), R_true) < 0.01
        np.testing.assert_allclose(np.asarray(r.t), t_true, atol=1e-3)
        assert int(r.n_inliers) == 120

    def test_outliers_rejected(self):
        rng, X, R_true, t_true, uv = self._setup(1)
        obs, out_idx = make_obs(uv, n_outliers=25, rng=rng)
        dR = np.asarray(lie.so3_exp(jnp.asarray([0.01, 0.02, -0.01])))
        r = pose_opt.pose_optimization(
            jnp.asarray(dR @ R_true), jnp.asarray(t_true + 0.05),
            jnp.asarray(X), obs, FX, FY, CX, CY, BF,
        )
        assert rot_angle(np.asarray(r.R), R_true) < 0.05
        np.testing.assert_allclose(np.asarray(r.t), t_true, atol=5e-3)
        inl = np.asarray(r.inliers)
        assert not inl[out_idx].any()
        assert inl.sum() >= 90

    def test_noisy_observations(self):
        rng, X, R_true, t_true, uv = self._setup(2)
        uv = uv + rng.normal(0, 0.5, uv.shape)
        obs, _ = make_obs(uv)
        r = pose_opt.pose_optimization(
            jnp.asarray(R_true), jnp.asarray(t_true + 0.1), jnp.asarray(X),
            obs, FX, FY, CX, CY, BF,
        )
        assert rot_angle(np.asarray(r.R), R_true) < 0.1
        np.testing.assert_allclose(np.asarray(r.t), t_true, atol=0.02)


def make_ba_problem(seed=0, n_cams=6, n_pts=200, noise=0.0,
                    pose_perturb=0.02, point_perturb=0.05, n_fixed=2):
    rng = np.random.default_rng(seed)
    X = np.stack(
        [
            rng.uniform(-4, 4, n_pts),
            rng.uniform(-3, 3, n_pts),
            rng.uniform(5, 12, n_pts),
        ],
        -1,
    )
    R_true, t_true = [], []
    for k in range(n_cams):
        w = rng.normal(0, 0.03, 3)
        R_true.append(np.asarray(lie.so3_exp(jnp.asarray(w))))
        t_true.append(np.array([0.3 * k, 0.02 * k, 0.0]) + rng.normal(0, 0.02, 3))
    R_true, t_true = np.stack(R_true), np.stack(t_true)

    cam_idx, pt_idx, uvr = [], [], []
    for k in range(n_cams):
        uv = project_np(R_true[k], t_true[k], X)
        uv = uv + rng.normal(0, noise, uv.shape) if noise else uv
        for p in range(n_pts):
            if 0 <= uv[p, 0] < 640 and 0 <= uv[p, 1] < 480:
                cam_idx.append(k)
                pt_idx.append(p)
                uvr.append([uv[p, 0], uv[p, 1], 0.0])
    O = len(cam_idx)
    obs = BAObservations(
        cam_idx=jnp.asarray(cam_idx, jnp.int32),
        pt_idx=jnp.asarray(pt_idx, jnp.int32),
        uvr=jnp.asarray(np.asarray(uvr)),
        inv_sigma2=jnp.ones(O),
        is_stereo=jnp.zeros(O, bool),
        valid=jnp.ones(O, bool),
    )

    # Perturb non-fixed poses and all points.
    R0, t0 = R_true.copy(), t_true.copy()
    for k in range(n_fixed, n_cams):
        dR = np.asarray(lie.so3_exp(jnp.asarray(rng.normal(0, pose_perturb, 3))))
        R0[k] = dR @ R_true[k]
        t0[k] = t_true[k] + rng.normal(0, pose_perturb * 2, 3)
    X0 = X + rng.normal(0, point_perturb, X.shape)

    fixed = np.zeros(n_cams, bool)
    fixed[:n_fixed] = True
    problem = ba.BAProblem(
        R=jnp.asarray(R0),
        t=jnp.asarray(t0),
        fixed=jnp.asarray(fixed),
        points=jnp.asarray(X0),
        point_valid=jnp.ones(n_pts, bool),
        obs=obs,
    )
    return problem, R_true, t_true, X, rng


class TestBundleAdjust:
    def test_recovers_exact_solution(self):
        problem, R_true, t_true, X, _ = make_ba_problem(seed=0)
        out, result = ba.bundle_adjust(
            problem, FX, FY, CX, CY, BF, n_iters=12, point_chunk=64
        )
        for k in range(2, 6):
            assert rot_angle(np.asarray(out.R[k]), R_true[k]) < 0.02, k
            np.testing.assert_allclose(np.asarray(out.t[k]), t_true[k], atol=2e-3)
        err = np.linalg.norm(np.asarray(out.points) - X, axis=1)
        assert np.median(err) < 1e-3, np.median(err)
        assert float(result.cost) < 1e-3

    def test_fixed_cameras_unchanged(self):
        problem, R_true, t_true, X, _ = make_ba_problem(seed=1)
        out, _ = ba.bundle_adjust(
            problem, FX, FY, CX, CY, BF, n_iters=5, point_chunk=64
        )
        np.testing.assert_array_equal(np.asarray(out.R[:2]), np.asarray(problem.R[:2]))
        np.testing.assert_array_equal(np.asarray(out.t[:2]), np.asarray(problem.t[:2]))

    def test_noise_reduces_to_sanity(self):
        problem, R_true, t_true, X, _ = make_ba_problem(seed=2, noise=0.3)
        out, result = ba.bundle_adjust(
            problem, FX, FY, CX, CY, BF, n_iters=12, point_chunk=128
        )
        for k in range(2, 6):
            assert rot_angle(np.asarray(out.R[k]), R_true[k]) < 0.05
            np.testing.assert_allclose(np.asarray(out.t[k]), t_true[k], atol=0.01)

    def test_local_ba_flags_outliers(self):
        problem, R_true, t_true, X, rng = make_ba_problem(seed=3, noise=0.2)
        # Corrupt 5% of observations.
        uvr = np.array(problem.obs.uvr)
        n_o = len(uvr) // 20
        idx = rng.choice(len(uvr), n_o, replace=False)
        uvr[idx, :2] += rng.uniform(20, 80, (n_o, 2)) * rng.choice([-1, 1], (n_o, 2))
        problem = problem._replace(obs=problem.obs._replace(uvr=jnp.asarray(uvr)))
        out, result = ba.local_bundle_adjust(
            problem, FX, FY, CX, CY, BF, point_chunk=128
        )
        inl = np.asarray(result.inlier)
        assert not inl[idx].any()
        assert inl.sum() > 0.85 * len(uvr)
        for k in range(2, 6):
            assert rot_angle(np.asarray(out.R[k]), R_true[k]) < 0.05


class TestSchurPCG:
    """Implicit-Schur PCG solver (optim/ba._schur_pcg) vs the dense
    Cholesky path: same LM trajectory within CG tolerance, same
    ground-truth convergence. The pcg path is what map-scale global BA
    uses (solver='auto' at K >= 128)."""

    def test_matches_dense_solver(self):
        problem, R_true, t_true, X, _ = make_ba_problem(
            seed=21, n_cams=8, n_pts=160
        )
        out_d, res_d = ba.bundle_adjust_jit(
            problem, FX, FY, CX, CY, BF, n_iters=8, point_chunk=64,
            solver="dense",
        )
        out_p, res_p = ba.bundle_adjust_jit(
            problem, FX, FY, CX, CY, BF, n_iters=8, point_chunk=64,
            solver="pcg",
        )
        # Both converge to the same optimum (not necessarily the same
        # iterate path — CG steps are inexact).
        assert float(res_p.cost) < 1.05 * float(res_d.cost) + 1e-9
        np.testing.assert_allclose(
            np.asarray(out_p.t), np.asarray(out_d.t), atol=5e-4
        )
        np.testing.assert_allclose(
            np.asarray(out_p.points), np.asarray(out_d.points), atol=5e-3
        )

    def test_pcg_converges_to_ground_truth(self):
        problem, R_true, t_true, X, _ = make_ba_problem(
            seed=22, n_cams=8, n_pts=200
        )
        out, res = ba.bundle_adjust_jit(
            problem, FX, FY, CX, CY, BF, n_iters=12, point_chunk=64,
            solver="pcg",
        )
        for k in range(2, 8):
            assert rot_angle(np.asarray(out.R[k]), R_true[k]) < 0.02
            np.testing.assert_allclose(
                np.asarray(out.t[k]), t_true[k], atol=2e-3
            )

    def test_pcg_respects_fixed_cameras(self):
        problem, *_ = make_ba_problem(seed=23, n_cams=8, n_pts=120)
        out, _ = ba.bundle_adjust_jit(
            problem, FX, FY, CX, CY, BF, n_iters=6, point_chunk=64,
            solver="pcg",
        )
        fixed = np.asarray(problem.fixed)
        np.testing.assert_array_equal(
            np.asarray(out.R)[fixed], np.asarray(problem.R)[fixed]
        )
        np.testing.assert_array_equal(
            np.asarray(out.t)[fixed], np.asarray(problem.t)[fixed]
        )
