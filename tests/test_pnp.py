"""EPnP + RANSAC tests on synthetic 3D-2D correspondences."""

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam2_commit_tpu.geometry import pnp
from orb_slam2_commit_tpu.ops import lie

FX, FY, CX, CY = 500.0, 500.0, 320.0, 240.0


def make_scene(rng, n=80, noise=0.0, outlier_frac=0.0):
    X = np.stack(
        [rng.uniform(-3, 3, n), rng.uniform(-2, 2, n), rng.uniform(4, 10, n)],
        -1,
    )
    w = rng.normal(0, 0.3, 3)
    R = np.asarray(lie.so3_exp(jnp.asarray(w)))
    t = rng.normal(0, 0.5, 3) + np.array([0, 0, 0.5])
    pc = X @ R.T + t
    uv = np.stack(
        [FX * pc[:, 0] / pc[:, 2] + CX, FY * pc[:, 1] / pc[:, 2] + CY], -1
    )
    uv += rng.normal(0, noise, uv.shape)
    n_out = int(outlier_frac * n)
    out_idx = rng.choice(n, n_out, replace=False) if n_out else np.array([], int)
    uv[out_idx] += rng.uniform(30, 120, (n_out, 2)) * rng.choice([-1, 1], (n_out, 2))
    return X, uv, R, t, out_idx


def rot_err(Ra, Rb):
    c = (np.trace(Ra.T @ Rb) - 1) / 2
    return np.degrees(np.arccos(np.clip(c, -1, 1)))


class TestEPnP:
    def test_exact_minimal(self):
        rng = np.random.default_rng(0)
        X, uv, R, t, _ = make_scene(rng, n=8)
        R_est, t_est = pnp.epnp_solve(
            jnp.asarray(X), jnp.asarray(uv), FX, FY, CX, CY
        )
        assert rot_err(np.asarray(R_est), R) < 0.5
        np.testing.assert_allclose(np.asarray(t_est), t, atol=0.05)

    def test_exact_many_points(self):
        rng = np.random.default_rng(1)
        X, uv, R, t, _ = make_scene(rng, n=50)
        R_est, t_est = pnp.epnp_solve(
            jnp.asarray(X), jnp.asarray(uv), FX, FY, CX, CY
        )
        assert rot_err(np.asarray(R_est), R) < 0.2
        np.testing.assert_allclose(np.asarray(t_est), t, atol=0.02)

    def test_noisy(self):
        rng = np.random.default_rng(2)
        X, uv, R, t, _ = make_scene(rng, n=60, noise=0.5)
        R_est, t_est = pnp.epnp_solve(
            jnp.asarray(X), jnp.asarray(uv), FX, FY, CX, CY
        )
        assert rot_err(np.asarray(R_est), R) < 1.0
        np.testing.assert_allclose(np.asarray(t_est), t, atol=0.1)


class TestEPnPRansac:
    def test_with_outliers(self):
        rng = np.random.default_rng(3)
        X, uv, R, t, out_idx = make_scene(rng, n=100, noise=0.3,
                                          outlier_frac=0.3)
        res = pnp.epnp_ransac_jit(
            jax.random.key(0),
            jnp.asarray(X), jnp.asarray(uv), jnp.ones(100, bool),
            jnp.ones(100), FX, FY, CX, CY,
        )
        assert bool(res.ok)
        assert rot_err(np.asarray(res.R), R) < 1.5
        np.testing.assert_allclose(np.asarray(res.t), t, atol=0.15)
        inl = np.asarray(res.inliers)
        assert not inl[out_idx].any()
        assert inl.sum() >= 60

    def test_insufficient_support_fails(self):
        rng = np.random.default_rng(4)
        # Pure garbage correspondences.
        X = rng.uniform(-3, 3, (50, 3)) + [0, 0, 6]
        uv = rng.uniform(0, 640, (50, 2))
        res = pnp.epnp_ransac_jit(
            jax.random.key(1),
            jnp.asarray(X), jnp.asarray(uv), jnp.ones(50, bool),
            jnp.ones(50), FX, FY, CX, CY, min_inliers=15,
        )
        assert not bool(res.ok)

    def test_respects_valid_mask(self):
        rng = np.random.default_rng(5)
        X, uv, R, t, _ = make_scene(rng, n=60, noise=0.2)
        # Garbage in the masked-out tail.
        X[40:] = rng.uniform(-5, 5, (20, 3))
        valid = np.zeros(60, bool)
        valid[:40] = True
        res = pnp.epnp_ransac_jit(
            jax.random.key(2),
            jnp.asarray(X), jnp.asarray(uv), jnp.asarray(valid),
            jnp.ones(60), FX, FY, CX, CY,
        )
        assert bool(res.ok)
        assert not np.asarray(res.inliers)[40:].any()
        assert rot_err(np.asarray(res.R), R) < 1.0
