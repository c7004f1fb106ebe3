"""Two-view initialization tests on exact synthetic geometry."""

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam2_commit_tpu.geometry import triangulation as tri
from orb_slam2_commit_tpu.geometry import twoview


def make_pair(rng, n=200, planar=False, noise=0.3, outlier_frac=0.1,
              baseline=0.5, yaw=0.05):
    """Synthetic correspondence pair with known (R21, t21)."""
    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1.0]])
    if planar:
        x = rng.uniform(-3, 3, n)
        y = rng.uniform(-2, 2, n)
        z = np.full(n, 6.0) + 0.3 * x  # tilted plane
    else:
        x = rng.uniform(-3, 3, n)
        y = rng.uniform(-2, 2, n)
        z = rng.uniform(4, 10, n)
    pts = np.stack([x, y, z], -1)

    cy, sy = np.cos(yaw), np.sin(yaw)
    R21 = np.array([[cy, 0, -sy], [0, 1, 0], [sy, 0, cy]])
    t21 = np.array([-baseline, 0.02, 0.01])

    def proj(P, R, t):
        pc = P @ R.T + t
        return (pc[:, :2] / pc[:, 2:3]) * [K[0, 0], K[1, 1]] + [K[0, 2], K[1, 2]]

    uv1 = proj(pts, np.eye(3), np.zeros(3))
    uv2 = proj(pts, R21, t21)
    uv1 += rng.normal(0, noise, uv1.shape)
    uv2 += rng.normal(0, noise, uv2.shape)
    n_out = int(outlier_frac * n)
    if n_out:
        idx = rng.choice(n, n_out, replace=False)
        uv2[idx] = rng.uniform([0, 0], [640, 480], size=(n_out, 2))
    valid = np.ones(n, dtype=bool)
    return (jnp.asarray(uv1), jnp.asarray(uv2), jnp.asarray(valid),
            jnp.asarray(K), R21, t21, pts)


def rot_angle_deg(Ra, Rb):
    c = (np.trace(Ra.T @ Rb) - 1) / 2
    return np.degrees(np.arccos(np.clip(c, -1, 1)))


class TestTriangulation:
    def test_exact_recovery(self):
        rng = np.random.default_rng(0)
        uv1, uv2, valid, K, R21, t21, pts = make_pair(
            rng, n=50, noise=0.0, outlier_frac=0.0
        )
        P1 = tri.projection_matrix(K, jnp.eye(3), jnp.zeros(3))
        P2 = tri.projection_matrix(K, jnp.asarray(R21), jnp.asarray(t21))
        got = np.asarray(tri.triangulate_dlt(uv1, uv2, P1, P2))
        np.testing.assert_allclose(got, pts, atol=1e-3)


class TestFindModels:
    def test_fundamental_wins_general_scene(self):
        rng = np.random.default_rng(1)
        uv1, uv2, valid, K, *_ = make_pair(rng, planar=False)
        models = twoview.find_models(jax.random.key(0), uv1, uv2, valid)
        rh = float(models.score_h / (models.score_h + models.score_f))
        assert rh < 0.5, rh

    def test_homography_wins_planar_scene(self):
        rng = np.random.default_rng(2)
        uv1, uv2, valid, K, *_ = make_pair(rng, planar=True)
        models = twoview.find_models(jax.random.key(0), uv1, uv2, valid)
        rh = float(models.score_h / (models.score_h + models.score_f))
        assert rh > 0.45, rh

    def test_fundamental_epipolar_residuals_small(self):
        rng = np.random.default_rng(3)
        uv1, uv2, valid, K, R21, t21, _ = make_pair(rng, noise=0.1)
        models = twoview.find_models(jax.random.key(1), uv1, uv2, valid)
        assert int(jnp.sum(models.inliers_f)) > 150


class TestReconstruction:
    def test_general_scene_pose_recovery(self):
        rng = np.random.default_rng(4)
        uv1, uv2, valid, K, R21, t21, pts = make_pair(rng, noise=0.2)
        res = twoview.initialize_two_view(
            jax.random.key(2), uv1, uv2, valid, K
        )
        assert bool(res.ok)
        assert not bool(res.used_homography)
        assert rot_angle_deg(np.asarray(res.R21), R21) < 0.5
        # Translation up to scale.
        t_est = np.asarray(res.t21)
        t_true = t21 / np.linalg.norm(t21)
        cos = abs(np.dot(t_est / np.linalg.norm(t_est), t_true))
        assert cos > 0.999, cos
        # Triangulated structure matches up to the same scale.
        good = np.asarray(res.good)
        assert good.sum() > 140
        scale = np.linalg.norm(t21)
        p_est = np.asarray(res.points)[good] * scale
        err = np.linalg.norm(p_est - pts[good], axis=1)
        assert np.median(err) < 0.25, np.median(err)
        assert np.percentile(err, 90) < 0.7, np.percentile(err, 90)

    def test_planar_scene_pose_recovery(self):
        rng = np.random.default_rng(5)
        uv1, uv2, valid, K, R21, t21, pts = make_pair(
            rng, planar=True, noise=0.2, outlier_frac=0.05
        )
        res = twoview.initialize_two_view(
            jax.random.key(3), uv1, uv2, valid, K
        )
        assert bool(res.ok)
        assert rot_angle_deg(np.asarray(res.R21), R21) < 1.0
        t_est = np.asarray(res.t21)
        cos = abs(
            np.dot(t_est / np.linalg.norm(t_est), t21 / np.linalg.norm(t21))
        )
        assert cos > 0.995, cos

    def test_pure_rotation_rejected(self):
        # No translation -> no parallax -> initialization must fail.
        rng = np.random.default_rng(6)
        uv1, uv2, valid, K, *_ = make_pair(
            rng, baseline=0.0, yaw=0.08, noise=0.2, outlier_frac=0.0
        )
        res = twoview.initialize_two_view(jax.random.key(4), uv1, uv2, valid, K)
        assert not bool(res.ok)
