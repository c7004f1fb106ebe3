"""Unit tests for SO3/SE3/Sim3 ops against NumPy/scipy-free oracles."""

import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam2_commit_tpu.ops import lie


def rand_rotation(rng):
    """Random rotation via QR of a Gaussian matrix (det fixed to +1)."""
    A = rng.standard_normal((3, 3))
    Q, R = np.linalg.qr(A)
    Q = Q @ np.diag(np.sign(np.diag(R)))
    if np.linalg.det(Q) < 0:
        Q[:, 0] = -Q[:, 0]
    return Q


def np_rodrigues(w):
    theta = np.linalg.norm(w)
    if theta < 1e-12:
        return np.eye(3)
    k = w / theta
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * (K @ K)


class TestSO3:
    def test_exp_matches_rodrigues(self):
        rng = np.random.default_rng(0)
        for _ in range(20):
            w = rng.standard_normal(3) * 2.0
            R = np.asarray(lie.so3_exp(jnp.asarray(w)))
            np.testing.assert_allclose(R, np_rodrigues(w), atol=1e-6)

    def test_exp_small_angle(self):
        w = np.array([1e-9, -2e-9, 1e-9])
        R = np.asarray(lie.so3_exp(jnp.asarray(w)))
        np.testing.assert_allclose(R, np_rodrigues(w), atol=1e-8)

    def test_log_roundtrip(self):
        rng = np.random.default_rng(1)
        for _ in range(50):
            w = rng.standard_normal(3)
            w = w / np.linalg.norm(w) * rng.uniform(1e-4, 3.0)
            R = np_rodrigues(w)
            w_back = np.asarray(lie.so3_log(jnp.asarray(R)))
            np.testing.assert_allclose(w_back, w, atol=1e-4)

    def test_log_identity(self):
        w = np.asarray(lie.so3_log(jnp.eye(3)))
        np.testing.assert_allclose(w, np.zeros(3), atol=1e-6)

    def test_batched(self):
        rng = np.random.default_rng(2)
        ws = rng.standard_normal((7, 3))
        Rs = np.asarray(lie.so3_exp(jnp.asarray(ws)))
        for i in range(7):
            np.testing.assert_allclose(Rs[i], np_rodrigues(ws[i]), atol=1e-6)


class TestSE3:
    def test_exp_log_roundtrip(self):
        rng = np.random.default_rng(3)
        for _ in range(20):
            xi = rng.standard_normal(6)
            # Keep |omega| < pi: log returns the principal rotation branch.
            if np.linalg.norm(xi[:3]) >= np.pi:
                xi[:3] *= (np.pi - 1e-3) / np.linalg.norm(xi[:3])
            R, t = lie.se3_exp(jnp.asarray(xi))
            xi_back = np.asarray(lie.se3_log(R, t))
            np.testing.assert_allclose(xi_back, xi, atol=1e-5)

    def test_compose_inverse(self):
        rng = np.random.default_rng(4)
        Ra, ta = rand_rotation(rng), rng.standard_normal(3)
        Rb, tb = rand_rotation(rng), rng.standard_normal(3)
        Rc, tc = lie.se3_compose(jnp.asarray(Ra), jnp.asarray(ta), jnp.asarray(Rb), jnp.asarray(tb))
        x = rng.standard_normal(3)
        # (a*b)(x) == a(b(x))
        lhs = np.asarray(lie.se3_apply(Rc, tc, jnp.asarray(x)))
        rhs = Ra @ (Rb @ x + tb) + ta
        np.testing.assert_allclose(lhs, rhs, atol=1e-6)
        Ri, ti = lie.se3_inverse(Rc, tc)
        Re, te = lie.se3_compose(Ri, ti, Rc, tc)
        np.testing.assert_allclose(np.asarray(Re), np.eye(3), atol=1e-6)
        np.testing.assert_allclose(np.asarray(te), np.zeros(3), atol=1e-6)

    def test_matrix_roundtrip(self):
        rng = np.random.default_rng(5)
        R, t = rand_rotation(rng), rng.standard_normal(3)
        T = np.asarray(lie.se3_matrix(jnp.asarray(R), jnp.asarray(t)))
        assert T.shape == (4, 4)
        np.testing.assert_allclose(T[3], [0, 0, 0, 1])
        R2, t2 = lie.se3_from_matrix(jnp.asarray(T))
        np.testing.assert_allclose(np.asarray(R2), R)
        np.testing.assert_allclose(np.asarray(t2), t)


class TestQuaternion:
    def test_roundtrip(self):
        rng = np.random.default_rng(6)
        for _ in range(30):
            R = rand_rotation(rng)
            q = lie.rotation_to_quaternion(jnp.asarray(R))
            R2 = np.asarray(lie.quaternion_to_rotation(q))
            np.testing.assert_allclose(R2, R, atol=1e-6)

    def test_unit_norm(self):
        rng = np.random.default_rng(7)
        R = rand_rotation(rng)
        q = np.asarray(lie.rotation_to_quaternion(jnp.asarray(R)))
        np.testing.assert_allclose(np.linalg.norm(q), 1.0, atol=1e-6)

    def test_near_pi_rotations(self):
        for axis in (np.array([1.0, 0, 0]), np.array([0, 1.0, 0]),
                     np.array([0.577, 0.577, 0.577])):
            R = np_rodrigues(axis / np.linalg.norm(axis) * (np.pi - 1e-4))
            q = lie.rotation_to_quaternion(jnp.asarray(R))
            R2 = np.asarray(lie.quaternion_to_rotation(q))
            np.testing.assert_allclose(R2, R, atol=1e-5)


class TestSim3:
    def test_exp_sigma_zero_matches_se3(self):
        rng = np.random.default_rng(8)
        xi6 = rng.standard_normal(6)
        xi7 = np.concatenate([xi6, [0.0]])
        s, R, t = lie.sim3_exp(jnp.asarray(xi7))
        R_se3, t_se3 = lie.se3_exp(jnp.asarray(xi6))
        np.testing.assert_allclose(float(s), 1.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(R), np.asarray(R_se3), atol=1e-6)
        np.testing.assert_allclose(np.asarray(t), np.asarray(t_se3), atol=1e-5)

    def test_exp_log_roundtrip(self):
        rng = np.random.default_rng(9)
        for _ in range(20):
            xi = rng.standard_normal(7) * 0.8
            s, R, t = lie.sim3_exp(jnp.asarray(xi))
            xi_back = np.asarray(lie.sim3_log(s, R, t))
            np.testing.assert_allclose(xi_back, xi, atol=1e-5)

    def test_compose_apply(self):
        rng = np.random.default_rng(10)
        sa, Ra, ta = 1.5, rand_rotation(rng), rng.standard_normal(3)
        sb, Rb, tb = 0.7, rand_rotation(rng), rng.standard_normal(3)
        x = rng.standard_normal(3)
        sc, Rc, tc = lie.sim3_compose(
            jnp.asarray(sa), jnp.asarray(Ra), jnp.asarray(ta),
            jnp.asarray(sb), jnp.asarray(Rb), jnp.asarray(tb),
        )
        lhs = np.asarray(lie.sim3_apply(sc, Rc, tc, jnp.asarray(x)))
        rhs = sa * Ra @ (sb * Rb @ x + tb) + ta
        np.testing.assert_allclose(lhs, rhs, atol=1e-5)

    def test_inverse(self):
        rng = np.random.default_rng(11)
        s, R, t = 2.0, rand_rotation(rng), rng.standard_normal(3)
        si, Ri, ti = lie.sim3_inverse(jnp.asarray(s), jnp.asarray(R), jnp.asarray(t))
        x = rng.standard_normal(3)
        y = lie.sim3_apply(jnp.asarray(s), jnp.asarray(R), jnp.asarray(t), jnp.asarray(x))
        x_back = np.asarray(lie.sim3_apply(si, Ri, ti, y))
        np.testing.assert_allclose(x_back, x, atol=1e-5)


class TestHat:
    def test_cross_product_equivalence(self):
        rng = np.random.default_rng(12)
        a, b = rng.standard_normal(3), rng.standard_normal(3)
        lhs = np.asarray(lie.hat(jnp.asarray(a))) @ b
        np.testing.assert_allclose(lhs, np.cross(a, b), atol=1e-7)
