"""SO3 / SE3 / Sim3 manifold operations.

TPU-native replacement for the reference's g2o manifold types
(reference: Thirdparty/g2o/g2o/types/se3quat.h, sim3.h, se3_ops.h,
types_six_dof_expmap.h:73-76). Everything is a pure jnp function, batched
by construction (leading dims broadcast), float32 by default with float64
available for sensitive BA accumulations.

Conventions:
- Rotations are 3x3 matrices `R`; rigid transforms are (R, t) pairs acting
  as x_cam = R @ x_world + t (the reference's Tcw convention).
- se3 tangent vectors are [omega(3), upsilon(3)] — rotation first, matching
  g2o's SE3Quat::exp ordering so Jacobian blocks line up with the oracle.
- sim3 tangent vectors are [omega(3), upsilon(3), sigma(1)].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix of w[..., 3] (reference: src/LocalMapping.cc:873-878)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zero = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([zero, -wz, wy], axis=-1),
            jnp.stack([wz, zero, -wx], axis=-1),
            jnp.stack([-wy, wx, zero], axis=-1),
        ],
        axis=-2,
    )


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues' formula: exp of so3 tangent w[..., 3] -> R[..., 3, 3]."""
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    # Taylor-safe coefficients: sin(t)/t and (1-cos t)/t^2.
    a = jnp.sin(theta) / theta
    b = (1.0 - jnp.cos(theta)) / (theta2 + _EPS * _EPS)
    small = theta2 < 1e-8
    a = jnp.where(small, 1.0 - theta2 / 6.0, a)
    b = jnp.where(small, 0.5 - theta2 / 24.0, b)
    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * W2


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """Log map R[..., 3, 3] -> w[..., 3]."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    # Off-diagonal antisymmetric part.
    v = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    sin_theta = jnp.sin(theta)
    # theta/(2 sin theta), Taylor-safe near 0. Near pi sin->0: handle via
    # diagonal extraction fallback. Masked-safe denominator: never add eps
    # to a live denominator (it poisons precision near the branch point).
    generic = jnp.abs(sin_theta) > 1e-5
    safe_sin = jnp.where(generic, sin_theta, 1.0)
    scale = jnp.where(
        generic,
        theta / (2.0 * safe_sin),
        0.5 + theta * theta / 12.0,
    )
    w_generic = v * scale[..., None]
    # Near-pi fallback: |w| = theta, direction from diag of (R + I)/2.
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    axis2 = jnp.clip((diag - cos_theta[..., None]) / (1.0 - cos_theta[..., None] + _EPS), 0.0, None)
    axis = jnp.sqrt(axis2)
    # Fix signs from off-diagonal sums.
    sx = jnp.where(R[..., 2, 1] - R[..., 1, 2] < 0, -1.0, 1.0)
    sy = jnp.where(R[..., 0, 2] - R[..., 2, 0] < 0, -1.0, 1.0)
    sz = jnp.where(R[..., 1, 0] - R[..., 0, 1] < 0, -1.0, 1.0)
    # Near pi the off-diagonal differences vanish; use products instead for
    # relative signs, anchored on the largest axis component.
    signs = jnp.stack([sx, sy, sz], axis=-1)
    w_pi = axis * signs * theta[..., None]
    near_pi = jnp.abs(sin_theta) <= 1e-5
    near_zero = theta < 1e-5
    w = jnp.where((near_pi & ~near_zero)[..., None], w_pi, w_generic)
    return w


def _so3_left_jacobian(w: jnp.ndarray) -> jnp.ndarray:
    """Left Jacobian J of SO3 s.t. exp([w,v]) translation = J @ v."""
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    W = hat(w)
    W2 = W @ W
    b = (1.0 - jnp.cos(theta)) / (theta2 + _EPS * _EPS)
    c = (theta - jnp.sin(theta)) / (theta2 * theta + _EPS)
    small = theta2 < 1e-8
    b = jnp.where(small, 0.5 - theta2 / 24.0, b)
    c = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, c)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + b[..., None, None] * W + c[..., None, None] * W2


def _so3_left_jacobian_inv(w: jnp.ndarray) -> jnp.ndarray:
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    W = hat(w)
    W2 = W @ W
    small = theta2 < 1e-6
    half_theta = 0.5 * theta
    safe_sin = jnp.where(small, 1.0, jnp.sin(half_theta))
    safe_theta2 = jnp.where(small, 1.0, theta2)
    cot = jnp.cos(half_theta) / safe_sin
    k = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - half_theta * cot) / safe_theta2,
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye - 0.5 * W + k[..., None, None] * W2


def se3_exp(xi: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """exp of se3 tangent xi[..., 6] = [omega, upsilon] -> (R, t)."""
    w, v = xi[..., :3], xi[..., 3:]
    R = so3_exp(w)
    J = _so3_left_jacobian(w)
    t = jnp.einsum("...ij,...j->...i", J, v)
    return R, t


def se3_log(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """log of (R, t) -> xi[..., 6] = [omega, upsilon]."""
    w = so3_log(R)
    Jinv = _so3_left_jacobian_inv(w)
    v = jnp.einsum("...ij,...j->...i", Jinv, t)
    return jnp.concatenate([w, v], axis=-1)


def se3_compose(
    Ra: jnp.ndarray, ta: jnp.ndarray, Rb: jnp.ndarray, tb: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(Ra, ta) * (Rb, tb): apply b first, then a."""
    return Ra @ Rb, jnp.einsum("...ij,...j->...i", Ra, tb) + ta


def se3_inverse(R: jnp.ndarray, t: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -jnp.einsum("...ij,...j->...i", Rt, t)


def se3_apply(R: jnp.ndarray, t: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Transform points x[..., 3]."""
    return jnp.einsum("...ij,...j->...i", R, x) + t


def se3_matrix(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Homogeneous 4x4 matrix from (R, t)."""
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), R.shape[:-2] + (1, 4)
    )
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def se3_from_matrix(T: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    return T[..., :3, :3], T[..., :3, 3]


def rotation_to_quaternion(R: jnp.ndarray) -> jnp.ndarray:
    """R[..., 3, 3] -> quaternion [..., 4] as (qx, qy, qz, qw), unit norm.

    Branch-free Shepperd's method (all four candidate quaternions computed,
    the best-conditioned one selected by mask) so it vmaps cleanly.
    Matches the reference's trajectory export convention
    (reference: src/System.cc:390 writes qx qy qz qw).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, _EPS))

    # Candidate 0: trace-dominant.
    s0 = safe_sqrt(tr + 1.0) * 2.0
    q0 = jnp.stack([(m21 - m12) / s0, (m02 - m20) / s0, (m10 - m01) / s0, 0.25 * s0], -1)
    # Candidate 1: m00 dominant.
    s1 = safe_sqrt(1.0 + m00 - m11 - m22) * 2.0
    q1 = jnp.stack([0.25 * s1, (m01 + m10) / s1, (m02 + m20) / s1, (m21 - m12) / s1], -1)
    # Candidate 2: m11 dominant.
    s2 = safe_sqrt(1.0 + m11 - m00 - m22) * 2.0
    q2 = jnp.stack([(m01 + m10) / s2, 0.25 * s2, (m12 + m21) / s2, (m02 - m20) / s2], -1)
    # Candidate 3: m22 dominant.
    s3 = safe_sqrt(1.0 + m22 - m00 - m11) * 2.0
    q3 = jnp.stack([(m02 + m20) / s3, (m12 + m21) / s3, 0.25 * s3, (m10 - m01) / s3], -1)

    cond0 = tr > 0.0
    cond1 = (m00 >= m11) & (m00 >= m22)
    cond2 = m11 >= m22
    q = jnp.where(
        cond0[..., None],
        q0,
        jnp.where(cond1[..., None], q1, jnp.where(cond2[..., None], q2, q3)),
    )
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quaternion_to_rotation(q: jnp.ndarray) -> jnp.ndarray:
    """(qx, qy, qz, qw)[..., 4] -> R[..., 3, 3]."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)], -1),
            jnp.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)], -1),
            jnp.stack([2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )


# ---------------------------------------------------------------------------
# Sim3 (reference: Thirdparty/g2o/g2o/types/sim3.h) — used by loop closure.
# Represented as (s, R, t): x -> s * R @ x + t.
# ---------------------------------------------------------------------------


def sim3_apply(s: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    return s[..., None] * jnp.einsum("...ij,...j->...i", R, x) + t


def sim3_inverse(
    s: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    Rt = jnp.swapaxes(R, -1, -2)
    s_inv = 1.0 / s
    return s_inv, Rt, -s_inv[..., None] * jnp.einsum("...ij,...j->...i", Rt, t)


def sim3_compose(sa, Ra, ta, sb, Rb, tb):
    """(sa,Ra,ta) * (sb,Rb,tb): apply b first."""
    return (
        sa * sb,
        Ra @ Rb,
        sa[..., None] * jnp.einsum("...ij,...j->...i", Ra, tb) + ta,
    )


def _sim3_w_matrix(w: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
    """The sim3 'V' matrix: t = V @ upsilon for exp([omega, upsilon, sigma]).

    V = integral_0^1 e^{sigma*u} exp(u * hat(w)) du
      = C*I + A*hat(w) + B*hat(w)^2
    with closed forms (s = e^sigma, theta = |w|, a = s*sin(theta),
    b = s*cos(theta), c = sigma^2 + theta^2):
      C = (s - 1)/sigma
      A = (a*sigma + (1 - b)*theta) / (theta * c)
      B = (C - ((b - 1)*sigma + a*theta)/c) / theta^2
    with Taylor-safe limits for small sigma and/or theta.
    """
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    s = jnp.exp(sigma)
    sig2 = sigma * sigma
    sin_t, cos_t = jnp.sin(theta), jnp.cos(theta)
    a = s * sin_t
    b = s * cos_t
    c = sig2 + theta2

    small_sigma = jnp.abs(sigma) < 1e-5
    small_theta = theta2 < 1e-8

    C = jnp.where(small_sigma, 1.0 + sigma / 2.0 + sig2 / 6.0, (s - 1.0) / (sigma + _EPS))

    a_gen = (a * sigma + (1.0 - b) * theta) / (theta * c + _EPS)
    b_gen = (C - ((b - 1.0) * sigma + a * theta) / (c + _EPS)) / (theta2 + _EPS)
    # sigma -> 0: the SE3 left-Jacobian coefficients.
    a_sig0 = (1.0 - cos_t) / (theta2 + _EPS)
    b_sig0 = (theta - sin_t) / (theta2 * theta + _EPS)
    # theta -> 0, sigma != 0: A = (s(sigma-1)+1)/sigma^2,
    #                         B = (s(sigma^2-2sigma+2)-2)/(2 sigma^3).
    a_th0 = jnp.where(
        small_sigma,
        0.5 + sigma / 3.0,
        (s * (sigma - 1.0) + 1.0) / (sig2 + _EPS),
    )
    b_th0 = jnp.where(
        small_sigma,
        1.0 / 6.0 + sigma / 8.0,
        (s * (sig2 - 2.0 * sigma + 2.0) - 2.0) / (2.0 * sig2 * sigma + _EPS),
    )

    A = jnp.where(small_theta, a_th0, jnp.where(small_sigma, a_sig0, a_gen))
    B = jnp.where(small_theta, b_th0, jnp.where(small_sigma, b_sig0, b_gen))

    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return C[..., None, None] * eye + A[..., None, None] * W + B[..., None, None] * W2


def sim3_exp(xi: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """exp of sim3 tangent xi[..., 7] = [omega, upsilon, sigma] -> (s, R, t).

    Same manifold as g2o's Sim3 (reference: Thirdparty/g2o/g2o/types/sim3.h),
    used by the loop-closure Sim3 optimization and the essential-graph solve.
    """
    w, v, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    R = so3_exp(w)
    s = jnp.exp(sigma)
    V = _sim3_w_matrix(w, sigma)
    t = jnp.einsum("...ij,...j->...i", V, v)
    return s, R, t


def sim3_log(s: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """log of (s, R, t) -> xi[..., 7] = [omega, upsilon, sigma]."""
    w = so3_log(R)
    sigma = jnp.log(s)
    V = _sim3_w_matrix(w, sigma)
    v = jnp.linalg.solve(V, t[..., None])[..., 0]
    return jnp.concatenate([w, v, sigma[..., None]], axis=-1)
