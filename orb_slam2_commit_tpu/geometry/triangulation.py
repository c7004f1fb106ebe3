"""DLT triangulation, batched.

Oracle: Initializer::Triangulate (reference: src/Initializer.cc:1018-1064)
and the SVD triangulation in LocalMapping::CreateNewMapPoints
(src/LocalMapping.cc:420-438). One vmapped 4x4 SVD per point.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def projection_matrix(K: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """P = K [R | t], [3, 4]."""
    return K @ jnp.concatenate([R, t[:, None]], axis=1)


def triangulate_dlt(
    uv1: jnp.ndarray, uv2: jnp.ndarray, P1: jnp.ndarray, P2: jnp.ndarray
) -> jnp.ndarray:
    """Triangulate correspondences uv1, uv2 [N, 2] -> world points [N, 3].

    Rows of A per the reference (src/Initializer.cc:1028-1060):
      x * P[2] - P[0],  y * P[2] - P[1]  for both views; solution is the
    smallest-singular-vector of A, dehomogenized.
    """

    def one(uv1_i, uv2_i):
        A = jnp.stack(
            [
                uv1_i[0] * P1[2] - P1[0],
                uv1_i[1] * P1[2] - P1[1],
                uv2_i[0] * P2[2] - P2[0],
                uv2_i[1] * P2[2] - P2[1],
            ]
        )
        # Smallest right singular vector via eigh of A^T A (4x4 symmetric):
        # cheaper and more TPU-friendly than full SVD.
        _, V = jnp.linalg.eigh(A.T @ A)
        x = V[:, 0]
        w = jnp.where(jnp.abs(x[3]) > 1e-12, x[3], 1e-12)
        return x[:3] / w

    return jax.vmap(one)(uv1, uv2)


def reprojection_error_sq(
    points: jnp.ndarray, uv: jnp.ndarray, P: jnp.ndarray
) -> jnp.ndarray:
    """Squared pixel reprojection error of world points [N, 3] under P."""
    ph = jnp.concatenate([points, jnp.ones_like(points[:, :1])], axis=1)
    proj = ph @ P.T
    z = jnp.where(jnp.abs(proj[:, 2]) > 1e-12, proj[:, 2], 1e-12)
    du = proj[:, 0] / z - uv[:, 0]
    dv = proj[:, 1] / z - uv[:, 1]
    return du * du + dv * dv


def depths(points: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """z coordinate of world points in the camera frame (R, t)."""
    return points @ R[2] + t[2]


def cos_parallax(
    points: jnp.ndarray, c1: jnp.ndarray, c2: jnp.ndarray
) -> jnp.ndarray:
    """Cosine of the ray angle between camera centers c1, c2 and each point
    (reference: src/Initializer.cc:1199-1211)."""
    r1 = points - c1[None]
    r2 = points - c2[None]
    n1 = jnp.linalg.norm(r1, axis=1)
    n2 = jnp.linalg.norm(r2, axis=1)
    return jnp.sum(r1 * r2, axis=1) / jnp.maximum(n1 * n2, 1e-12)
