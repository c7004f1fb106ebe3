"""Small dense SPD solves, unrolled for XLA fusion.

jnp.linalg.solve on a 6x6 lowers to pivoted LU — a chain of dynamic-slice
kernels that cannot fuse with the surrounding graph. Inside the
per-frame LM while_loop (optim/pose_opt.py) that chain is pure kernel
launch latency on TPU. The normal-equation systems here are symmetric
positive definite by construction (J^T W J + LM damping), so an
unrolled Cholesky — a static scalar dataflow graph XLA fuses into ONE
kernel — is both faster and the numerically standard choice
(the reference solves the same systems with Cholesky: g2o
LinearSolverEigen/SimplicialLDLT, Thirdparty/g2o/g2o/solvers/
linear_solver_eigen.h:51-60).

Batched: all leading axes broadcast; the unrolled loops are over the
static matrix dimension only.
"""

from __future__ import annotations

import jax.numpy as jnp


def chol_solve_spd(H: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve H x = b for SPD H[..., n, n], b[..., n]; n static & small.

    Unrolled Cholesky + two triangular solves. Diagonal pivots are
    clamped to a tiny positive floor so a semidefinite H (gauge-free
    directions fully damped elsewhere) yields a finite, harmlessly
    large-magnitude-free step instead of NaNs.
    """
    n = H.shape[-1]
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = H[..., j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        d = jnp.sqrt(jnp.maximum(s, 1e-30))
        L[j][j] = d
        for i in range(j + 1, n):
            s2 = H[..., i, j]
            for k in range(j):
                s2 = s2 - L[i][k] * L[j][k]
            L[i][j] = s2 / d
    y = [None] * n
    for i in range(n):
        s = b[..., i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x, axis=-1)
