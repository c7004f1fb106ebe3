"""Unrolled SPD Cholesky solve vs numpy oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from orb_slam2_commit_tpu.optim.linalg import chol_solve_spd


@pytest.mark.parametrize("n", [3, 6, 7])
@pytest.mark.parametrize("batch", [(), (5,), (4, 3)])
def test_chol_solve_matches_numpy(n, batch):
    rng = np.random.default_rng(n * 100 + len(batch))
    A = rng.normal(size=batch + (n, n))
    H = A @ np.swapaxes(A, -1, -2) + n * np.eye(n)
    b = rng.normal(size=batch + (n,))
    want = np.linalg.solve(H, b[..., None])[..., 0]
    got = np.asarray(chol_solve_spd(jnp.asarray(H), jnp.asarray(b)))
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)


def test_chol_solve_near_singular_is_finite():
    # A fully-damped gauge direction: H has a ~zero eigenvalue. The solve
    # must stay finite (pivot floor) rather than produce NaN.
    H = np.diag([1.0, 1.0, 1.0, 1.0, 1.0, 0.0])
    b = np.ones(6)
    got = np.asarray(chol_solve_spd(jnp.asarray(H), jnp.asarray(b)))
    assert np.all(np.isfinite(got[:5]))
    np.testing.assert_allclose(got[:5], 1.0, rtol=1e-9)
