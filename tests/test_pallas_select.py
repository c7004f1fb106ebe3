"""Pallas per-cell top-k vs the XLA iterative oracle.

ops/pallas_select.cell_topk must reproduce ops/fast.topk_iterative
exactly: same values AND same tie-breaking (lowest index wins), since
the packed extraction route's outputs feed bit-exactness tests against
the per-level route.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from orb_slam2_commit_tpu.ops import fast, pallas_select


@pytest.mark.parametrize("shape,k", [
    ((7, 1024), 8),      # non-block-aligned row count
    ((128, 1024), 8),    # exactly one block
    ((1401, 1024), 8),   # production-ish (odd, multi-block)
    ((64, 900), 4),      # S not lane-aligned (cell_size=30)
    ((1, 256), 1),
])
def test_cell_topk_matches_iterative(shape, k):
    c, s = shape
    rng = np.random.default_rng(c * 10000 + s + k)
    x = rng.uniform(0, 50, (c, s)).astype(np.float32)
    # FAST-score-like sparsity: most entries exactly zero.
    x *= rng.uniform(size=x.shape) < 0.03
    # Inject exact ties inside rows to exercise lowest-index tie-breaking.
    for row in range(0, c, 3):
        cols = rng.choice(s, size=4, replace=False)
        x[row, cols] = 41.5
    xj = jnp.asarray(x)
    want_v, want_a = fast.topk_iterative(xj, k)
    got_v, got_a = pallas_select.cell_topk(xj, k, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))
    np.testing.assert_array_equal(np.asarray(got_a), np.asarray(want_a))


def test_cell_topk_all_zero_rows():
    x = jnp.zeros((16, 1024), jnp.float32)
    want_v, want_a = fast.topk_iterative(x, 8)
    got_v, got_a = pallas_select.cell_topk(x, 8, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))
    np.testing.assert_array_equal(np.asarray(got_a), np.asarray(want_a))
