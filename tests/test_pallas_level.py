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


class TestCombineNMS:
    """Fused mask + cell-combine + NMS kernel vs the XLA formulation."""

    def _oracle(self, hi, lo, bounds):
        hp, wp = hi.shape
        m = np.zeros((hp, wp), np.float32)
        b = np.asarray(bounds)
        for r in range(hp):
            m[r, b[r, 0]: b[r, 1]] = 1.0
        m = jnp.asarray(m)
        return fast.combine_two_threshold(
            hi * m, lo * m, cell_size=pallas_level.CELL
        )

    @pytest.mark.parametrize("hw", [(128, 128), (256, 384), (192, 256)])
    def test_matches_xla(self, hw):
        hp, wp = hw
        rng = np.random.default_rng(hp + wp)
        # FAST-like sparse non-negative score maps (ties included: small
        # integer-valued scores exercise the raster tie-breaking).
        def smap():
            s = rng.integers(0, 6, (hp, wp)).astype(np.float32)
            s *= rng.random((hp, wp)) < 0.08
            return jnp.asarray(s)

        hi, lo = smap(), smap()
        # Two stacked pseudo-levels with distinct interiors + dead rows.
        bounds = np.zeros((hp, 128), np.int32)
        bounds[20: hp // 2 - 20, 0] = 19
        bounds[20: hp // 2 - 20, 1] = wp - 23
        bounds[hp // 2 + 20: hp - 20, 0] = 19
        bounds[hp // 2 + 20: hp - 20, 1] = wp // 2
        got = pallas_level.combine_nms(
            hi, lo, jnp.asarray(bounds), interpret=True
        )
        ref = self._oracle(hi, lo, bounds)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_all_low_cells(self):
        """No high-threshold responses anywhere -> pure lo map + NMS."""
        hp, wp = 128, 256
        rng = np.random.default_rng(4)
        lo = jnp.asarray(
            (rng.integers(0, 5, (hp, wp)) * (rng.random((hp, wp)) < 0.1))
            .astype(np.float32)
        )
        hi = jnp.zeros((hp, wp), jnp.float32)
        bounds = np.zeros((hp, 128), np.int32)
        bounds[19: hp - 19, 0] = 19
        bounds[19: hp - 19, 1] = wp - 19
        got = pallas_level.combine_nms(
            hi, lo, jnp.asarray(bounds), interpret=True
        )
        ref = self._oracle(hi, lo, bounds)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
