"""Equivalence tests: fused Pallas matching kernels vs the XLA route.

The Pallas kernels (ops/pallas_matching.py) must reproduce
ops/matching.py's dense route bit-exactly, including argmin tie-breaking,
on padded/unpadded shapes and degenerate masks. On CPU they run in
Pallas interpreter mode.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from orb_slam2_commit_tpu.ops import matching
from orb_slam2_commit_tpu.ops import pallas_matching as pm


def _random_desc(rng, n):
    return jnp.asarray(
        rng.integers(0, 2**32, size=(n, 8), dtype=np.uint64).astype(np.uint32)
    )


def _reference_top2(dist, mask):
    d = np.where(np.asarray(mask), np.asarray(dist), int(matching.BIG_DIST))
    best_idx = np.argmin(d, axis=1)
    best = d.min(axis=1)
    d2 = d.copy()
    d2[np.arange(d.shape[0]), best_idx] = int(matching.BIG_DIST)
    second_idx = np.argmin(d2, axis=1)
    second = d2.min(axis=1)
    return best, best_idx, second, second_idx


@pytest.mark.parametrize("m,n", [(64, 100), (128, 128), (300, 517), (1, 1)])
def test_masked_top2_matches_xla(m, n):
    rng = np.random.default_rng(7)
    da, db = _random_desc(rng, m), _random_desc(rng, n)
    mask = jnp.asarray(rng.random((m, n)) < 0.3)
    dist = matching.hamming_distance_matrix(da, db)

    best, bidx, second, sidx = pm.masked_hamming_top2(da, db, mask, interpret=True)
    rb, rbi, rs, rsi = _reference_top2(dist, mask)

    np.testing.assert_array_equal(np.asarray(best), rb)
    np.testing.assert_array_equal(np.asarray(second), rs)
    # Indices must agree wherever a real candidate exists (elsewhere both
    # fall back to an arbitrary argmin-of-BIG column).
    has = np.asarray(mask).any(axis=1)
    np.testing.assert_array_equal(np.asarray(bidx)[has], rbi[has])
    has2 = np.asarray(mask).sum(axis=1) >= 2
    np.testing.assert_array_equal(np.asarray(sidx)[has2], rsi[has2])


def test_masked_top2_all_masked_row():
    rng = np.random.default_rng(3)
    da, db = _random_desc(rng, 8), _random_desc(rng, 16)
    mask = jnp.zeros((8, 16), bool)
    best, bidx, second, sidx = pm.masked_hamming_top2(da, db, mask, interpret=True)
    assert (np.asarray(best) == int(matching.BIG_DIST)).all()
    m = matching.match_from_top2(best, bidx, second, sidx, matching.TH_HIGH)
    assert (np.asarray(m.idx) == -1).all()


@pytest.mark.parametrize("m,n", [(64, 200), (257, 513)])
def test_projection_top2_matches_xla(m, n):
    rng = np.random.default_rng(11)
    da, db = _random_desc(rng, m), _random_desc(rng, n)
    proj = jnp.asarray(rng.uniform(0, 640, (m, 2)), jnp.float32)
    xy = jnp.asarray(rng.uniform(0, 640, (n, 2)), jnp.float32)
    radius = jnp.asarray(rng.uniform(10, 120, (m,)), jnp.float32)
    pt_oct = jnp.asarray(rng.integers(0, 8, (m,)), jnp.int32)
    octave = jnp.asarray(rng.integers(0, 8, (n,)), jnp.int32)
    valid_a = jnp.asarray(rng.random(m) < 0.9)
    valid_b = jnp.asarray(rng.random(n) < 0.9)

    dist = matching.hamming_distance_matrix(da, db)
    mask = (
        valid_a[:, None]
        & valid_b[None, :]
        & matching.window_mask(proj, xy, radius)
        & matching.octave_band_mask(octave, pt_oct - 1, pt_oct + 1)
    )
    best, bidx, second, sidx = pm.projection_hamming_top2(
        da, proj, radius, pt_oct - 1, pt_oct + 1, valid_a,
        db, xy, octave, valid_b, interpret=True,
    )
    rb, rbi, rs, rsi = _reference_top2(dist, mask)
    np.testing.assert_array_equal(np.asarray(best), rb)
    np.testing.assert_array_equal(np.asarray(second), rs)
    has = np.asarray(mask).any(axis=1)
    np.testing.assert_array_equal(np.asarray(bidx)[has], rbi[has])

    # Full MatchResult equivalence through the shared gating (incl. the
    # octave ratio rule used by match_local_map).
    m_pallas = matching.match_from_top2(
        best, bidx, second, sidx, matching.TH_HIGH, 0.8, octave_b=octave
    )
    m_xla = matching.best_match_with_ratio(
        dist, mask, matching.TH_HIGH, 0.8, octave_b=octave
    )
    np.testing.assert_array_equal(np.asarray(m_pallas.idx), np.asarray(m_xla.idx))
    np.testing.assert_array_equal(np.asarray(m_pallas.dist), np.asarray(m_xla.dist))


def test_matcher_route_equivalence(monkeypatch):
    """match_projection_last_frame produces identical results on both routes."""
    import importlib
    from orb_slam2_commit_tpu.slam import matchers

    rng = np.random.default_rng(5)
    m, n = 128, 256
    pt_pos = jnp.asarray(rng.normal(0, 1, (m, 3)) + np.array([0, 0, 5.0]), jnp.float32)
    pt_desc = _random_desc(rng, m)
    pt_oct = jnp.asarray(rng.integers(0, 8, (m,)), jnp.int32)
    pt_angle = jnp.asarray(rng.uniform(0, 2 * np.pi, (m,)), jnp.float32)
    pt_valid = jnp.asarray(rng.random(m) < 0.95)
    R = jnp.eye(3, dtype=jnp.float32)
    t = jnp.zeros(3, jnp.float32)
    xy = jnp.asarray(rng.uniform(0, 640, (n, 2)), jnp.float32)
    desc = _random_desc(rng, n)
    angle = jnp.asarray(rng.uniform(0, 2 * np.pi, (n,)), jnp.float32)
    octave = jnp.asarray(rng.integers(0, 8, (n,)), jnp.int32)
    valid = jnp.asarray(rng.random(n) < 0.95)

    args = (
        pt_pos, pt_desc, pt_oct, pt_angle, pt_valid, R, t,
        xy, desc, angle, octave, valid,
        320.0, 320.0, 320.0, 240.0, 640.0, 480.0,
    )

    monkeypatch.setenv("ORB_TPU_FORCE_PALLAS", "0")
    m_xla = matchers.match_projection_last_frame.__wrapped__(*args, th=15.0)
    monkeypatch.setenv("ORB_TPU_FORCE_PALLAS", "1")
    m_pl = matchers.match_projection_last_frame.__wrapped__(*args, th=15.0)

    np.testing.assert_array_equal(np.asarray(m_xla.idx), np.asarray(m_pl.idx))
    np.testing.assert_array_equal(np.asarray(m_xla.dist), np.asarray(m_pl.dist))
