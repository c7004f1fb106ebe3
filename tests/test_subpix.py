"""Gradient-based subpixel corner refinement oracles."""

import numpy as np
import jax.numpy as jnp
import pytest

from orb_slam2_commit_tpu.ops import subpix


def _checker_aa(h, w, cy, cx, amp=100.0):
    """Antialiased checkerboard corner at subpixel (cy, cx): each pixel
    holds the exact coverage fraction of the quadrant pattern (a hard
    sign() pattern would quantize the edge to the pixel grid and make the
    oracle position meaningless)."""
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    sx = 2 * np.clip(xs + 0.5 - cx, 0, 1) - 1
    sy = 2 * np.clip(ys + 0.5 - cy, 0, 1) - 1
    return (amp * sx * sy + amp).astype(np.float32)


@pytest.mark.parametrize("frac", [(0.0, 0.0), (0.3, -0.2), (-0.45, 0.4),
                                  (0.15, 0.35)])
def test_recovers_checkerboard_corner(frac):
    # The gradient-orthogonality point of a checkerboard corner is its
    # vertex — cv::cornerSubPix's exact case.
    fy, fx = frac
    cy, cx = 20.0 + fy, 30.0 + fx
    img = _checker_aa(48, 64, cy, cx)
    yx = jnp.asarray([[20, 30]], jnp.int32)
    off = np.asarray(subpix.corner_subpix_offsets(jnp.asarray(img), yx))[0]
    np.testing.assert_allclose(20.0 + off[0], cy, atol=0.08)
    np.testing.assert_allclose(30.0 + off[1], cx, atol=0.08)


def test_flat_region_zero_offset():
    img = jnp.full((40, 40), 57.0, jnp.float32)
    yx = jnp.asarray([[20, 20]], jnp.int32)
    off = np.asarray(subpix.corner_subpix_offsets(img, yx))[0]
    np.testing.assert_array_equal(off, 0.0)


def test_edge_region_zero_offset():
    # A pure vertical edge: the 2x2 gradient normal matrix is singular
    # (no constraint along the edge) — the guard must refuse to move.
    img = np.zeros((40, 40), np.float32)
    img[:, 20:] = 100.0
    yx = jnp.asarray([[20, 20]], jnp.int32)
    off = np.asarray(subpix.corner_subpix_offsets(jnp.asarray(img), yx))[0]
    assert abs(off[0]) < 0.5  # unconstrained direction stays put

def test_offsets_clamped():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, (64, 64)), jnp.float32)
    yx = jnp.asarray(rng.integers(8, 56, (32, 2)), jnp.int32)
    off = np.asarray(subpix.corner_subpix_offsets(img, yx))
    assert np.all(np.abs(off) <= 1.0 + 1e-6)
    assert np.all(np.isfinite(off))


def test_from_patches_matches_gather_route():
    from orb_slam2_commit_tpu.ops import pallas_patches

    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.uniform(0, 255, (96, 128)), jnp.float32)
    yx = jnp.asarray(rng.integers(20, 70, (16, 2)), jnp.int32)
    want = np.asarray(subpix.corner_subpix_offsets(img, yx))
    P = pallas_patches.extract_patches(img, yx, 31, interpret=True)
    got = np.asarray(subpix.corner_subpix_from_patches(P, 15, 15))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_pallas_from_patches_matches_xla_route():
    from orb_slam2_commit_tpu.ops import pallas_patches

    rng = np.random.default_rng(9)
    img = jnp.asarray(rng.uniform(0, 255, (128, 160)), jnp.float32)
    yx = jnp.asarray(rng.integers(20, 100, (37, 2)), jnp.int32)
    P = pallas_patches.extract_patches(img, yx, 31, interpret=True)
    want = np.asarray(subpix.corner_subpix_from_patches(P, 15, 15))
    got = np.asarray(subpix.corner_subpix_from_patches_pallas(
        P, 15, 15, interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-5)
