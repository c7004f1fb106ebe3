"""Pallas patch-extraction kernel + patch-route descriptor equivalence.

The TPU descriptor route (ops/pallas_patches.py + the *_patches functions
in ops/descriptors.py) must reproduce the XLA gather route: patches
bit-exactly, BRIEF bits exactly (same binned-offset table, one-hot f32
selection matmul), IC angles to float tolerance.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from orb_slam2_commit_tpu.ops import descriptors, pallas_patches, pyramid


def _clip_gather(img, yx, patch):
    half = patch // 2
    h, w = img.shape
    d = np.arange(-half, half + 1)
    ys = np.clip(yx[:, 0, None] + d[None, :], 0, h - 1)
    xs = np.clip(yx[:, 1, None] + d[None, :], 0, w - 1)
    return img[ys[:, :, None], xs[:, None, :]]


@pytest.mark.parametrize("patch", [31, 39])
def test_extract_patches_oracle(patch):
    rng = np.random.default_rng(0)
    h, w = 96, 140
    img = rng.normal(size=(h, w)).astype(np.float32)
    yx = np.concatenate(
        [
            np.array([[0, 0], [h - 1, w - 1], [3, w - 2], [h - 4, 1]]),
            np.stack(
                [rng.integers(0, h, 8), rng.integers(0, w, 8)], -1
            ),
        ]
    ).astype(np.int32)
    out = pallas_patches.extract_patches(
        jnp.asarray(img), jnp.asarray(yx), patch, interpret=True, k_tile=4
    )
    got = np.asarray(out)[:, :patch, :patch]
    np.testing.assert_array_equal(got, _clip_gather(img, yx, patch))


def test_brief_patch_route_exact():
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 255, size=(128, 160)).astype(np.float32)
    blurred = pyramid.gaussian_blur(jnp.asarray(img))
    n = 64
    yx = jnp.asarray(
        np.stack(
            [rng.integers(20, 108, n), rng.integers(20, 140, n)], -1
        ),
        jnp.int32,
    )
    # Cover every steering bin (exercises all four quadrant pre-rotations
    # of the decomposed route) plus random angles.
    angle = jnp.asarray(
        np.concatenate(
            [
                (np.arange(32) + 0.5) * 2 * np.pi / 32 - np.pi,
                rng.uniform(-np.pi, np.pi, 32),
            ]
        ),
        jnp.float32,
    )
    d_gather = descriptors.brief_descriptors(blurred, yx, angle)
    d_patch = descriptors.brief_descriptors_patches(blurred, yx, angle)
    np.testing.assert_array_equal(np.asarray(d_gather), np.asarray(d_patch))


def test_ic_angle_patch_route_close():
    rng = np.random.default_rng(2)
    img = rng.uniform(0, 255, size=(128, 160)).astype(np.float32)
    n = 16
    yx = jnp.asarray(
        np.stack(
            [rng.integers(16, 112, n), rng.integers(16, 144, n)], -1
        ),
        jnp.int32,
    )
    a_dense = np.asarray(descriptors.ic_angle(jnp.asarray(img), yx))
    a_patch = np.asarray(descriptors.ic_angle_patches(jnp.asarray(img), yx))
    # Same math, different summation order: float-level agreement.
    d = np.abs(np.angle(np.exp(1j * (a_dense - a_patch))))
    assert d.max() < 1e-4, d.max()


def test_binned_offsets_table():
    offs = descriptors.binned_offsets()
    assert offs.shape == (descriptors.N_ANGLE_BINS, 256, 2, 2)
    assert np.abs(offs).max() <= descriptors.BRIEF_HALF
    # Bin 0 center is -pi + half-width; bins must cover distinct rotations.
    assert not np.array_equal(offs[0], offs[descriptors.N_ANGLE_BINS // 2])


def test_extractor_patch_route_end_to_end(monkeypatch):
    """Full extract_features with the patch route forced on (interpreter)
    matches the gather route except where IC-angle float differences flip
    a steering bin."""
    from orb_slam2_commit_tpu.ops import extractor as ext
    from orb_slam2_commit_tpu.utils.config import synthetic_config

    rng = np.random.default_rng(3)
    h, w = 120, 160
    img = jnp.asarray(rng.uniform(0, 255, (h, w)), jnp.float32)
    cfg = synthetic_config(width=w, height=h, n_features=200).orb

    monkeypatch.setenv("ORB_TPU_FORCE_PATCHES", "0")
    f_g = ext.extract_features(img, cfg, h, w)
    monkeypatch.setenv("ORB_TPU_FORCE_PATCHES", "1")
    f_p = ext.extract_features(img, cfg, h, w)

    np.testing.assert_array_equal(np.asarray(f_g.xy), np.asarray(f_p.xy))
    same_bin = np.asarray(
        descriptors.angle_bin(f_g.angle) == descriptors.angle_bin(f_p.angle)
    )
    valid = np.asarray(f_g.valid)
    assert same_bin[valid].mean() > 0.95
    eq = np.asarray(f_g.desc) == np.asarray(f_p.desc)
    np.testing.assert_array_equal(
        eq[valid & same_bin].all(axis=-1),
        np.ones((valid & same_bin).sum(), bool),
    )
