"""Packed-canvas extraction (ops/packed_extractor.py) vs the per-level route.

The packed route must reproduce the per-level extractor bit-for-bit on
every output (modulo exact-tie ordering at budget cutoffs, which random
images make measure-zero): the canvas layout keeps level interiors
untouched and the detection border guarantees no stage ever reads a
cross-level pixel (module docstring spells out the argument).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam2_commit_tpu.ops import extractor as ext
from orb_slam2_commit_tpu.ops import packed_extractor
from orb_slam2_commit_tpu.utils.config import synthetic_config


@pytest.fixture()
def image_and_cfg():
    rng = np.random.default_rng(42)
    h, w = 240, 320
    img = jnp.asarray(rng.uniform(0, 255, (h, w)), jnp.float32)
    cfg = synthetic_config(width=w, height=h, n_features=400).orb
    return img, cfg, h, w


def test_packed_matches_per_level(monkeypatch, image_and_cfg):
    img, cfg, h, w = image_and_cfg
    # Compare against the per-level PATCH route (same IC/BRIEF arithmetic,
    # interpreted Pallas on CPU) so every field can be equal bitwise.
    monkeypatch.setenv("ORB_TPU_FORCE_PATCHES", "1")
    monkeypatch.setenv("ORB_TPU_FORCE_PACKED", "0")
    ref = ext.extract_features(img, cfg, h, w)
    monkeypatch.setenv("ORB_TPU_FORCE_PACKED", "1")
    got = ext.extract_features(img, cfg, h, w)

    np.testing.assert_array_equal(np.asarray(ref.valid), np.asarray(got.valid))
    np.testing.assert_array_equal(np.asarray(ref.octave), np.asarray(got.octave))
    v = np.asarray(ref.valid)
    # Integer corner positions are identical; the subpixel offsets are the
    # same f32 math at different batch shapes (per-level [budget] vs
    # packed [sum budgets]), so reduction order may differ in the last
    # ulps — tolerance far below matching/BA sensitivity.
    np.testing.assert_allclose(
        np.asarray(ref.xy)[v], np.asarray(got.xy)[v], atol=2e-3
    )
    np.testing.assert_array_equal(
        np.asarray(ref.response)[v], np.asarray(got.response)[v]
    )
    np.testing.assert_allclose(
        np.asarray(ref.angle)[v], np.asarray(got.angle)[v], atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(ref.desc)[v], np.asarray(got.desc)[v]
    )


def test_plan_alignment(image_and_cfg):
    _img, cfg, h, w = image_and_cfg
    plan = packed_extractor.make_plan(cfg, h, w)
    for off, ha, (lh, lw) in zip(
        plan.row_offsets, plan.aligned_heights, plan.shapes
    ):
        assert off % cfg.cell_size == 0
        assert ha % cfg.cell_size == 0
        assert ha >= lh
        assert lw <= plan.width
    assert plan.canvas_h == plan.row_offsets[-1] + plan.aligned_heights[-1]
    assert plan.border >= 22


def test_packed_on_synthetic_scene(monkeypatch):
    """Packed extraction on a rendered scene finds a sensible number of
    valid, spatially-spread keypoints (sanity beyond bit-parity)."""
    from orb_slam2_commit_tpu.utils import synthetic

    cfg = synthetic_config(width=320, height=240, n_features=400)
    images, _poses, _scene = synthetic.render_sequence(
        cfg.camera, n_frames=1, n_points=150, seed=5, step=0.05
    )
    monkeypatch.setenv("ORB_TPU_FORCE_PACKED", "1")
    monkeypatch.setenv("ORB_TPU_FORCE_PATCHES", "1")
    feats = ext.extract_features(
        jnp.asarray(images[0], jnp.float32), cfg.orb, 240, 320
    )
    n_valid = int(np.asarray(feats.valid).sum())
    assert n_valid > 80
    xy = np.asarray(feats.xy)[np.asarray(feats.valid)]
    assert xy[:, 0].std() > 30 and xy[:, 1].std() > 20
