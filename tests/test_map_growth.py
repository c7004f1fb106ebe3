"""Dynamic map capacity growth: fixed-shape arrays double in place when
keyframe/point allocation hits the wall (the reference's pointer graph has
no caps; long sequences must not crash the array map)."""

import dataclasses

import numpy as np

from orb_slam2_commit_tpu.models.map_state import MapState
from orb_slam2_commit_tpu.utils.config import MapConfig


def _add_kf(m: MapState, n_feat: int, pt_ids=None) -> int:
    n = n_feat
    point_idx = np.full(n, -1, np.int32)
    if pt_ids is not None:
        point_idx[: len(pt_ids)] = pt_ids
    return m.add_keyframe(
        np.eye(3), np.zeros(3),
        np.zeros((n, 2), np.float32), np.zeros(n, np.int32),
        np.zeros(n, np.float32), np.zeros((n, 8), np.uint32),
        np.ones(n, bool), point_idx, frame_id=m.next_kf, timestamp=0.0,
    )


def test_keyframe_capacity_doubles():
    cfg = MapConfig(max_keyframes=4, max_points=32)
    m = MapState.create(cfg, n_feat=16)
    grows = []
    m.grow_hooks = [lambda kind, cap: grows.append((kind, cap))]
    ids = m.add_points(np.zeros((8, 3)), first_kf=0)
    for _ in range(10):
        _add_kf(m, 16, pt_ids=ids[:4])
    assert m.next_kf == 10
    assert m.cfg.max_keyframes >= 10
    assert m.kf_valid.shape[0] == m.cfg.max_keyframes
    assert m.cov_weight.shape == (m.cfg.max_keyframes,) * 2
    assert ("keyframes", 8) in grows and ("keyframes", 16) in grows
    # Covisibility survives growth: every pair of the 10 KFs shares 4 pts.
    assert m.cov_weight[0, 9] == 4
    # New slots are clean.
    assert not m.kf_valid[m.next_kf:].any()
    assert (m.kf_point_idx[m.next_kf:] == -1).all()


def test_point_capacity_doubles():
    cfg = MapConfig(max_keyframes=4, max_points=8)
    m = MapState.create(cfg, n_feat=16)
    grows = []
    m.grow_hooks = [lambda kind, cap: grows.append((kind, cap))]
    ids1 = m.add_points(np.ones((6, 3)), first_kf=0)
    ids2 = m.add_points(2 * np.ones((20, 3)), first_kf=0)
    assert m.next_pt == 26
    assert m.cfg.max_points >= 26
    assert m.pt_pos.shape[0] == m.cfg.max_points
    np.testing.assert_array_equal(m.pt_pos[ids1], np.ones((6, 3)))
    np.testing.assert_array_equal(m.pt_pos[ids2], 2 * np.ones((20, 3)))
    assert any(k == "points" for k, _ in grows)
    assert not m.pt_valid[m.next_pt:].any()


def test_database_grows_with_map():
    from orb_slam2_commit_tpu.models.kf_database import KeyFrameDatabase
    from orb_slam2_commit_tpu.models.vocabulary import BinaryVocabulary

    rng = np.random.default_rng(0)
    descs = rng.integers(0, 2 ** 32, size=(64, 8), dtype=np.uint32)
    voc = BinaryVocabulary.train(descs, k=3, levels=2, seed=0)
    db = KeyFrameDatabase(voc, max_keyframes=4)
    db.add(1, descs[:16], np.ones(16, bool))
    db.grow("keyframes", 8)
    assert db.present.shape[0] == 8
    assert db.word_ids.shape[0] == 8
    # Growing to a smaller/equal capacity is a no-op.
    db.grow("keyframes", 4)
    assert db.present.shape[0] == 8
    db.add(6, descs[:16], np.ones(16, bool))
    assert db.present[6]
    assert db.present[1]
    # Grown rows score identically to pre-grow content.
    assert db.score_between(1, 6) > 0
