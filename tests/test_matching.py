"""Matching primitive tests against NumPy popcount oracles."""

import jax.numpy as jnp
import numpy as np

from orb_slam2_commit_tpu.ops import matching


def np_hamming(a, b):
    """Oracle popcount over packed uint32 words."""
    x = np.bitwise_xor(a[:, None, :], b[None, :, :])
    return np.vectorize(lambda v: bin(v).count("1"))(x).sum(-1)


def rand_desc(rng, n):
    return rng.integers(0, 2**32, size=(n, 8), dtype=np.uint32)


class TestHamming:
    def test_matrix_matches_oracle(self):
        rng = np.random.default_rng(0)
        a, b = rand_desc(rng, 13), rand_desc(rng, 17)
        got = np.asarray(matching.hamming_distance_matrix(jnp.asarray(a), jnp.asarray(b)))
        np.testing.assert_array_equal(got, np_hamming(a, b))

    def test_identical_is_zero(self):
        rng = np.random.default_rng(1)
        a = rand_desc(rng, 5)
        d = np.asarray(matching.hamming_distance_matrix(jnp.asarray(a), jnp.asarray(a)))
        np.testing.assert_array_equal(np.diag(d), 0)

    def test_mxu_route_matches_popcount(self):
        rng = np.random.default_rng(2)
        a, b = rand_desc(rng, 9), rand_desc(rng, 11)
        bits_a = matching.signed_bits(jnp.asarray(a))
        bits_b = matching.signed_bits(jnp.asarray(b))
        got = np.asarray(matching.hamming_distance_matrix_mxu(bits_a, bits_b))
        np.testing.assert_array_equal(got, np_hamming(a, b))


class TestBestMatch:
    def test_best_and_ratio(self):
        dist = jnp.asarray(
            [
                [10, 50, 90],   # clear winner col 0
                [40, 44, 90],   # ratio test kills (44/40 > 0.9... 40 < 0.9*44=39.6? no)
                [200, 210, 220],  # too far
            ],
            dtype=jnp.int32,
        )
        mask = jnp.ones((3, 3), dtype=bool)
        res = matching.best_match_with_ratio(dist, mask, max_dist=100, ratio=0.9)
        idx = np.asarray(res.idx)
        assert idx[0] == 0
        assert idx[1] == -1  # 40 >= 0.9 * 44
        assert idx[2] == -1  # above max_dist

    def test_mask_excludes(self):
        dist = jnp.asarray([[1, 5]], dtype=jnp.int32)
        mask = jnp.asarray([[False, True]])
        res = matching.best_match_with_ratio(dist, mask, max_dist=100)
        assert int(res.idx[0]) == 1

    def test_all_masked_gives_invalid(self):
        dist = jnp.asarray([[1, 5]], dtype=jnp.int32)
        mask = jnp.zeros((1, 2), dtype=bool)
        res = matching.best_match_with_ratio(dist, mask, max_dist=100)
        assert int(res.idx[0]) == -1


class TestMutualConsistency:
    def test_cross_check(self):
        ab = matching.MatchResult(
            idx=jnp.asarray([1, 0, 2], dtype=jnp.int32),
            dist=jnp.asarray([5, 6, 7], dtype=jnp.int32),
        )
        ba = matching.MatchResult(
            idx=jnp.asarray([1, 0, 0], dtype=jnp.int32),  # col2 points back to row0 (wrong)
            dist=jnp.asarray([6, 5, 9], dtype=jnp.int32),
        )
        res = matching.mutual_consistency(ab, ba)
        idx = np.asarray(res.idx)
        assert idx[0] == 1 and idx[1] == 0 and idx[2] == -1


class TestDuplicateResolution:
    def test_best_row_wins(self):
        m = matching.MatchResult(
            idx=jnp.asarray([2, 2, 1], dtype=jnp.int32),
            dist=jnp.asarray([30, 20, 10], dtype=jnp.int32),
        )
        res = matching.resolve_duplicate_targets(m, n_targets=3)
        idx = np.asarray(res.idx)
        assert idx[0] == -1  # lost col 2 to row 1
        assert idx[1] == 2
        assert idx[2] == 1

    def test_tie_goes_to_lowest_row(self):
        m = matching.MatchResult(
            idx=jnp.asarray([0, 0], dtype=jnp.int32),
            dist=jnp.asarray([15, 15], dtype=jnp.int32),
        )
        res = matching.resolve_duplicate_targets(m, n_targets=1)
        idx = np.asarray(res.idx)
        assert idx[0] == 0 and idx[1] == -1


class TestRotationConsistency:
    def test_dominant_bin_kept_outliers_dropped(self):
        n = 100
        rng = np.random.default_rng(3)
        angle_a = rng.uniform(0, 2 * np.pi, n).astype(np.float32)
        # 90 matches rotated by 0.3 rad, 10 by random junk.
        angle_b = angle_a.copy()
        angle_b[:90] -= 0.3
        angle_b[90:] = rng.uniform(0, 2 * np.pi, 10)
        m = matching.MatchResult(
            idx=jnp.arange(n, dtype=jnp.int32),
            dist=jnp.full((n,), 10, dtype=jnp.int32),
        )
        res = matching.rotation_consistency_filter(
            m, jnp.asarray(angle_a), jnp.asarray(angle_b)
        )
        idx = np.asarray(res.idx)
        assert (idx[:90] >= 0).all()
        # Most junk matches land in other bins and are dropped.
        assert (idx[90:] == -1).sum() >= 7


class TestMasks:
    def test_window_mask(self):
        a = jnp.asarray([[10.0, 10.0]])
        b = jnp.asarray([[12.0, 11.0], [20.0, 10.0]])
        m = np.asarray(matching.window_mask(a, b, 3.0))
        assert m[0, 0] and not m[0, 1]

    def test_window_mask_per_row_radius(self):
        a = jnp.asarray([[0.0, 0.0], [0.0, 0.0]])
        b = jnp.asarray([[5.0, 0.0]])
        r = jnp.asarray([2.0, 10.0])
        m = np.asarray(matching.window_mask(a, b, r))
        assert not m[0, 0] and m[1, 0]

    def test_epipolar_mask(self):
        # Identity-ish F for a simple stereo geometry: x2 on the same row.
        # F for pure horizontal translation: [[0,0,0],[0,0,-1],[0,1,0]].
        F = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 0.0, -1.0], [0.0, 1.0, 0.0]])
        a = jnp.asarray([[50.0, 30.0]])
        b = jnp.asarray([[70.0, 30.5], [70.0, 40.0]])
        sigma2 = jnp.ones(2)
        m = np.asarray(matching.epipolar_mask(a, b, F, sigma2))
        assert m[0, 0] and not m[0, 1]


class TestForwardBackwardOctaveRule:
    """Stereo/RGB-D last-frame matching restricts candidate octaves by
    camera advance (reference src/ORBmatcher.cc:1522-1529,1555-1570)."""

    def _match(self, feat_octave, tz_rel, mono):
        from orb_slam2_commit_tpu.slam import matchers

        rng = np.random.default_rng(3)
        desc = rand_desc(rng, 1)
        fx = fy = 100.0
        cx, cy = 80.0, 60.0
        pt_pos = np.array([[0.0, 0.0, 5.0]])
        m = matchers.match_projection_last_frame(
            jnp.asarray(pt_pos), jnp.asarray(desc),
            jnp.asarray([2], jnp.int32), jnp.zeros(1, jnp.float32),
            jnp.ones(1, bool),
            jnp.eye(3), jnp.zeros(3),
            jnp.asarray([[cx, cy]]), jnp.asarray(desc),
            jnp.zeros(1, jnp.float32),
            jnp.asarray([feat_octave], jnp.int32), jnp.ones(1, bool),
            fx, fy, cx, cy, 160.0, 120.0, th=15.0,
            tz_rel=jnp.asarray(tz_rel), mono=mono, baseline=0.1,
        )
        return int(m.idx[0]) >= 0

    def test_mono_band(self):
        assert self._match(1, 0.0, mono=True)
        assert self._match(3, 0.0, mono=True)
        assert not self._match(4, 0.0, mono=True)

    def test_forward_search_coarser(self):
        assert self._match(2, 1.0, mono=False)
        assert self._match(5, 1.0, mono=False)     # any coarser level
        assert not self._match(1, 1.0, mono=False)  # finer excluded

    def test_backward_search_finer(self):
        assert self._match(2, -1.0, mono=False)
        assert self._match(0, -1.0, mono=False)
        assert not self._match(3, -1.0, mono=False)

    def test_small_motion_keeps_band(self):
        assert self._match(1, 0.05, mono=False)
        assert self._match(3, 0.05, mono=False)
        assert not self._match(4, 0.05, mono=False)


class TestBruteForceVsNodeBucketed:
    """Measured comparison of the dense brute-force matcher against a
    reference-style BoW-node-bucketed SearchByBoW oracle (VERDICT r3
    weak 7): the dense candidate set is a strict superset, but the
    ratio-test denominator changes with the candidate pool, so
    superset-ness alone does not imply equal match QUALITY. This test
    measures both schemes against rendered ground truth.

    Oracle: SearchByBoW restricts candidates to features sharing a
    FeatureVector tree node (src/ORBmatcher.cc:175-325, node iteration
    :200-298) with TH_LOW=50, ratio 0.7, rotation histogram, one-to-one.
    """

    def _frames_with_gt(self):
        import jax.numpy as jnp

        from orb_slam2_commit_tpu.slam.frame import make_frame
        from orb_slam2_commit_tpu.utils import synthetic
        from orb_slam2_commit_tpu.utils.config import synthetic_config

        cfg = synthetic_config(width=512, height=384, n_features=1000)
        images, poses, scene = synthetic.render_sequence(
            cfg.camera, n_frames=6, n_points=500, seed=21, step=0.05,
            motion="sweep",
        )
        fa = make_frame(images[0], 0, 0.0, cfg)
        fb = make_frame(images[4], 4, 0.1, cfg)

        def landmark_ids(frame, pose):
            R, t = pose
            cam = cfg.camera
            pc = scene.points @ R.T + t
            z = np.maximum(pc[:, 2], 1e-6)
            uv = np.stack([
                cam.fx * pc[:, 0] / z + cam.cx,
                cam.fy * pc[:, 1] / z + cam.cy,
            ], -1)
            ids = np.full(frame.n, -1, np.int64)
            for i in np.where(frame.valid)[0]:
                d = np.linalg.norm(uv - frame.xy[i], axis=1)
                j = int(np.argmin(d))
                if d[j] < 2.0 and pc[j, 2] > 0:
                    ids[i] = j
            return ids
        gt_a = landmark_ids(fa, poses[0])
        gt_b = landmark_ids(fb, poses[4])
        return fa, fb, gt_a, gt_b

    def test_dense_matches_not_worse_than_node_bucketed(self):
        import jax.numpy as jnp

        from orb_slam2_commit_tpu.models.vocabulary import (
            default_vocabulary,
        )
        from orb_slam2_commit_tpu.ops import matching
        from orb_slam2_commit_tpu.slam import matchers

        voc = default_vocabulary()
        assert voc is not None
        fa, fb, gt_a, gt_b = self._frames_with_gt()

        # Node ids at the FeatureVector level (levels_up=2 on the
        # bundled L=6 tree; the reference uses levelsup=4 on its L=6
        # ORBvoc, Frame::ComputeBoW src/Frame.cc:462-469).
        _, nodes_a = voc.transform(fa.desc, fa.valid)
        _, nodes_b = voc.transform(fb.desc, fb.valid)

        dist = matching.hamming_distance_matrix(
            jnp.asarray(fa.desc), jnp.asarray(fb.desc)
        )
        base_mask = (
            jnp.asarray(fa.valid)[:, None] & jnp.asarray(fb.valid)[None, :]
        )
        node_mask = base_mask & (
            jnp.asarray(nodes_a)[:, None] == jnp.asarray(nodes_b)[None, :]
        ) & (jnp.asarray(nodes_a) >= 0)[:, None]

        def run(mask):
            m = matching.best_match_with_ratio(dist, mask, 50, 0.7)
            m = matching.rotation_consistency_filter(
                m, jnp.asarray(fa.angle), jnp.asarray(fb.angle)
            )
            return matching.resolve_duplicate_targets(m, fb.desc.shape[0])

        def score(m):
            idx = np.asarray(m.idx)
            rows = np.where(idx >= 0)[0]
            ok = (
                (gt_a[rows] >= 0)
                & (gt_a[rows] == gt_b[idx[rows]])
            )
            n_total = rows.size
            n_correct = int(ok.sum())
            return n_total, n_correct

        n_bow, c_bow = score(run(node_mask))
        n_dense, c_dense = score(run(base_mask))
        assert c_bow > 30, (n_bow, c_bow)  # oracle sanity

        # The dense scheme must recover at least as many CORRECT
        # ground-truth matches (it sees every node-restricted candidate
        # pair plus more), ...
        assert c_dense >= c_bow, (c_dense, c_bow)
        # ... and the enlarged ratio-test denominator must not degrade
        # precision beyond a few percent.
        prec_bow = c_bow / max(n_bow, 1)
        prec_dense = c_dense / max(n_dense, 1)
        assert prec_dense >= prec_bow - 0.05, (prec_dense, prec_bow)
