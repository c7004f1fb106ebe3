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
