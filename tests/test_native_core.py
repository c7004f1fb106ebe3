"""Native C++ map-core vs NumPy oracle tests."""

import numpy as np
import pytest

from orb_slam2_commit_tpu.models import native_core


@pytest.fixture(scope="module")
def lib():
    lib = native_core.get_lib()
    if lib is None:
        pytest.skip("native map-core unavailable (no compiler?)")
    return lib


def random_obs(rng, K=12, N=40, P=200, density=0.6):
    kf_point_idx = np.full((K, N), -1, np.int32)
    for k in range(K):
        n_obs = int(density * N)
        kf_point_idx[k, :n_obs] = rng.choice(P, n_obs, replace=False)
    kf_valid = np.ones(K, bool)
    kf_valid[3] = False
    return kf_point_idx, kf_valid


class TestNativeCore:
    def test_covis_row_matches_numpy(self, lib):
        rng = np.random.default_rng(0)
        kpi, kv, P = *random_obs(rng), 200
        for k in [0, 5, 11]:
            got = native_core.covis_row(kpi, kv, P, k)
            for j in range(kpi.shape[0]):
                if j == k or not kv[j]:
                    want = 0
                else:
                    a = kpi[k][kpi[k] >= 0]
                    b = kpi[j][kpi[j] >= 0]
                    want = np.intersect1d(a, b).size
                assert got[j] == want, (k, j)

    def test_obs_counts_matches_numpy(self, lib):
        rng = np.random.default_rng(1)
        kpi, kv, P = *random_obs(rng), 200
        got = native_core.obs_counts(kpi, kv, P)
        want = np.zeros(P, np.int64)
        obs = kpi[kv]
        obs = obs[obs >= 0]
        np.add.at(want, obs, 1)
        np.testing.assert_array_equal(got, want)

    def test_covis_matrix_matches_rows(self, lib):
        rng = np.random.default_rng(2)
        kpi, kv, P = *random_obs(rng), 200
        M = native_core.covis_matrix(kpi, kv, P)
        for k in range(kpi.shape[0]):
            row = native_core.covis_row(kpi, kv, P, k)
            np.testing.assert_array_equal(M[k], row)
        np.testing.assert_array_equal(M, M.T)
        assert (np.diag(M) == 0).all()
