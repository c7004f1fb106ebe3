"""Distributed (observation-sharded) BA on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam2_commit_tpu.optim import ba
from orb_slam2_commit_tpu.parallel import distributed_ba as dba
from tests.test_optim import FX, FY, CX, CY, BF, make_ba_problem, rot_angle


class TestDistributedBA:
    def test_matches_single_device_result(self):
        problem, R_true, t_true, X, _ = make_ba_problem(seed=7, n_cams=6, n_pts=128)
        # Single-device reference.
        out1, res1 = ba.bundle_adjust_jit(
            problem, FX, FY, CX, CY, BF, n_iters=8, point_chunk=64
        )
        # 8-way sharded.
        mesh = dba.make_mesh(8)
        obs = dba.shard_observations(problem.obs, 8)
        problem8 = problem._replace(obs=obs)
        out8, res8 = dba.distributed_bundle_adjust(
            problem8, mesh, FX, FY, CX, CY, BF, n_iters=8, point_chunk=64
        )
        np.testing.assert_allclose(
            np.asarray(out8.R), np.asarray(out1.R), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(out8.t), np.asarray(out1.t), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(out8.points), np.asarray(out1.points), atol=1e-6
        )

    def test_converges_to_ground_truth(self):
        problem, R_true, t_true, X, _ = make_ba_problem(seed=8, n_cams=6, n_pts=160)
        mesh = dba.make_mesh(8)
        problem = problem._replace(obs=dba.shard_observations(problem.obs, 8))
        out, res = dba.distributed_bundle_adjust(
            problem, mesh, FX, FY, CX, CY, BF, n_iters=12, point_chunk=64
        )
        for k in range(2, 6):
            assert rot_angle(np.asarray(out.R[k]), R_true[k]) < 0.02
            np.testing.assert_allclose(np.asarray(out.t[k]), t_true[k], atol=2e-3)

    def test_uneven_observation_padding(self):
        problem, *_ = make_ba_problem(seed=9, n_cams=4, n_pts=50)
        o = int(problem.obs.valid.shape[0])
        obs = dba.shard_observations(problem.obs, 8)
        assert obs.valid.shape[0] % 8 == 0
        assert int(obs.valid.sum()) == int(problem.obs.valid.sum())


class TestPointShardedBA:
    """Point-partitioned distributed BA (the scaling scheme): per-device
    point state ∝ 1/n_devices, camera-vector psums only."""

    def test_matches_single_device_pcg(self):
        problem, R_true, t_true, X, _ = make_ba_problem(
            seed=11, n_cams=6, n_pts=128
        )
        out1, res1 = ba.bundle_adjust_jit(
            problem, FX, FY, CX, CY, BF, n_iters=8, solver="pcg"
        )
        part, plan = dba.partition_problem(problem, 8)
        mesh = dba.make_mesh(8)
        out8, res8 = dba.distributed_bundle_adjust_points(
            part, mesh, FX, FY, CX, CY, BF, n_iters=8
        )
        np.testing.assert_allclose(
            np.asarray(out8.R), np.asarray(out1.R), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(out8.t), np.asarray(out1.t), atol=1e-6
        )
        # Points come back in global order (padded tail is don't-care).
        np.testing.assert_allclose(
            np.asarray(out8.points)[: plan.n_points],
            np.asarray(out1.points),
            atol=1e-5,
        )
        # Inlier classification maps back to original observation order.
        inl = plan.scatter_obs(np.asarray(res8.inlier), fill=False)
        np.testing.assert_array_equal(inl, np.asarray(res1.inlier))

    def test_point_state_is_sharded(self):
        """The defining property: each device holds 1/n of the points."""
        problem, *_ = make_ba_problem(seed=12, n_cams=6, n_pts=200)
        part, plan = dba.partition_problem(problem, 8)
        mesh = dba.make_mesh(8)
        out8, res8 = dba.distributed_bundle_adjust_points(
            part, mesh, FX, FY, CX, CY, BF, n_iters=4
        )
        shards = out8.points.addressable_shards
        assert len(shards) == 8
        for s in shards:
            assert s.data.shape[0] == plan.p_blk
        assert plan.p_blk == -(-200 // 8)

    def test_partition_preserves_observations(self):
        problem, *_ = make_ba_problem(seed=13, n_cams=5, n_pts=73)
        part, plan = dba.partition_problem(problem, 8)
        assert int(part.obs.valid.sum()) == int(problem.obs.valid.sum())
        # Every original row appears exactly once in the permutation.
        perm = plan.perm[plan.perm >= 0]
        assert np.array_equal(np.sort(perm), np.arange(plan.n_obs))
        # Local pt_idx stays within the owning device's block.
        assert int(part.obs.pt_idx.max()) < plan.p_blk
        # Round-trip of a per-observation payload.
        payload = np.arange(plan.n_obs, dtype=np.int32)
        slots = np.zeros(plan.perm.shape[0], np.int32)
        ok = plan.perm >= 0
        slots[ok] = payload[plan.perm[ok]]
        np.testing.assert_array_equal(plan.scatter_obs(slots), payload)

    def test_converges_to_ground_truth(self):
        problem, R_true, t_true, X, _ = make_ba_problem(
            seed=14, n_cams=6, n_pts=160
        )
        part, plan = dba.partition_problem(problem, 8)
        mesh = dba.make_mesh(8)
        out, res = dba.distributed_bundle_adjust_points(
            part, mesh, FX, FY, CX, CY, BF, n_iters=12
        )
        for k in range(2, 6):
            assert rot_angle(np.asarray(out.R[k]), R_true[k]) < 0.02
            np.testing.assert_allclose(
                np.asarray(out.t[k]), t_true[k], atol=2e-3
            )
