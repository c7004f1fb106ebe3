"""Multi-host distributed-BA entry on the virtual 8-device CPU mesh.

With one process the multihost module must be bit-identical to the
single-host point-sharded path while exercising the full multi-process
API surface (process-local feeding via make_array_from_process_local_data,
pre-sharded global arrays, shard-local result extraction). The same code
paths are what a real N-host pod runs.
"""

import jax
import numpy as np

from orb_slam2_commit_tpu.optim import ba
from orb_slam2_commit_tpu.parallel import distributed_ba as dba
from orb_slam2_commit_tpu.parallel import multihost as mh
from tests.test_optim import FX, FY, CX, CY, BF, make_ba_problem, rot_angle


class TestMultihostBA:
    def test_initialize_is_noop_without_cluster(self, monkeypatch):
        monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
        monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
        mh.initialize()          # must not raise, must not re-init
        assert jax.process_count() == 1

    def test_distribute_problem_layout(self):
        problem, *_ = make_ba_problem(seed=21, n_cams=6, n_pts=200)
        part, plan = dba.partition_problem(problem, 8)
        mesh = mh.global_mesh(8)
        g = mh.distribute_problem(part, plan, mesh)
        # Point leaves sharded in per-device blocks.
        assert len(g.points.addressable_shards) == 8
        for s in g.points.addressable_shards:
            assert s.data.shape[0] == plan.p_blk
        # Camera leaves replicated on every device.
        assert len(g.R.addressable_shards) == 8
        for s in g.R.addressable_shards:
            assert s.data.shape == np.asarray(part.R).shape
        # Global content round-trips exactly.
        np.testing.assert_array_equal(
            np.asarray(g.points), np.asarray(part.points)
        )
        np.testing.assert_array_equal(
            np.asarray(g.obs.pt_idx), np.asarray(part.obs.pt_idx)
        )

    def test_matches_single_host_path(self):
        problem, R_true, t_true, X, _ = make_ba_problem(
            seed=22, n_cams=6, n_pts=128
        )
        part, plan = dba.partition_problem(problem, 8)
        mesh = mh.global_mesh(8)

        out1, res1 = dba.distributed_bundle_adjust_points(
            part, mesh, FX, FY, CX, CY, BF, n_iters=8
        )
        g = mh.distribute_problem(part, plan, mesh)
        out2, res2 = mh.bundle_adjust_multihost(
            g, plan, mesh, FX, FY, CX, CY, BF, n_iters=8
        )
        np.testing.assert_allclose(
            np.asarray(out2.R), np.asarray(out1.R), atol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(out2.t), np.asarray(out1.t), atol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(out2.points), np.asarray(out1.points), atol=1e-12
        )
        # And converges to ground truth through the multihost entry.
        for k in range(2, 6):
            assert rot_angle(np.asarray(out2.R[k]), R_true[k]) < 0.02

    def test_local_point_shards_cover_map(self):
        problem, *_ = make_ba_problem(seed=23, n_cams=5, n_pts=96)
        part, plan = dba.partition_problem(problem, 8)
        mesh = mh.global_mesh(8)
        g = mh.distribute_problem(part, plan, mesh)
        out, _ = mh.bundle_adjust_multihost(
            g, plan, mesh, FX, FY, CX, CY, BF, n_iters=4
        )
        # Single process: local shards are the whole (padded) point table,
        # in device order == global order for a 1-D contiguous layout.
        local = mh.local_point_shards(out)
        np.testing.assert_array_equal(local, np.asarray(out.points))
