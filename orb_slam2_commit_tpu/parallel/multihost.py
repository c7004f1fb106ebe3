"""Multi-host (multi-process) entry for point-sharded distributed BA.

The reference's "communication backend" is pthread shared memory inside
one process — four threads around one map, a transient GlobalBA thread
(reference: src/System.cc:95-107, src/LoopClosing.cc:801). Its
TPU-native replacement at pod scale is a jax.distributed process group:
one Python process per host, a global `jax.sharding.Mesh` spanning every
host's chips, and XLA collectives riding ICI (and DCN between slices) —
no NCCL/MPI translation layer.

Scaling contract:

- Per-DEVICE state is the scaling axis: `partition_problem`
  (distributed_ba.py) lays points and their observations out in
  contiguous per-device blocks, so Hpp/Hpp_inv/delta_p and all
  point-side segment-sums are 1/n_devices per chip regardless of host
  count. Each process feeds ONLY its addressable devices' blocks to
  `jax.make_array_from_process_local_data` — no host ever uploads
  another host's shard, and cross-host traffic inside the solve is the
  [K,6]-shaped camera psum only (K = keyframes, ≤ a few thousand in a
  SLAM map — kilobytes per LM iteration).
- Host RAM holds the map once per host (the partition plan is a cheap
  deterministic NumPy pass over the observation table), mirroring the
  reference's one-process-owns-the-map model; what a single host could
  not hold is the per-device working set, and that is sharded.

Single-process degenerate case: with one process this module is exactly
`distributed_bundle_adjust_points` (tests run it on the 8-virtual-device
CPU mesh); with N processes the same code runs unchanged — every jax
API used here is multi-process-safe by construction.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from orb_slam2_commit_tpu.optim import ba
from orb_slam2_commit_tpu.optim.residuals import BAObservations
from orb_slam2_commit_tpu.parallel import distributed_ba as dba

AXIS = dba.AXIS


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join the jax.distributed process group (idempotent).

    On a real pod each host calls this once before any other jax API,
    either with explicit arguments or letting jax.distributed's built-in
    cluster auto-detection read the environment (TPU metadata /
    JAX_COORDINATOR_ADDRESS). With no coordinator and no detectable
    cluster environment this degrades to a single-host no-op so the same
    driver script runs unmodified on one host.

    Must not touch any backend-initializing jax API (jax.devices /
    jax.process_count) before jax.distributed.initialize — doing so
    initializes the XLA backend, after which initialize() raises.
    The idempotence guard therefore inspects the distributed client
    state directly.
    """
    from jax._src import distributed as _dist

    if getattr(_dist.global_state, "client", None) is not None:
        return  # already joined a process group
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError) as e:
        # Single host, no cluster environment: auto-detection finds
        # nothing (or the backend is already up from a single-host
        # driver). Only swallow when the caller did not demand a
        # specific coordinator.
        if coordinator_address is not None or num_processes is not None:
            raise
        del e


def global_mesh(n_devices: Optional[int] = None) -> Mesh:
    """Mesh over every device of every process (the single scaling axis).

    A SLAM BA problem has one natural data axis (points/observations);
    camera state is replicated, so a 1-D mesh is the right topology —
    XLA lowers the [K,6] psum to an ICI all-reduce ring across the
    whole slice.
    """
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (AXIS,))


def _local_rows(mesh: Mesh, blk: int) -> Tuple[np.ndarray, int]:
    """Row ranges (device order) of this process's addressable devices
    for an axis laid out in contiguous per-device blocks of `blk`."""
    mesh_devs = list(mesh.devices.ravel())
    local = [i for i, d in enumerate(mesh_devs)
             if d.process_index == jax.process_index()]
    return np.asarray(local, np.int64), blk


def _make_sharded(mesh: Mesh, full: np.ndarray, blk: int):
    """Build a global array sharded in per-device blocks along axis 0,
    feeding only this process's blocks.

    `full` may be the full table (single-controller / shared-storage
    hosts) — only the local blocks are read and uploaded.
    """
    sharding = NamedSharding(mesh, P(AXIS))
    local_idx, blk = _local_rows(mesh, blk)
    parts = [np.asarray(full[i * blk:(i + 1) * blk]) for i in local_idx]
    local = np.concatenate(parts, axis=0) if parts else np.asarray(full[:0])
    return jax.make_array_from_process_local_data(sharding, local)


def _make_replicated(mesh: Mesh, full: np.ndarray):
    sharding = NamedSharding(mesh, P())
    return jax.make_array_from_process_local_data(
        sharding, np.asarray(full)
    )


def distribute_problem(
    part: ba.BAProblem, plan: dba.PartitionPlan, mesh: Mesh
) -> ba.BAProblem:
    """Turn a partitioned problem (from dba.partition_problem) into global
    jax.Arrays laid out for the mesh: point/observation leaves sharded in
    per-device blocks, camera leaves replicated. Each process uploads
    only its own devices' blocks."""
    n_dev = mesh.devices.size
    assert np.asarray(part.points).shape[0] == plan.p_blk * n_dev
    assert np.asarray(part.obs.valid).shape[0] == plan.o_blk * n_dev
    obs = part.obs
    return ba.BAProblem(
        R=_make_replicated(mesh, part.R),
        t=_make_replicated(mesh, part.t),
        fixed=_make_replicated(mesh, part.fixed),
        points=_make_sharded(mesh, part.points, plan.p_blk),
        point_valid=_make_sharded(mesh, part.point_valid, plan.p_blk),
        obs=BAObservations(
            cam_idx=_make_sharded(mesh, obs.cam_idx, plan.o_blk),
            pt_idx=_make_sharded(mesh, obs.pt_idx, plan.o_blk),
            uvr=_make_sharded(mesh, obs.uvr, plan.o_blk),
            inv_sigma2=_make_sharded(mesh, obs.inv_sigma2, plan.o_blk),
            is_stereo=_make_sharded(mesh, obs.is_stereo, plan.o_blk),
            valid=_make_sharded(mesh, obs.valid, plan.o_blk),
        ),
    )


def bundle_adjust_multihost(
    problem: ba.BAProblem,
    plan: dba.PartitionPlan,
    mesh: Mesh,
    fx: float, fy: float, cx: float, cy: float, bf: float,
    n_iters: int = 10,
    use_robust: bool = True,
) -> Tuple[ba.BAProblem, ba.BAResult]:
    """Run the point-sharded solve over a process-spanning mesh.

    `problem` must come from distribute_problem (global sharded arrays);
    the solve itself is the identical shard_map graph of
    distributed_bundle_adjust_points — pre-sharded inputs mean jit
    inserts no resharding, so this adds zero overhead over the
    single-host path."""
    return dba.distributed_bundle_adjust_points(
        problem, mesh, fx, fy, cx, cy, bf,
        n_iters=n_iters, use_robust=use_robust,
    )


def local_point_shards(out: ba.BAProblem) -> np.ndarray:
    """This process's refined point blocks (device order), without
    gathering the global table — each host writes back only the map
    region it owns."""
    shards = sorted(
        out.points.addressable_shards, key=lambda s: s.index[0].start or 0
    )
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)
