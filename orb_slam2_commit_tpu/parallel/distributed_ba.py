"""Multi-chip distributed bundle adjustment over a jax.sharding.Mesh.

The scaling design mandated by BASELINE.json, replacing the reference's
single-threaded g2o GlobalBA thread (src/LoopClosing.cc:801,
src/Optimizer.cc:41-284) with a pod-scale solve. Two schemes:

1. distributed_bundle_adjust — observation-sharded, everything else
   replicated. Correctness-grade data parallelism: per-device memory does
   NOT shrink with devices. Kept for small problems and as an oracle.

2. partition_problem + distributed_bundle_adjust_points — the scale
   shape. Points are partitioned into contiguous per-device ranges and
   every observation is co-located with the device that owns its point:
   - Hpp / Hpp_inv / g_p / delta_p and all point-side segment-sums stay
     device-local shards: per-device point memory and point/observation
     compute are ∝ 1/n_devices;
   - cameras stay replicated: a SLAM map has O(100-5000) keyframes vs
     O(1e5-1e7) points, so the replicated camera state is [K, 6]-sized;
   - the only cross-device traffic is psum over [K, 6]/[K, 6, 6] camera
     aggregates: 1 psum per implicit-Schur CG matvec (24·K bytes f32) +
     4 per LM iteration for assembly/cost — independent of P and O, so
     the communication:compute ratio FALLS as the map grows. This rides
     ICI all-reduce, the cheapest collective on a TPU mesh.

The same entries run on 1 device (trivial mesh) or on
xla_force_host_platform_device_count virtual CPU devices for testing;
scripts/bench_dist_ba.py measures scaling on the virtual mesh.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from orb_slam2_commit_tpu.optim import ba
from orb_slam2_commit_tpu.optim.residuals import BAObservations

AXIS = "obs"


def _pad_axis(x: np.ndarray, n: int):
    pad = n - x.shape[0]
    if pad <= 0:
        return x
    return np.concatenate([x, np.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)


def shard_observations(obs: BAObservations, n_devices: int) -> BAObservations:
    """Pad the observation table to a multiple of n_devices (padded rows
    invalid)."""
    O = obs.valid.shape[0]
    O_pad = -(-O // n_devices) * n_devices
    return BAObservations(
        cam_idx=jnp.asarray(_pad_axis(np.asarray(obs.cam_idx), O_pad)),
        pt_idx=jnp.asarray(_pad_axis(np.asarray(obs.pt_idx), O_pad)),
        uvr=jnp.asarray(_pad_axis(np.asarray(obs.uvr), O_pad)),
        inv_sigma2=jnp.asarray(_pad_axis(np.asarray(obs.inv_sigma2), O_pad)),
        is_stereo=jnp.asarray(_pad_axis(np.asarray(obs.is_stereo), O_pad)),
        valid=jnp.asarray(_pad_axis(np.asarray(obs.valid), O_pad)),
    )


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (AXIS,))


def distributed_bundle_adjust(
    problem: ba.BAProblem,
    mesh: Mesh,
    fx: float, fy: float, cx: float, cy: float, bf: float,
    n_iters: int = 10,
    use_robust: bool = True,
    point_chunk: int = 1024,
) -> Tuple[ba.BAProblem, ba.BAResult]:
    """Observation-sharded BA. problem.obs must have O divisible by the mesh
    size (use shard_observations)."""
    n_dev = mesh.devices.size
    obs = problem.obs
    assert obs.valid.shape[0] % n_dev == 0, "pad observations first"
    problem = problem._replace(obs=obs)

    obs_spec = BAObservations(
        cam_idx=P(AXIS), pt_idx=P(AXIS), uvr=P(AXIS),
        inv_sigma2=P(AXIS), is_stereo=P(AXIS), valid=P(AXIS),
    )
    in_spec = ba.BAProblem(
        R=P(), t=P(), fixed=P(), points=P(), point_valid=P(), obs=obs_spec
    )
    out_spec = (
        ba.BAProblem(
            R=P(), t=P(), fixed=P(), points=P(), point_valid=P(), obs=obs_spec
        ),
        ba.BAResult(
            R=P(), t=P(), points=P(), chi2=P(AXIS), inlier=P(AXIS), cost=P()
        ),
    )

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=(in_spec,), out_specs=out_spec,
        check_vma=False,
    )
    def run(p):
        return ba.bundle_adjust(
            p, fx, fy, cx, cy, bf,
            n_iters=n_iters, use_robust=use_robust,
            point_chunk=point_chunk, axis_name=AXIS,
        )

    return jax.jit(run)(problem)


# ----------------------------------------------------------------------
# Point-sharded scheme (the scaling path)
# ----------------------------------------------------------------------


class PartitionPlan(NamedTuple):
    """Host-side bookkeeping for a point-partitioned problem layout."""

    perm: np.ndarray    # [n_dev * o_blk] original obs row per slot, -1 pad
    p_blk: int          # points per device (padded)
    o_blk: int          # observation slots per device (padded)
    n_points: int       # original P (points[:n_points] are real)
    n_obs: int          # original O
    n_devices: int

    def scatter_obs(self, sharded: np.ndarray, fill=0) -> np.ndarray:
        """Map a per-slot array (chi2/inlier from the sharded solve) back
        to original observation order."""
        out = np.full((self.n_obs,) + sharded.shape[1:], fill,
                      dtype=np.asarray(sharded).dtype)
        ok = self.perm >= 0
        out[self.perm[ok]] = np.asarray(sharded)[ok]
        return out


def partition_problem(
    problem: ba.BAProblem, n_devices: int, align: int = 8
) -> Tuple[ba.BAProblem, PartitionPlan]:
    """Lay out a BA problem for the point-sharded solve.

    Points are split into n_devices contiguous ranges; every observation
    moves to the block of the device owning its point, with pt_idx
    rewritten device-local. SLAM map points have near-uniform observation
    counts (2-20 observing keyframes), so contiguous equal ranges balance
    observation load to within a few percent — scripts/bench_dist_ba.py
    reports the realized imbalance.
    """
    pts = np.asarray(problem.points)
    pvalid = np.asarray(problem.point_valid)
    P_orig = pts.shape[0]
    p_blk = -(-P_orig // n_devices)
    P_pad = p_blk * n_devices
    pts = _pad_axis(pts, P_pad)
    pvalid = _pad_axis(pvalid, P_pad)

    cam_idx = np.asarray(problem.obs.cam_idx)
    pt_idx = np.asarray(problem.obs.pt_idx)
    valid = np.asarray(problem.obs.valid)
    O = pt_idx.shape[0]
    owner = np.clip(pt_idx // p_blk, 0, n_devices - 1)
    counts = np.bincount(owner, minlength=n_devices)
    o_blk = -(-int(counts.max()) // align) * align

    n_slots = n_devices * o_blk
    perm = np.full(n_slots, -1, np.int64)
    new = {
        "cam_idx": np.zeros(n_slots, cam_idx.dtype),
        "pt_idx": np.zeros(n_slots, pt_idx.dtype),
        "uvr": np.zeros((n_slots, 3), np.asarray(problem.obs.uvr).dtype),
        "inv_sigma2": np.zeros(
            n_slots, np.asarray(problem.obs.inv_sigma2).dtype
        ),
        "is_stereo": np.zeros(n_slots, bool),
        "valid": np.zeros(n_slots, bool),
    }
    uvr = np.asarray(problem.obs.uvr)
    inv_s2 = np.asarray(problem.obs.inv_sigma2)
    is_st = np.asarray(problem.obs.is_stereo)
    for d in range(n_devices):
        rows = np.where(owner == d)[0]
        s = d * o_blk
        e = s + rows.size
        perm[s:e] = rows
        new["cam_idx"][s:e] = cam_idx[rows]
        new["pt_idx"][s:e] = pt_idx[rows] - d * p_blk   # device-local
        new["uvr"][s:e] = uvr[rows]
        new["inv_sigma2"][s:e] = inv_s2[rows]
        new["is_stereo"][s:e] = is_st[rows]
        new["valid"][s:e] = valid[rows]

    obs = BAObservations(
        cam_idx=jnp.asarray(new["cam_idx"]),
        pt_idx=jnp.asarray(new["pt_idx"]),
        uvr=jnp.asarray(new["uvr"]),
        inv_sigma2=jnp.asarray(new["inv_sigma2"]),
        is_stereo=jnp.asarray(new["is_stereo"]),
        valid=jnp.asarray(new["valid"]),
    )
    part = problem._replace(
        points=jnp.asarray(pts), point_valid=jnp.asarray(pvalid), obs=obs
    )
    plan = PartitionPlan(
        perm=perm, p_blk=p_blk, o_blk=o_blk,
        n_points=P_orig, n_obs=O, n_devices=n_devices,
    )
    return part, plan


def distributed_bundle_adjust_points(
    problem: ba.BAProblem,
    mesh: Mesh,
    fx: float, fy: float, cx: float, cy: float, bf: float,
    n_iters: int = 10,
    use_robust: bool = True,
) -> Tuple[ba.BAProblem, ba.BAResult]:
    """Point-sharded BA: problem must come from partition_problem with
    n_devices == mesh size. Per-device point memory/compute ∝ 1/n_devices;
    cross-device traffic is [K, 6]-shaped camera psums only (see module
    docstring). Returns (problem, result) with points reassembled in
    global order and chi2/inlier in PARTITIONED slot order — use
    PartitionPlan.scatter_obs to recover original observation order."""
    n_dev = mesh.devices.size
    assert problem.points.shape[0] % n_dev == 0, "partition_problem first"
    assert problem.obs.valid.shape[0] % n_dev == 0, "partition_problem first"

    obs_spec = BAObservations(
        cam_idx=P(AXIS), pt_idx=P(AXIS), uvr=P(AXIS),
        inv_sigma2=P(AXIS), is_stereo=P(AXIS), valid=P(AXIS),
    )
    prob_spec = ba.BAProblem(
        R=P(), t=P(), fixed=P(), points=P(AXIS), point_valid=P(AXIS),
        obs=obs_spec,
    )
    out_spec = (
        prob_spec,
        ba.BAResult(
            R=P(), t=P(), points=P(AXIS), chi2=P(AXIS), inlier=P(AXIS),
            cost=P(),
        ),
    )

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=(prob_spec,), out_specs=out_spec,
        check_vma=False,
    )
    def run(p):
        return ba.bundle_adjust(
            p, fx, fy, cx, cy, bf,
            n_iters=n_iters, use_robust=use_robust,
            axis_name=AXIS, point_sharded=True,
        )

    return jax.jit(run)(problem)
