"""Multi-chip distributed bundle adjustment over a jax.sharding.Mesh.

The scaling design mandated by BASELINE.json: keyframe/observation blocks
partitioned per device, Schur-complement reduction of camera blocks over
ICI collectives. Concretely:

- observations are sharded along a mesh axis ('obs'); poses and points are
  replicated;
- inside shard_map every device assembles the Hessian blocks of its
  observation shard; full blocks are reduced with psum (rides ICI);
- the reduced camera system (6K x 6K) is solved replicated on every device
  (identical inputs -> identical result, no broadcast needed);
- points back-substitute with one more psum.

This replaces the reference's single-threaded g2o GlobalBA thread
(src/LoopClosing.cc:801, src/Optimizer.cc:41-284) with a pod-scale solve.

The same entry runs on 1 device (trivial mesh) or on
xla_force_host_platform_device_count virtual CPU devices for testing.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

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
