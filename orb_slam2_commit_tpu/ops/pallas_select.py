"""Pallas TPU kernel: per-cell top-k candidate extraction.

The packed extraction route caps every 32x32 scoring cell at
cell_top_k best responses before the per-level budget top-k
(ops/packed_extractor.packed_select — the TPU stand-in for the
reference's quadtree DistributeOctTree, src/ORBextractor.cc:562-815).

The XLA formulation (ops/fast.topk_iterative) runs k rounds of
(max, argmax, mask) over the [n_cells, cell^2] matrix: ~3k separate
reduction kernels, each re-reading ~6 MB from HBM — pure launch
latency + bandwidth on a matrix that fits in VMEM. Here one kernel
reads each block of cells from HBM once and runs all k extraction
rounds in VMEM.

Semantics are identical to fast.topk_iterative (and therefore to
lax.top_k): exact values, ties resolve to the lowest index.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_BLOCK = 128  # cells per grid instance


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _cell_topk_kernel(x_ref, vals_ref, args_ref, *, k: int, s: int):
    """One block of cells: k rounds of (max, first-argmax, mask) in VMEM."""
    x = x_ref[:, :]
    b, sp = x.shape
    iota = lax.broadcasted_iota(jnp.int32, (b, sp), 1)
    vals, args = [], []
    for _ in range(k):
        m = jnp.max(x, axis=1, keepdims=True)                    # [B, 1]
        # Lowest index among the maxima — lax.top_k tie-breaking.
        a = jnp.min(
            jnp.where(x == m, iota, jnp.int32(sp)), axis=1, keepdims=True
        )
        vals.append(m)
        args.append(a)
        x = jnp.where(iota == a, -jnp.inf, x)
    pad = jnp.zeros((b, _LANE - k), jnp.float32)
    ipad = jnp.zeros((b, _LANE - k), jnp.int32)
    vals_ref[:, :] = jnp.concatenate(vals + [pad], axis=1)
    args_ref[:, :] = jnp.concatenate(args + [ipad], axis=1)


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def cell_topk(
    cells: jnp.ndarray,       # [C, S] float32, S = cell_size**2
    k: int,
    interpret: bool | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact per-row top-k: (vals [C, k] f32, args [C, k] i32).

    Same values and tie-breaking as fast.topk_iterative / lax.top_k.
    k must be <= 128 (it is 8 in practice).
    """
    if interpret is None:
        interpret = _interpret()
    assert k <= _LANE
    c, s = cells.shape
    sp = _round_up(s, _LANE)
    cp = _round_up(max(c, 1), _BLOCK)
    x = jnp.pad(
        cells.astype(jnp.float32),
        ((0, cp - c), (0, sp - s)),
        constant_values=-jnp.inf,
    )
    vals, args = pl.pallas_call(
        functools.partial(_cell_topk_kernel, k=k, s=sp),
        grid=(cp // _BLOCK,),
        in_specs=[
            pl.BlockSpec((_BLOCK, sp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_BLOCK, _LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BLOCK, _LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((cp, _LANE), jnp.float32),
            jax.ShapeDtypeStruct((cp, _LANE), jnp.int32),
        ],
        interpret=interpret,
    )(x)
    return vals[:c, :k], args[:c, :k]
