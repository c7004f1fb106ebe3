"""Segment-sum strategy shootout for the BA matvec reductions on TPU.

Shapes from KITTI-global BA: O=576k observations scattering [O, 6] into
K=512 cameras and [O, 3] into P=96k points. Variants: unsorted
scatter-add, pre-sorted scatter-add, jax.ops.segment_sum (sorted flag),
and a gather-based dense-slot formulation for the camera side.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

O, K, P = 576 * 1024, 512, 96 * 1024
CHAIN = 8


def chained(op, data_builder):
    bufs = [data_builder(s) for s in (0, 1)]

    def fn(x, args):
        def body(carry, _):
            out = op(carry, *args)
            return x + 1e-9 * out.reshape(-1)[0], out.reshape(-1)[0]
        carry, outs = jax.lax.scan(body, x, None, length=CHAIN)
        return jnp.sum(outs)

    f = jax.jit(fn)
    x0 = jnp.zeros(())
    for _, args in bufs:
        jax.block_until_ready(f(x0, args))
    n = 8
    start = time.perf_counter()
    prev = 0.0
    for i in range(n):
        _, args = bufs[i % 2]
        prev = float(f(x0 + prev * 0.0, args)) * 0.0
    return (time.perf_counter() - start) / (n * CHAIN)


def main():
    rng = np.random.default_rng(0)

    def np_bounds(sidx_np, n_seg):
        starts = np.searchsorted(sidx_np, np.arange(n_seg))
        ends = np.searchsorted(sidx_np, np.arange(n_seg) + 1)
        return jnp.asarray(starts, jnp.int32), jnp.asarray(ends, jnp.int32)

    def cam_data(seed):
        r = np.random.default_rng(seed)
        vals = jnp.asarray(r.random((O, 6), np.float32))
        idx_np = r.integers(0, K, O, dtype=np.int32)
        sidx_np = np.sort(idx_np)
        starts, ends = np_bounds(sidx_np, K)
        return None, (vals, jnp.asarray(idx_np), jnp.asarray(sidx_np),
                      starts, ends)

    def pt_data(seed):
        r = np.random.default_rng(seed)
        vals = jnp.asarray(r.random((O, 3), np.float32))
        idx_np = np.sort(r.integers(0, P, O, dtype=np.int32))
        starts, ends = np_bounds(idx_np, P)
        return None, (vals, jnp.asarray(idx_np), jnp.asarray(idx_np),
                      starts, ends)

    def scatter_unsorted_k(x, vals, idx, sidx, starts, ends):
        return jnp.zeros((K, 6), jnp.float32).at[idx].add(vals + x)

    def scatter_sorted_k(x, vals, idx, sidx, starts, ends):
        return jnp.zeros((K, 6), jnp.float32).at[sidx].add(
            vals + x, indices_are_sorted=True, unique_indices=False
        )

    def segsum_sorted_k(x, vals, idx, sidx, starts, ends):
        return jax.ops.segment_sum(
            vals + x, sidx, num_segments=K, indices_are_sorted=True
        )

    def onehot_matmul_k(x, vals, idx, sidx, starts, ends):
        # [K, O] one-hot in bf16 via iota comparison, K*O*6 MXU flops.
        oh = (sidx[None, :] == jnp.arange(K)[:, None]).astype(jnp.bfloat16)
        return jnp.dot(oh, (vals + x).astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)

    def scatter_unsorted_p(x, vals, idx, sidx, starts, ends):
        return jnp.zeros((P, 3), jnp.float32).at[idx].add(vals + x)

    def segsum_sorted_p(x, vals, idx, sidx, starts, ends):
        return jax.ops.segment_sum(
            vals + x, sidx, num_segments=P, indices_are_sorted=True
        )

    # Precomputed segment boundaries (fixed per BA problem — computed once
    # outside the CG loop in the real solver).
    def bounds(sidx_np, n_seg):
        s = np.asarray(sidx_np)
        starts = np.searchsorted(s, np.arange(n_seg))
        ends = np.searchsorted(s, np.arange(n_seg) + 1)
        return jnp.asarray(starts, jnp.int32), jnp.asarray(ends, jnp.int32)

    def cumsum_k(x, vals, idx, sidx, starts, ends):
        cs = jnp.cumsum(vals + x, axis=0)
        z = jnp.zeros((1, vals.shape[1]), vals.dtype)
        cs0 = jnp.concatenate([z, cs], axis=0)
        return cs0[ends] - cs0[starts]

    def cumsum_p(x, vals, idx, sidx, starts, ends):
        cs = jnp.cumsum(vals + x, axis=0)
        z = jnp.zeros((1, vals.shape[1]), vals.dtype)
        cs0 = jnp.concatenate([z, cs], axis=0)
        return cs0[ends] - cs0[starts]

    for name, op, builder in [
        ("K: scatter unsorted", scatter_unsorted_k, cam_data),
        ("K: scatter sorted  ", scatter_sorted_k, cam_data),
        ("K: segment_sum sort", segsum_sorted_k, cam_data),
        ("K: cumsum+diff sort", cumsum_k, cam_data),
        ("P: scatter (sorted idx)", scatter_unsorted_p, pt_data),
        ("P: segment_sum sort", segsum_sorted_p, pt_data),
        ("P: cumsum+diff sort", cumsum_p, pt_data),
    ]:
        t = chained(op, builder)
        print(f"{name:26s} {t * 1e3:8.3f} ms")


if __name__ == "__main__":
    main()
