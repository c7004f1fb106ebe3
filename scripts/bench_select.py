"""Micro-ablation of packed_select on the live accelerator.

Times jitted PREFIXES of the packed selection stage (cell top-k ->
level regroup -> level top-k -> coord mapping), honest methodology
(distinct buffers, depth-2 dependence, value fetch).

Usage: python scripts/bench_select.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from orb_slam2_commit_tpu.ops import fast, packed_extractor as pe
    from orb_slam2_commit_tpu.utils.config import synthetic_config

    config = synthetic_config(width=640, height=480, n_features=1000).orb
    plan = pe.make_plan(config, 480, 640)
    budgets = config.features_per_level()
    cell_size, cell_top_k = config.cell_size, config.cell_top_k

    hc = sum(plan.aligned_heights)
    w = 640
    rng = np.random.default_rng(0)

    def mk_score(seed):
        r = np.random.default_rng(seed)
        s = r.uniform(0, 50, (hc, w)).astype(np.float32)
        s *= (r.uniform(size=s.shape) < 0.02)  # sparse like FAST scores
        return jnp.asarray(s)

    wp = pe._round_up(w, cell_size)
    n_cy, n_cx = hc // cell_size, wp // cell_size

    def p_cells(score, fb):
        sp = jnp.pad(score + 0.0 * fb, ((0, 0), (0, wp - w)))
        cells = sp.reshape(n_cy, cell_size, n_cx, cell_size)
        cells = cells.transpose(0, 2, 1, 3).reshape(
            n_cy * n_cx, cell_size * cell_size)
        return jnp.sum(cells)

    def p_celltopk(score, fb):
        sp = jnp.pad(score + 0.0 * fb, ((0, 0), (0, wp - w)))
        cells = sp.reshape(n_cy, cell_size, n_cx, cell_size)
        cells = cells.transpose(0, 2, 1, 3).reshape(
            n_cy * n_cx, cell_size * cell_size)
        cell_vals, cell_arg = fast.topk_iterative(cells, cell_top_k)
        return jnp.sum(cell_vals) + jnp.sum(cell_arg)

    def p_full(score, fb):
        yx, resp, valid = pe.packed_select(
            score + 0.0 * fb, plan, budgets, cell_size, cell_top_k)
        return jnp.sum(yx) + jnp.sum(resp) + jnp.sum(valid)

    def time_fn(fn):
        f = jax.jit(fn)
        scores = [mk_score(i) for i in range(8)]
        fb = jnp.zeros(())
        for s in scores:
            float(f(s, fb))
        outs = [jnp.zeros(()), jnp.zeros(())]
        n = 48
        t0 = time.perf_counter()
        for i in range(n):
            o = f(scores[i % 8], outs[i % 2] * 0)
            outs[i % 2] = o
        tot = float(outs[0]) + float(outs[1])
        dt = (time.perf_counter() - t0) / n
        return dt, tot

    prev = 0.0
    for name, fn in [("cells-reshape", p_cells), ("cell-topk", p_celltopk),
                     ("full-select", p_full)]:
        dt, _ = time_fn(fn)
        print(f"{name:16s} {dt*1e3:7.3f} ms  (+{(dt-prev)*1e3:6.3f} ms)")
        prev = dt


if __name__ == "__main__":
    main()
