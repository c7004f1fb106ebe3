"""Prefix ablation INSIDE the packed extraction route on the live
accelerator: canvas -> preprocess+NMS -> cell top-k -> full select.

Same honest methodology as ablate_frontend (distinct buffers, depth-2
dependence, value fetch); prefixes share everything upstream so deltas
isolate the stage.

Usage: python scripts/bench_select2.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as g
    from orb_slam2_commit_tpu.ops import fast, packed_extractor as pe
    from orb_slam2_commit_tpu.ops import pallas_level

    config, args = g._make_example(
        width=640, height=480, n_features=1000, n_points=1024
    )
    image = args[0]
    orb = config.orb
    plan = pe.make_plan(orb, 480, 640)
    budgets = orb.features_per_level()
    cell_size, cell_top_k = orb.cell_size, orb.cell_top_k
    w = 640
    wp = pe._round_up(w, cell_size)

    def upstream(im):
        canvas = pe.build_canvas(im, plan)
        blur_c, hi_c, lo_c = pallas_level.level_preprocess(
            canvas, float(orb.ini_th_fast), float(orb.min_th_fast)
        )
        border_mask = jnp.asarray(pe._border_mask_np(plan))
        score = fast.combine_two_threshold(
            jnp.where(border_mask, hi_c, 0.0),
            jnp.where(border_mask, lo_c, 0.0),
            cell_size,
        )
        return score

    def p_score(im, fb):
        score = upstream(im + 0.0 * fb)
        return jnp.sum(score)

    def p_celltopk(im, fb):
        score = upstream(im + 0.0 * fb)
        hc = score.shape[0]
        sp = jnp.pad(score, ((0, 0), (0, wp - w)))
        n_cy, n_cx = hc // cell_size, wp // cell_size
        cells = sp.reshape(n_cy, cell_size, n_cx, cell_size)
        cells = cells.transpose(0, 2, 1, 3).reshape(
            n_cy * n_cx, cell_size * cell_size)
        cell_vals, cell_arg = fast.topk_iterative(cells, cell_top_k)
        return jnp.sum(cell_vals) + jnp.sum(cell_arg)

    def p_select(im, fb):
        score = upstream(im + 0.0 * fb)
        yx, resp, valid = pe.packed_select(
            score, plan, budgets, cell_size, cell_top_k)
        return jnp.sum(yx) + jnp.sum(resp) + jnp.sum(valid)

    rng = np.random.default_rng(0)
    images = [
        jnp.asarray(np.asarray(image) + rng.normal(0, 0.5, image.shape)
                    .astype(np.float32))
        for _ in range(8)
    ]

    def time_fn(fn):
        f = jax.jit(fn)
        fb = jnp.zeros(())
        for s in images:
            float(f(s, fb))
        outs = [jnp.zeros(()), jnp.zeros(())]
        n = 48
        t0 = time.perf_counter()
        for i in range(n):
            o = f(images[i % 8], outs[i % 2] * 0)
            outs[i % 2] = o
        _ = float(outs[0]) + float(outs[1])
        return (time.perf_counter() - t0) / n

    prev = 0.0
    for name, fn in [("score(NMS)", p_score), ("cell-topk", p_celltopk),
                     ("full-select", p_select)]:
        dt = time_fn(fn)
        print(f"{name:16s} {dt*1e3:7.3f} ms  (+{(dt-prev)*1e3:6.3f} ms)")
        prev = dt


if __name__ == "__main__":
    main()
