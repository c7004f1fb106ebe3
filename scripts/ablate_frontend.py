"""Stage ablation of the jitted tracking frontend on the live accelerator.

Times jitted PREFIXES of the per-frame pipeline and reports the deltas
(CLAUDE.md "Benchmarking on the axon TPU": standalone sub-stage timings
carry a dispatch floor that does not compose, so prefixes + subtraction is
the honest decomposition). Methodology matches bench.py: distinct input
buffer per iteration, depth-2 data dependence, value-fetch to end the
timed chain.

Usage: python scripts/ablate_frontend.py
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
    from orb_slam2_commit_tpu.ops import extractor as ext
    from orb_slam2_commit_tpu.ops import camera as cam_ops
    from orb_slam2_commit_tpu.optim import pose_opt
    from orb_slam2_commit_tpu.optim.residuals import BAObservations
    from orb_slam2_commit_tpu.slam import matchers
    from orb_slam2_commit_tpu.slam.jit_frontend import tracking_forward_step

    config, args = g._make_example(
        width=640, height=480, n_features=1000, n_points=1024
    )
    image, pt_pos, pt_desc, pt_octave, pt_angle, pt_valid, R_pred, t_pred = args
    rest = (pt_pos, pt_desc, pt_octave, pt_angle, pt_valid, R_pred, t_pred)
    cam = config.camera

    # ---- prefixes -----------------------------------------------------
    def p_extract(im, fb, *r):
        feats = ext.extract_features(im + 0.0 * fb, config.orb,
                                     cam.height, cam.width)
        return jnp.sum(feats.desc & 1) + jnp.sum(feats.xy)

    def p_match(im, fb, *r):
        (pp, pd, po, pa, pv, R, t) = r
        feats = ext.extract_features(im, config.orb, cam.height, cam.width)
        m = matchers.match_projection_last_frame.__wrapped__(
            pp, pd, po, pa, pv, R, t + 0.0 * fb,
            feats.xy, feats.desc, feats.angle, feats.octave, feats.valid,
            cam.fx, cam.fy, cam.cx, cam.cy,
            float(cam.width), float(cam.height), th=15.0,
        )
        return jnp.sum(m.idx).astype(jnp.float32)

    def p_full(im, fb, *r):
        (pp, pd, po, pa, pv, R, t) = r
        out = tracking_forward_step(im, pp, pd, po, pa, pv, R, t + 0.0 * fb,
                                    config)
        return out.n_inliers.astype(jnp.float32)

    # Extraction sub-stage prefixes (packed-canvas route internals).
    from orb_slam2_commit_tpu.ops import descriptors as desc_ops
    from orb_slam2_commit_tpu.ops import fast as fast_ops
    from orb_slam2_commit_tpu.ops import packed_extractor as pe
    from orb_slam2_commit_tpu.ops import pallas_level
    import numpy as _np

    plan = pe.make_plan(config.orb, cam.height, cam.width)
    budgets = config.orb.features_per_level()

    def upto_canvas(im, fb, *r):
        canvas = pe.build_canvas(im + 0.0 * fb, plan)
        return jnp.sum(canvas)

    def upto_preprocess(im, fb, *r):
        canvas = pe.build_canvas(im + 0.0 * fb, plan)
        blur_c, hi_c, lo_c = pallas_level.level_preprocess(
            canvas, float(config.orb.ini_th_fast), float(config.orb.min_th_fast)
        )
        return jnp.sum(blur_c) + jnp.sum(hi_c) + jnp.sum(lo_c)

    def upto_select(im, fb, *r):
        canvas = pe.build_canvas(im + 0.0 * fb, plan)
        blur_c, hi_c, lo_c = pallas_level.level_preprocess(
            canvas, float(config.orb.ini_th_fast), float(config.orb.min_th_fast)
        )
        mask = jnp.asarray(pe._border_mask_np(plan))
        score = fast_ops.combine_two_threshold(
            hi_c * mask, lo_c * mask, config.orb.cell_size
        )
        yx, resp, valid = pe.packed_select(
            score, plan, budgets, config.orb.cell_size, config.orb.cell_top_k
        )
        return jnp.sum(yx) + jnp.sum(resp) + jnp.sum(blur_c)

    def upto_angle(im, fb, *r):
        canvas = pe.build_canvas(im + 0.0 * fb, plan)
        blur_c, hi_c, lo_c = pallas_level.level_preprocess(
            canvas, float(config.orb.ini_th_fast), float(config.orb.min_th_fast)
        )
        mask = jnp.asarray(pe._border_mask_np(plan))
        score = fast_ops.combine_two_threshold(
            hi_c * mask, lo_c * mask, config.orb.cell_size
        )
        yx, resp, valid = pe.packed_select(
            score, plan, budgets, config.orb.cell_size, config.orb.cell_top_k
        )
        kmax = yx.shape[1]
        sel = jnp.asarray(_np.concatenate(
            [_np.arange(b, dtype=_np.int32) + l * kmax
             for l, b in enumerate(budgets)]
        ))
        yx_flat = yx.reshape(-1, 2)[sel]
        angle = desc_ops.ic_angle_patches(canvas, yx_flat)
        return jnp.sum(angle) + jnp.sum(blur_c)

    def p_floor(im, fb, *r):
        # Near-zero compute: isolates the per-dispatch floor the prefix
        # timings all carry.
        return jnp.sum(im) + fb

    stages = [("floor", p_floor),
              ("canvas", upto_canvas),
              ("+blur/FAST", upto_preprocess),
              ("+select", upto_select),
              ("+ic_angle", upto_angle),
              ("extract", p_extract), ("extract+match", p_match),
              ("full(+poseBA)", p_full)]

    n_images = 8
    rng = np.random.default_rng(0)
    images = [
        jnp.asarray(np.asarray(image)
                    + rng.normal(0, 0.5, image.shape).astype(np.float32))
        for _ in range(n_images)
    ]

    def timeit(fn):
        f = jax.jit(fn)
        fb0 = jnp.zeros(())
        out = f(images[0], fb0, *rest)
        jax.block_until_ready(out)
        w1, w2 = fb0, fb0
        for i in range(2 * n_images):
            out = f(images[i % n_images], w2, *rest)
            w2, w1 = w1, out.astype(jnp.float32)
        _ = float(w1) + float(w2)
        n_iters = 64
        fb1, fb2 = fb0, fb0
        start = time.perf_counter()
        for i in range(n_iters):
            out = f(images[i % n_images], fb2, *rest)
            fb2 = fb1
            fb1 = out.astype(jnp.float32)
        _ = float(fb1) + float(fb2)
        return (time.perf_counter() - start) / n_iters

    prev = 0.0
    for name, fn in stages:
        t = timeit(fn)
        print(f"{name:18s} {t * 1e3:7.3f} ms   (+{(t - prev) * 1e3:6.3f} ms)")
        prev = t


if __name__ == "__main__":
    main()
