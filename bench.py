"""Benchmark: per-frame tracking throughput of the jitted SLAM front end.

Measures the flagship hot path — ORB extraction (8-level pyramid, FAST,
oriented BRIEF) + map-point projection matching + pose-only BA — as one
jitted step at TUM-like settings (640x480, 1000 features, ~800 local map
points) on the available accelerator.

Baseline: the reference claims "real-time" tracking on an i7
(reference README.md:80), i.e. 30 frames/s with drivers pacing to camera
fps (Examples/Monocular/mono_tum.cc:103-111); BASELINE.md sets the target
at >= 2x that per chip. vs_baseline = measured_fps / 30.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as g

    config, args = g._make_example(
        width=640, height=480, n_features=1000, n_points=1024
    )

    from orb_slam2_commit_tpu.slam.jit_frontend import tracking_forward_step

    fn = jax.jit(
        lambda *a: tracking_forward_step(*a, config)
    )

    # Warm up / compile.
    out = fn(*args)
    jax.block_until_ready(out)
    n_in = int(out.n_inliers)

    # Timed runs.
    n_iters = 50
    start = time.perf_counter()
    for _ in range(n_iters):
        out = fn(*args)
    jax.block_until_ready(out)
    elapsed = time.perf_counter() - start
    fps = n_iters / elapsed

    baseline_fps = 30.0  # reference "real-time" claim (README.md:80)
    print(
        json.dumps(
            {
                "metric": "tracking_frontend_fps_640x480_1000feat",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / baseline_fps, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
