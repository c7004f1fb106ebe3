"""End-to-end System throughput on the live accelerator.

Runs the FULL pipeline — fused tracking frontend + keyframe insertion +
local mapping (triangulation, fuse, local BA, culling) — on a synthetic
640x480 monocular sequence and reports steady-state frames/s over the
tail of the run (the head pays remote compilations for every new
problem-shape bucket). Unlike bench.py (jitted frontend only), this
includes ALL host bookkeeping and backend work; with --async the
mapping/loop stage runs on the worker thread like the reference's
LocalMapping thread.

Usage: python scripts/bench_system.py [n_frames] [--async] [--cpu]
"""

import sys
import time

import numpy as np

if "--cpu" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from orb_slam2_commit_tpu.slam.system import System
from orb_slam2_commit_tpu.utils import synthetic
from orb_slam2_commit_tpu.utils import trajectory as traj
from orb_slam2_commit_tpu.utils.config import synthetic_config


def main():
    n_frames = 120
    for a in sys.argv[1:]:
        if a.isdigit():
            n_frames = int(a)
    use_async = "--async" in sys.argv

    cfg = synthetic_config(width=640, height=480, n_features=1000)
    print(f"rendering {n_frames} frames...", flush=True)
    images, poses_gt, scene = synthetic.render_sequence(
        cfg.camera, n_frames=n_frames, n_points=600, seed=3, step=0.03
    )
    # Cameras deliver 8-bit frames; upload uint8 (4x less host->device
    # traffic, f32 cast happens in-graph).
    images = np.clip(np.round(images), 0, 255).astype(np.uint8)
    sys_ = System(cfg, async_mapping=use_async)

    warm = min(max(n_frames // 3, 20), 60, n_frames - 1)
    t_steady = None
    frame_times = []
    for i in range(n_frames):
        ts = i / cfg.camera.fps
        if i == warm:
            t_steady = time.perf_counter()
        t1 = time.perf_counter()
        sys_.track_monocular(images[i], ts)
        frame_times.append(time.perf_counter() - t1)
        if i % 20 == 0:
            print(
                f"frame {i:3d}: state={sys_.tracking_state().name:15s} "
                f"kf={sys_.map.n_keyframes():3d} pts={sys_.map.n_points():5d} "
                f"dt={frame_times[-1]*1e3:.1f}ms",
                flush=True,
            )
    steady_s = time.perf_counter() - t_steady
    sys_.shutdown()

    tail = np.asarray(frame_times[warm:])
    fps = (n_frames - warm) / steady_s
    est = sys_.trajectory_positions()
    gt = np.asarray([-R.T @ t for R, t in poses_gt])
    rmse = float("nan")
    if est.shape[0] >= 5:
        off = n_frames - est.shape[0]
        rmse = traj.ate_rmse(est, gt[off:], align_scale=True)
    print(sys_.profiler.report())
    print(
        f"steady-state ({n_frames - warm} frames, async={use_async}): "
        f"{fps:.1f} fps | median {np.median(tail)*1e3:.1f} ms "
        f"p90 {np.percentile(tail, 90)*1e3:.1f} ms "
        f"max {tail.max()*1e3:.1f} ms | ATE {rmse:.4f} m"
    )


if __name__ == "__main__":
    main()
