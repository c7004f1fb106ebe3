"""Driver: monocular SLAM on a synthetic sequence (the stand-in for
Examples/Monocular/mono_tum.cc while no dataset is available).

Usage: python examples/run_synthetic_mono.py [n_frames] [--cpu]
Prints per-stage progress and final ATE RMSE vs the exact ground truth.
"""

import sys
import time

import numpy as np

if "--cpu" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")

from orb_slam2_commit_tpu.slam.system import System
from orb_slam2_commit_tpu.utils import synthetic
from orb_slam2_commit_tpu.utils import trajectory as traj
from orb_slam2_commit_tpu.utils.config import synthetic_config


def main():
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 40
    cfg = synthetic_config(width=400, height=300, n_features=1000)
    print(f"rendering {n_frames} frames...")
    images, poses_gt, scene = synthetic.render_sequence(
        cfg.camera, n_frames=n_frames, n_points=400, seed=3, step=0.05
    )
    sys_ = System(cfg)

    t0 = time.time()
    n_tracked = 0
    for i in range(n_frames):
        ts = i / cfg.camera.fps
        t1 = time.time()
        pose = sys_.track_monocular(images[i], ts)
        state = sys_.tracking_state().name
        n_kf = sys_.map.n_keyframes()
        n_pt = sys_.map.n_points()
        if pose is not None:
            n_tracked += 1
        print(
            f"frame {i:3d}: state={state:15s} kf={n_kf:3d} pts={n_pt:5d} "
            f"inliers={sys_.tracker.n_inliers:4d} dt={time.time()-t1:.2f}s"
        )
    print(f"total {time.time()-t0:.1f}s, tracked {n_tracked}/{n_frames}")

    est = sys_.trajectory_positions()
    lost = [e.lost for e in sys_.tracker.trajectory]
    gt = np.asarray([-R.T @ t for R, t in poses_gt])
    # Align counts: trajectory entries start at the first initialized frame.
    offset = n_frames - len(est)
    gt_used = gt[offset:]
    ok = ~np.asarray(lost, dtype=bool)
    if est.shape[0] >= 5:
        rmse = traj.ate_rmse(est[ok], gt_used[ok], align_scale=True)
        print(f"ATE RMSE (scale-aligned): {rmse:.4f} m  "
              f"(trajectory span {np.linalg.norm(gt[-1]-gt[0]):.2f} m)")
        # Drift metric (TUM evaluate_rpe semantics). Monocular scale is
        # free, so align the estimated trajectory's scale first.
        est_poses = [(R, t) for _, R, t in sys_._resolve_trajectory()]
        s, _, _ = traj.umeyama_alignment(est[ok], gt_used[ok])
        est_poses = [(R, s * t) for R, t in est_poses]
        gt_poses = [poses_gt[i + offset] for i in range(len(est_poses))]
        t_rpe, r_rpe = traj.rpe_stats(est_poses, gt_poses, delta=1)
        print(f"RPE (delta=1 frame): {t_rpe:.4f} m, "
              f"{np.degrees(r_rpe):.3f} deg")
    sys_.save_trajectory_tum("/tmp/synthetic_traj.txt")
    print("saved /tmp/synthetic_traj.txt")
    print(sys_.profiler.report())


if __name__ == "__main__":
    main()
