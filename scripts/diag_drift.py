"""Diagnose where trajectory error enters on a synthetic sequence.

Runs the System, then prints per-frame relative-pose error vs ground
truth (rotation deg / translation after global scale alignment), keyframe
events and inlier counts, to localize drift (init? keyframe gaps? steady
accumulation?).

Usage: PYTHONPATH=. python scripts/diag_drift.py [n_frames] [step] [--cpu] [--fused]
"""

import os
import sys

import numpy as np

if "--cpu" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")
os.environ.setdefault(
    "ORB_TPU_FUSED_TRACK", "1" if "--fused" in sys.argv else "0"
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from orb_slam2_commit_tpu.slam.system import System
from orb_slam2_commit_tpu.utils import synthetic
from orb_slam2_commit_tpu.utils import trajectory as traj
from orb_slam2_commit_tpu.utils.config import synthetic_config


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_frames = int(args[0]) if args else 60
    step = float(args[1]) if len(args) > 1 else 0.03
    w = int(args[2]) if len(args) > 2 else 640
    h = int(args[3]) if len(args) > 3 else 480

    cfg = synthetic_config(width=w, height=h, n_features=1000)
    images, poses_gt, scene = synthetic.render_sequence(
        cfg.camera, n_frames=n_frames, n_points=600, seed=3, step=step
    )
    images = np.clip(np.round(images), 0, 255).astype(np.uint8)
    sys_ = System(cfg)

    def map_scale():
        pv = sys_.map.pt_valid[: sys_.map.next_pt]
        if not pv.any():
            return 0.0
        return float(np.median(
            np.linalg.norm(sys_.map.pt_pos[: sys_.map.next_pt][pv], axis=1)
        ))

    orig_pk = sys_.mapper.process_keyframe

    def traced_pk(kf):
        s0 = map_scale()
        orig_pk(kf)
        s1 = map_scale()
        print(f"    process_keyframe({kf}): map median radius "
              f"{s0:.3f} -> {s1:.3f}  ({s1 / max(s0, 1e-12):.3f}x)")

    sys_.mapper.process_keyframe = traced_pk

    kf_at = []
    inl = []
    for i in range(n_frames):
        before = sys_.map.n_keyframes()
        sys_.track_monocular(images[i], i / cfg.camera.fps)
        kf_at.append(sys_.map.n_keyframes() - before)
        inl.append(sys_.tracker.n_inliers)

    est = sys_.trajectory_positions()
    if est.shape[0] < 5:
        print(f"tracking failed: only {est.shape[0]} trajectory entries "
              f"(resets wiped the run)")
        return
    gt = np.asarray([-R.T @ t for R, t in poses_gt])
    offset = n_frames - est.shape[0]
    s, _, _ = traj.umeyama_alignment(est, gt[offset:])
    est_poses = [(R, s * t) for _, R, t in sys_._resolve_trajectory()]
    gt_poses = [poses_gt[i + offset] for i in range(len(est_poses))]

    print(f"init at frame {offset}, scale {s:.3f}, "
          f"ATE {traj.ate_rmse(est, gt[offset:]):.4f} m")

    # Map quality vs the ground-truth scene, aligned on the EARLY stable
    # window only (a global fit is poisoned by any collapse segment).
    n_align = min(12, est.shape[0])
    s_e, R_e, t_e = traj.umeyama_alignment(
        est[:n_align], gt[offset:offset + n_align]
    )
    pids = np.where(sys_.map.pt_valid[: sys_.map.next_pt])[0]
    pts = sys_.map.pt_pos[pids] @ (s_e * R_e).T + t_e
    d = np.linalg.norm(pts[:, None] - scene.points[None], axis=-1).min(1)
    print(f"map ({pids.size} pts, early-window alignment): NN-error "
          f"median {np.median(d)*1e3:.1f}mm p90 "
          f"{np.percentile(d, 90)*1e3:.1f}mm max {d.max()*1e3:.0f}mm")

    # Alignment-free scale-drift signal: per-frame step length ratio.
    step_est = np.linalg.norm(np.diff(est, axis=0), axis=1)
    step_gt = np.linalg.norm(np.diff(gt[offset:], axis=0), axis=1)
    ratio = step_est * s_e / np.maximum(step_gt, 1e-12)
    print("est/gt step ratio (early-aligned scale), every 2nd frame:",
          np.round(ratio[::2], 3).tolist())
    print(" frm  kf inl   rpe_t(mm)  rpe_r(deg)")
    for i in range(len(est_poses) - 1):
        (tr, rr) = traj.rpe_stats(
            est_poses[i:i + 2], gt_poses[i:i + 2], delta=1
        )
        mark = " KF" if kf_at[i + offset + 1] else ""
        print(f"{i + offset + 1:4d} {kf_at[i + offset + 1]:3d} "
              f"{inl[i + offset + 1]:3d} {tr * 1e3:10.2f} "
              f"{np.degrees(rr):10.3f}{mark}")


if __name__ == "__main__":
    main()
