"""Track-time vs resolved-trajectory accuracy split.

Captures each frame's pose AT TRACK TIME (before any later BA/loop
correction can rewrite history) and compares both that live trajectory
and the final resolved trajectory against ground truth, with scale
aligned on an early window. Separates "online tracking is wrong" from
"post-hoc trajectory resolution / map corrections are wrong".

Usage: PYTHONPATH=. python scripts/diag_track.py [n_frames] [step] [--reanchor]
"""

import dataclasses
import os
import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from orb_slam2_commit_tpu.slam.system import System
from orb_slam2_commit_tpu.utils import synthetic
from orb_slam2_commit_tpu.utils import trajectory as traj
from orb_slam2_commit_tpu.utils.config import synthetic_config


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_frames = int(args[0]) if args else 40
    step = float(args[1]) if len(args) > 1 else 0.03

    cfg = synthetic_config(width=640, height=480, n_features=1000)
    if "--reanchor" in sys.argv:
        cfg = dataclasses.replace(
            cfg,
            tracker=dataclasses.replace(cfg.tracker, reanchor_last_frame=True),
        )
    images, poses_gt, scene = synthetic.render_sequence(
        cfg.camera, n_frames=n_frames, n_points=600, seed=3, step=step
    )
    images = np.clip(np.round(images), 0, 255).astype(np.uint8)
    sys_ = System(cfg)
    m = sys_.map

    live = {}          # frame index -> camera center at track time
    kf_events = {}
    for i in range(n_frames):
        nk0 = m.n_keyframes()
        sys_.track_monocular(images[i], i / cfg.camera.fps)
        fr = sys_.tracker.last_frame
        if fr is not None and fr.R is not None:
            live[i] = -fr.R.T @ fr.t
        if m.n_keyframes() > nk0:
            kf_events[i] = m.n_keyframes()

    gt = np.asarray([-R.T @ t for R, t in poses_gt])

    idx = sorted(live.keys())
    est_live = np.asarray([live[i] for i in idx])
    gt_live = gt[idx]
    # Early-window similarity alignment (first 12 tracked frames).
    n_al = min(12, len(idx))
    s, R_al, t_al = traj.umeyama_alignment(est_live[:n_al], gt_live[:n_al])
    est_al = est_live @ (s * R_al).T + t_al
    err = np.linalg.norm(est_al - gt_live, axis=1)
    print(f"live track-time error (early-aligned, gt units={step}m/frame):")
    for j, i in enumerate(idx):
        mark = f"  KF->{kf_events[i]}" if i in kf_events else ""
        print(f"  frm {i:3d}  err {err[j]*1000:8.1f}mm{mark}")

    est = sys_.trajectory_positions()
    offset = n_frames - est.shape[0]
    if est.shape[0] >= 5:
        n_al2 = min(12, est.shape[0])
        s2, R2, t2 = traj.umeyama_alignment(est[:n_al2], gt[offset:offset + n_al2])
        est2 = est @ (s2 * R2).T + t2
        err2 = np.linalg.norm(est2 - gt[offset:], axis=1)
        print(f"resolved trajectory (early-aligned): "
              f"rmse {np.sqrt(np.mean(err2**2))*1000:.1f}mm  "
              f"max {err2.max()*1000:.1f}mm")
        print(f"global-umeyama ATE {traj.ate_rmse(est, gt[offset:]):.4f} m")
    # Final map quality.
    pids = np.where(m.pt_valid[: m.next_pt])[0]
    if pids.size:
        kf_ids = np.where(m.kf_valid)[0]
        kc = np.asarray([-m.kf_pose_R[k].T @ m.kf_pose_t[k] for k in kf_ids])
        # Align KF centers to gt? We don't know frame ids of KFs; skip.
        pts = m.pt_pos[pids] @ (s * R_al).T + t_al
        d = np.linalg.norm(pts[:, None] - scene.points[None], axis=-1).min(1)
        print(f"map ({pids.size} pts, live-alignment): NN-err median "
              f"{np.median(d)*1000:.1f}mm p90 {np.percentile(d,90)*1000:.1f}mm")


if __name__ == "__main__":
    main()
