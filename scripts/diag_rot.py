"""Alignment-free per-frame relative-pose diagnostics on synthetic runs.

For each tracked frame prints the RELATIVE rotation/translation-direction
error of (frame i-1 -> frame i) vs ground truth — no Umeyama alignment,
so a single bad segment cannot poison the numbers — plus the tracker
state and inlier count. Localizes WHEN tracking starts lagging truth.

Usage: PYTHONPATH=. python scripts/diag_rot.py [n_frames] [step]
"""

import os
import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from orb_slam2_commit_tpu.slam.system import System
from orb_slam2_commit_tpu.utils import synthetic
from orb_slam2_commit_tpu.utils.config import synthetic_config


def rot_angle_deg(R):
    return float(np.degrees(np.arccos(np.clip((np.trace(R) - 1) / 2, -1, 1))))


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_frames = int(args[0]) if args else 40
    step = float(args[1]) if len(args) > 1 else 0.03

    import dataclasses

    cfg = synthetic_config(width=640, height=480, n_features=1000)
    tr = {}
    if os.environ.get("ORB_INIT_PARALLAX"):
        tr["init_min_parallax_deg"] = float(os.environ["ORB_INIT_PARALLAX"])
    if os.environ.get("ORB_TRI_PARALLAX"):
        tr["tri_min_parallax_deg"] = float(os.environ["ORB_TRI_PARALLAX"])
    if tr:
        cfg = dataclasses.replace(
            cfg, tracker=dataclasses.replace(cfg.tracker, **tr)
        )
    images, poses_gt, scene = synthetic.render_sequence(
        cfg.camera, n_frames=n_frames, n_points=600, seed=3, step=step
    )
    images = np.clip(np.round(images), 0, 255).astype(np.uint8)
    sys_ = System(cfg)

    prev_est = None
    prev_gt = None
    print(" frm st inl  kfs  dR_err(deg) |dt|_est  |dt|_gt  gt_dR(deg)")
    for i in range(n_frames):
        out = sys_.track_monocular(images[i], i / cfg.camera.fps)
        Rg, tg = poses_gt[i]
        state = sys_.tracking_state().name[:4]
        if out is None:
            print(f"{i:4d} {state} --")
            prev_est = None
            prev_gt = None
            continue
        R, t = out
        if prev_est is not None:
            Rpe, tpe = prev_est
            Rpg, tpg = prev_gt
            dR_est = R @ Rpe.T
            dR_gt = Rg @ Rpg.T
            err = rot_angle_deg(dR_est @ dR_gt.T)
            dt_est = np.linalg.norm(-R.T @ t + Rpe.T @ tpe)
            dt_gt = np.linalg.norm(-Rg.T @ tg + Rpg.T @ tpg)
            print(
                f"{i:4d} {state} {sys_.tracker.n_inliers:3d} "
                f"{sys_.map.n_keyframes():4d} {err:10.3f} "
                f"{dt_est:9.4f} {dt_gt:8.4f} {rot_angle_deg(dR_gt):8.3f}"
            )
        prev_est = (R.copy(), t.copy())
        prev_gt = (Rg, tg)


if __name__ == "__main__":
    main()
