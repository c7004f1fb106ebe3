"""Check per-frame pose consistency: reprojection of bound map points
under the returned pose, plus absolute rotation error vs ground truth.

Separates two hypotheses for the step-0.03 rotation-drift explosion:
- returned pose is INCONSISTENT with the map (optimizer/inlier bug)
- returned pose fits the map fine but the map/world is rotating away
  from ground truth (map-warp or init-structure bug).

Usage: PYTHONPATH=. python scripts/diag_reproj.py [n_frames] [step]
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
    n_frames = int(args[0]) if args else 25
    step = float(args[1]) if len(args) > 1 else 0.03

    cfg = synthetic_config(width=640, height=480, n_features=1000)
    cam = cfg.camera
    images, poses_gt, scene = synthetic.render_sequence(
        cam, n_frames=n_frames, n_points=600, seed=3, step=step
    )
    images = np.clip(np.round(images), 0, 255).astype(np.uint8)
    sys_ = System(cfg)
    m = sys_.map

    R_align = None  # R_est = R_align-free: R_gt ~ R_est @ R_w (world rotation offset)
    print(" frm  inl  nbound  reproj_med(px)  reproj_p90  absR_err(deg)")
    for i in range(n_frames):
        out = sys_.track_monocular(images[i], i / cam.fps)
        if out is None:
            print(f"{i:4d}  lost/init")
            continue
        R, t = out
        Rg, tg = poses_gt[i]
        if R_align is None:
            R_align = R.T @ Rg  # world-frame offset at first OK frame
        abs_err = rot_angle_deg(R @ R_align @ Rg.T)

        fr = sys_.tracker.last_frame
        ids = fr.point_ids
        sel = (ids >= 0) & fr.valid
        pids = ids[sel]
        ok = m.pt_valid[pids]
        pids = pids[ok]
        if pids.size == 0:
            print(f"{i:4d} {sys_.tracker.n_inliers:4d}      0")
            continue
        Xc = m.pt_pos[pids] @ R.T + t
        z = np.maximum(Xc[:, 2], 1e-9)
        u = cam.fx * Xc[:, 0] / z + cam.cx
        v = cam.fy * Xc[:, 1] / z + cam.cy
        uv = np.stack([u, v], 1)
        kp = fr.xy[sel][ok]
        r = np.linalg.norm(uv - kp, axis=1)
        print(
            f"{i:4d} {sys_.tracker.n_inliers:4d} {pids.size:7d} "
            f"{np.median(r):14.2f} {np.percentile(r, 90):11.2f} "
            f"{abs_err:13.3f}"
        )


if __name__ == "__main__":
    main()
