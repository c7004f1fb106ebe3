"""Measure the INITIAL map's structure error exactly.

Runs the System just past monocular initialization, pairs every map
point with its ground-truth landmark via the keyframe-0 observation
pixel (nearest gt projection), aligns with Umeyama over the pairs, and
reports residuals. This isolates triangulated-structure error from
trajectory/alignment confounds.

Usage: PYTHONPATH=. python scripts/diag_initmap.py [step] [w] [h] [--no-subpix]
"""

import os
import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

from orb_slam2_commit_tpu.slam.system import System
from orb_slam2_commit_tpu.slam.tracking import TrackingState
from orb_slam2_commit_tpu.utils import synthetic
from orb_slam2_commit_tpu.utils import trajectory as traj
from orb_slam2_commit_tpu.utils.config import synthetic_config


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    step = float(args[0]) if args else 0.03
    w = int(args[1]) if len(args) > 1 else 400
    h = int(args[2]) if len(args) > 2 else 300

    cfg = synthetic_config(width=w, height=h, n_features=1000)
    if "--no-subpix" in sys.argv:
        cfg = dataclasses.replace(
            cfg, orb=dataclasses.replace(cfg.orb, subpixel_refine=False)
        )
    images, poses_gt, scene = synthetic.render_sequence(
        cfg.camera, n_frames=14, n_points=600, seed=3, step=step
    )
    images = np.clip(np.round(images), 0, 255).astype(np.uint8)
    sys_ = System(cfg)
    init_at = None
    for i in range(14):
        sys_.track_monocular(images[i], i / cfg.camera.fps)
        if sys_.tracking_state() == TrackingState.OK and init_at is None:
            init_at = i
            break
    if init_at is None:
        print("never initialized")
        return

    m = sys_.map
    kf0 = 0
    cam = cfg.camera
    # gt projections in the FIRST init frame (the frame KF0 copies).
    # KF0's frame id:
    f0 = int(m.kf_frame_id[kf0]) if hasattr(m, "kf_frame_id") else 0
    R0, t0 = poses_gt[f0]
    pc = scene.points @ R0.T + t0
    uv = np.stack([cam.fx * pc[:, 0] / pc[:, 2] + cam.cx,
                   cam.fy * pc[:, 1] / pc[:, 2] + cam.cy], -1)

    feat_pid = m.kf_point_idx[kf0]
    rows = np.where(feat_pid >= 0)[0]
    rows = rows[m.pt_valid[feat_pid[rows]]]
    xy = m.kf_xy[kf0][rows]
    d = np.linalg.norm(xy[:, None] - uv[None], axis=-1)
    nearest = d.argmin(1)
    okc = d.min(1) < 3.0
    pids = feat_pid[rows[okc]]
    gt_pts = scene.points[nearest[okc]]
    est_pts = m.pt_pos[pids]
    print(f"init at frame {init_at}, kf0 frame {f0}, "
          f"{pids.size} paired points of {int(m.pt_valid.sum())}")

    s, R, t = traj.umeyama_alignment(est_pts, gt_pts, with_scale=True)
    res = np.linalg.norm(est_pts @ (s * R).T + t - gt_pts, axis=1)
    print(f"structure error after similarity alignment: "
          f"median {np.median(res)*1e3:.1f}mm p90 "
          f"{np.percentile(res, 90)*1e3:.1f}mm max {res.max()*1e3:.0f}mm")
    # Depth-relative error (what matters for downstream scale stability).
    z = gt_pts[:, 2]
    print(f"relative error median {np.median(res / np.linalg.norm(gt_pts, axis=1))*100:.2f}%")


if __name__ == "__main__":
    main()
