"""Driver: monocular AR demo — track a synthetic sequence, detect the
dominant plane in the sparse map, and render a virtual cube anchored to
it in every frame.

The stand-in for the reference's MonoAR ROS node
(Examples/ROS/ORB_SLAM2/src/AR/ViewerAR.h; README.md:196-205 documents
the node set). Frames with the cube overlay are written as PNGs.

Usage: python examples/run_ar.py [n_frames] [--cpu] [--out DIR]
"""

import os
import sys
import time

import numpy as np

if "--cpu" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")

from orb_slam2_commit_tpu.slam.ar import ARAnchor
from orb_slam2_commit_tpu.slam.system import System
from orb_slam2_commit_tpu.slam import viewer
from orb_slam2_commit_tpu.utils import synthetic
from orb_slam2_commit_tpu.utils.config import synthetic_config


def main():
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 24
    out_dir = "/tmp/ar_frames"
    if "--out" in sys.argv:
        out_dir = sys.argv[sys.argv.index("--out") + 1]
    os.makedirs(out_dir, exist_ok=True)

    cfg = synthetic_config(width=400, height=300, n_features=1000)
    cam = cfg.camera
    print(f"rendering {n_frames} frames (60% of landmarks on a plane)...")
    images, poses_gt, scene = synthetic.render_sequence(
        cam, n_frames=n_frames, n_points=400, seed=3, step=0.05,
        planar_frac=0.6,
    )
    sys_ = System(cfg)
    anchor = ARAnchor(min_points=40, seed=7)

    n_overlaid = 0
    t0 = time.time()
    for i in range(n_frames):
        pose = sys_.track_monocular(images[i], i / cam.fps)
        frame = sys_.tracker.last_frame
        canvas = np.stack([images[i]] * 3, axis=-1).astype(np.uint8)
        status = "tracking..."
        if pose is not None and frame is not None:
            R, t = pose
            cam_center = -R.T @ t
            pt_valid = sys_.map.pt_valid
            anchor.update(sys_.map.pt_pos, pt_valid, cam_center)
            canvas = viewer.draw_frame(
                frame, images[i], sys_.tracking_state().name, sys_.map
            )
            if anchor.overlay(canvas, R, t, cam.fx, cam.fy, cam.cx, cam.cy):
                n_overlaid += 1
                status = "cube anchored"
        viewer.save_png(os.path.join(out_dir, f"ar_{i:04d}.png"), canvas)
        print(f"frame {i:3d}: state={sys_.tracking_state().name:15s} {status}")
    print(
        f"total {time.time()-t0:.1f}s; cube overlaid on {n_overlaid}/{n_frames} "
        f"frames; PNGs in {out_dir}"
    )


if __name__ == "__main__":
    main()
