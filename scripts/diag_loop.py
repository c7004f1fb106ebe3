"""Prototype/diagnose loop closure from rendered images (ring scene)."""
import sys
import time

import numpy as np

from orb_slam2_commit_tpu.slam.system import System
from orb_slam2_commit_tpu.utils import synthetic
from orb_slam2_commit_tpu.utils import trajectory as traj
from orb_slam2_commit_tpu.utils.config import synthetic_config


def run(cfg, images, vocab):
    sys_ = System(cfg, vocabulary=vocab)
    t0 = time.time()
    for i, im in enumerate(images):
        sys_.track_monocular(im, i / cfg.camera.fps)
        lc = sys_.loop_closer
        if i % 10 == 0 or (lc and lc.n_loops_closed):
            print(f"  f{i}: {sys_.tracker.state.name} kf={sys_.map.n_keyframes()} "
                  f"pts={sys_.map.n_points()} "
                  f"loops={lc.n_loops_closed if lc else '-'} "
                  f"({time.time()-t0:.0f}s)")
    sys_.shutdown()
    return sys_


def ate_of(sys_, poses_gt):
    est = sys_.trajectory_positions()
    gt = np.asarray([-R.T @ t for R, t in poses_gt])
    if est.shape[0] < 5:
        return float("nan"), gt
    lost = np.asarray([e.lost for e in sys_.tracker.trajectory], bool)
    offset = len(poses_gt) - len(est)
    ok = ~lost
    return traj.ate_rmse(est[ok], gt[offset:][ok], align_scale=True), gt


def main():
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 132
    cfg = synthetic_config(width=400, height=300, n_features=500)
    t0 = time.time()
    images, poses_gt, scene = synthetic.render_loop_sequence(
        cfg.camera, n_frames=n_frames, frac=1.35, seed=4,
    )
    print(f"rendered {n_frames} frames in {time.time()-t0:.0f}s")

    print("WITH loop closing (default vocab):")
    s_loop = run(cfg, images, "default")
    ate_loop, gt = ate_of(s_loop, poses_gt)
    print("WITHOUT loop closing:")
    s_off = run(cfg, images, None)
    ate_off, _ = ate_of(s_off, poses_gt)
    span = np.abs(gt).max() * 2
    lc = s_loop.loop_closer
    print(f"loops closed: {lc.n_loops_closed}")
    print(f"ATE with loop closing:    {ate_loop:.4f} ({100*ate_loop/span:.2f}% span)")
    print(f"ATE without loop closing: {ate_off:.4f} ({100*ate_off/span:.2f}% span)")


if __name__ == "__main__":
    main()
