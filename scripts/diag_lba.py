"""Instrument local BA keyframe pose moves on the synthetic sequence.

Instruments every _local_ba call: prints how far each free keyframe's
camera center moved and the fresh KF's baseline to its strongest
covisible neighbor. (Historical: this reproduced the round-1
fresh-keyframe instability, root-caused to float32 rotation skew
compounding — see utils/rotation.py.)

Usage: PYTHONPATH=. python scripts/diag_lba.py [n_frames] [step] [--reanchor]
"""

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

    import dataclasses

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

    def centers(kfs):
        return {
            int(k): -m.kf_pose_R[k].T @ m.kf_pose_t[k] for k in kfs
        }

    orig_lba = sys_.mapper._local_ba

    def traced_lba(kf):
        kfs = np.where(m.kf_valid)[0]
        c0 = centers(kfs)
        # Parallax of the fresh KF's bound points vs their first KF.
        row = m.kf_point_idx[kf]
        pids = row[row >= 0]
        pids = pids[m.pt_valid[pids]]
        ck = -m.kf_pose_R[kf].T @ m.kf_pose_t[kf]
        neigh = m.covisible_keyframes(kf, 1, min_weight=1)
        base = (
            np.linalg.norm(ck - c0[int(neigh[0])]) if neigh.size else -1.0
        )
        orig_lba(kf)
        c1 = centers(kfs)
        moves = {k: float(np.linalg.norm(c1[k] - c0[k])) for k in c0}
        big = {k: round(v, 4) for k, v in moves.items() if v > 1e-3}
        print(
            f"  LBA(kf={kf}) nbase={base:.4f} npts={pids.size} "
            f"moves>{1e-3}: {big}"
        )

    sys_.mapper._local_ba = traced_lba

    for i in range(n_frames):
        nk0 = m.n_keyframes()
        sys_.track_monocular(images[i], i / cfg.camera.fps)
        if m.n_keyframes() > nk0:
            print(f"frame {i}: new KF (total {m.n_keyframes()}), "
                  f"inliers {sys_.tracker.n_inliers}")

    est = sys_.trajectory_positions()
    gt = np.asarray([-R.T @ t for R, t in poses_gt])
    offset = n_frames - est.shape[0]
    if est.shape[0] >= 5 and offset >= 0:
        # One entry per frame from a single init offset; mid-run losses or
        # relocalizations would misalign est vs gt[offset:], so skip ATE
        # when any entry is flagged lost.
        lost = np.asarray([e.lost for e in sys_.tracker.trajectory], bool)
        if lost.any():
            print(f"{int(lost.sum())} lost entries - skipping ATE "
                  f"(alignment would pair wrong frames)")
        else:
            print(f"ATE {traj.ate_rmse(est, gt[offset:]):.4f} m "
                  f"(init at {offset})")


if __name__ == "__main__":
    main()
