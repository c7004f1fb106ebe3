"""Diagnose fused-vs-staged tracking divergence (tests/test_fused_track.py)."""
import os
import numpy as np

from orb_slam2_commit_tpu.slam.system import System
from orb_slam2_commit_tpu.utils import synthetic
from orb_slam2_commit_tpu.utils.config import synthetic_config


def run(cfg, images, fused):
    os.environ["ORB_TPU_FUSED_TRACK"] = "1" if fused else "0"
    sys_ = System(cfg)
    log = []
    for i, im in enumerate(images):
        p = sys_.track_monocular(im, i / cfg.camera.fps)
        f = sys_.tracker.last_frame
        nb = int((f.point_ids >= 0).sum()) if f is not None else -1
        log.append((i, p is not None, nb, sys_.map.n_keyframes(), sys_.map.n_points()))
    return sys_, log


def main():
    cfg = synthetic_config(width=320, height=240, n_features=600)
    images, poses_gt, scene = synthetic.render_sequence(
        cfg.camera, n_frames=8, n_points=300, seed=3, step=0.05
    )
    s_staged, log_s = run(cfg, images, False)
    s_fused, log_f = run(cfg, images, True)
    print("frame | staged tracked nb nkf npt | fused tracked nb nkf npt")
    for (i, ts, nbs, ks, ps), (_, tf, nbf, kf, pf) in zip(log_s, log_f):
        print(f"{i:3d} | {ts!s:5} {nbs:4d} {ks:2d} {ps:4d} | {tf!s:5} {nbf:4d} {kf:2d} {pf:4d}")
    ff, fs = s_fused.tracker.last_frame, s_staged.tracker.last_frame
    both = (ff.point_ids >= 0) | (fs.point_ids >= 0)
    agree = (ff.point_ids == fs.point_ids)[both].mean()
    print("binding agreement:", agree, "both:", int(both.sum()))
    only_f = int(((ff.point_ids >= 0) & (fs.point_ids < 0)).sum())
    only_s = int(((fs.point_ids >= 0) & (ff.point_ids < 0)).sum())
    mism = int(((ff.point_ids >= 0) & (fs.point_ids >= 0)
                & (ff.point_ids != fs.point_ids)).sum())
    print(f"only fused bound: {only_f}, only staged: {only_s}, both-but-different: {mism}")
    # Are the map point POSITIONS for differing ids actually near each other?
    sel = np.where((ff.point_ids >= 0) & (fs.point_ids >= 0)
                   & (ff.point_ids != fs.point_ids))[0][:10]
    for j in sel:
        pf_ = s_fused.map.pt_pos[ff.point_ids[j]]
        ps_ = s_staged.map.pt_pos[fs.point_ids[j]]
        print(f"feat {j}: fused id {ff.point_ids[j]} {pf_.round(3)} | "
              f"staged id {fs.point_ids[j]} {ps_.round(3)}")


if __name__ == "__main__":
    main()
