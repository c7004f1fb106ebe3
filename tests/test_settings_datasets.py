"""Settings parser + dataset loader tests on generated fixtures."""

import os

import numpy as np
import pytest

from orb_slam2_commit_tpu.utils import datasets, settings

TUM1_YAML = """%YAML:1.0

# Camera calibration and distortion parameters (OpenCV)
Camera.fx: 517.306408
Camera.fy: 516.469215
Camera.cx: 318.643040
Camera.cy: 255.313989

Camera.k1: 0.262383
Camera.k2: -0.953104
Camera.p1: -0.005358
Camera.p2: 0.002628
Camera.k3: 1.163314

Camera.fps: 30.0
Camera.bf: 40.0
ThDepth: 40.0
DepthMapFactor: 5000.0

ORBextractor.nFeatures: 1000
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 8
ORBextractor.iniThFAST: 20
ORBextractor.minThFAST: 7
"""

EUROC_MATRIX_YAML = """%YAML:1.0
Camera.fx: 435.2
Camera.fy: 435.2
Camera.cx: 367.4
Camera.cy: 252.2
LEFT.K: !!opencv-matrix
   rows: 3
   cols: 3
   dt: d
   data: [458.654, 0.0, 367.215, 0.0, 457.296, 248.375, 0.0, 0.0, 1.0]
LEFT.D: !!opencv-matrix
   rows: 1
   cols: 5
   dt: d
   data: [-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05, 0.0]
"""


class TestSettings:
    def test_tum_yaml(self, tmp_path):
        p = tmp_path / "TUM1.yaml"
        p.write_text(TUM1_YAML)
        cfg = settings.config_from_settings(str(p), sensor="rgbd")
        assert cfg.camera.fx == pytest.approx(517.306408)
        assert cfg.camera.k1 == pytest.approx(0.262383)
        assert cfg.camera.depth_map_factor == pytest.approx(5000.0)
        assert cfg.orb.n_features == 1000
        assert cfg.orb.ini_th_fast == 20
        assert cfg.sensor == "rgbd"

    def test_opencv_matrix_nodes(self, tmp_path):
        p = tmp_path / "EuRoC.yaml"
        p.write_text(EUROC_MATRIX_YAML)
        s = settings.parse_opencv_yaml(str(p))
        K = s["LEFT.K"]
        assert K.shape == (3, 3)
        assert K[0, 0] == pytest.approx(458.654)
        D = s["LEFT.D"]
        assert D.shape == (1, 5)
        assert D[0, 3] == pytest.approx(1.76187114e-05)


class TestDatasetParsers:
    def test_tum_mono_listing(self, tmp_path):
        (tmp_path / "rgb").mkdir()
        rows = ["# comment", "1.0 rgb/a.png", "1.033 rgb/b.png"]
        (tmp_path / "rgb.txt").write_text("\n".join(rows))
        seq = datasets.load_tum_mono(str(tmp_path))
        assert len(seq) == 2
        assert seq.timestamps[1] == pytest.approx(1.033)
        assert seq.rgb_paths[0].endswith("rgb/a.png")

    def test_tum_rgbd_associations(self, tmp_path):
        assoc = tmp_path / "assoc.txt"
        assoc.write_text("1.0 rgb/a.png 1.001 depth/a.png\n")
        seq = datasets.load_tum_rgbd(str(tmp_path), str(assoc))
        assert len(seq) == 1
        assert seq.depth_paths[0].endswith("depth/a.png")

    def test_kitti_listing(self, tmp_path):
        (tmp_path / "times.txt").write_text("0.0\n0.1\n0.2\n")
        seq = datasets.load_kitti(str(tmp_path), stereo=True)
        assert len(seq) == 3
        assert seq.rgb_paths[2].endswith("image_0/000002.png")
        assert seq.right_paths[2].endswith("image_1/000002.png")

    def test_euroc_listing(self, tmp_path):
        cam0 = tmp_path / "mav0" / "cam0"
        cam0.mkdir(parents=True)
        (cam0 / "data.csv").write_text(
            "#timestamp,filename\n1403636579763555584,x\n"
        )
        seq = datasets.load_euroc(str(tmp_path), stereo=True)
        assert len(seq) == 1
        assert abs(seq.timestamps[0] - 1403636579.763555584) < 1e-5
        assert "cam1" in seq.right_paths[0]


class TestRectification:
    def test_identity_rectification_is_noop(self):
        K = np.array([[300.0, 0, 160], [0, 300.0, 120], [0, 0, 1]])
        D = np.zeros(5)
        R = np.eye(3)
        mx, my = datasets.rectify_maps(K, D, R, K, 320, 240)
        ys, xs = np.mgrid[0:240, 0:320]
        np.testing.assert_allclose(mx, xs, atol=1e-3)
        np.testing.assert_allclose(my, ys, atol=1e-3)

    def test_remap_identity(self):
        rng = np.random.default_rng(0)
        img = rng.uniform(0, 255, (40, 50)).astype(np.float32)
        ys, xs = np.mgrid[0:40, 0:50].astype(np.float32)
        out = datasets.remap_bilinear(img, xs, ys)
        np.testing.assert_allclose(out[:-1, :-1], img[:-1, :-1], atol=1e-3)
