"""Lens distortion end-to-end: model inversion + distorted-image pipeline.

The reference's default operating point is TUM1's heavy radial-tangential
distortion (settings k1=0.26..k3=1.16, applied at
src/Frame.cc:471-506 via cv::undistortPoints; schema read at
src/Tracking.cc:53-117). These tests cover (1) the fixed-point inversion
against the closed-form forward model at sub-0.01 px, and (2) the full
monocular pipeline on synthetic images RENDERED with TUM1-class
distortion, gated on ATE.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from orb_slam2_commit_tpu.ops import camera as cam_ops
from orb_slam2_commit_tpu.utils.config import synthetic_config, tum_fr1_config


class TestDistortionModel:
    def test_undistort_roundtrip_tum1(self):
        """distort -> undistort over the whole image field, TUM1
        coefficients, worst case < 0.01 px."""
        cam = tum_fr1_config().camera
        u = np.linspace(0.0, cam.width - 1, 33)
        v = np.linspace(0.0, cam.height - 1, 25)
        uu, vv = np.meshgrid(u, v)
        xn = (uu - cam.cx) / cam.fx
        yn = (vv - cam.cy) / cam.fy
        x = jnp.asarray(np.stack([xn.ravel(), yn.ravel()], -1))
        xd = cam_ops.distort_normalized(x, cam)
        xu = cam_ops.undistort_normalized(xd, cam)
        err_px = np.abs(np.asarray(xu - x)) * np.array([cam.fx, cam.fy])
        assert err_px.max() < 0.01, err_px.max()

    def test_undistort_pixels_against_oracle(self):
        """undistort_pixels must agree with a brute-force numeric
        inversion (Newton on the forward model) to < 0.01 px."""
        cam = tum_fr1_config().camera
        rng = np.random.default_rng(3)
        uv_d = np.stack([
            rng.uniform(20, cam.width - 20, 200),
            rng.uniform(20, cam.height - 20, 200),
        ], -1)
        out = np.asarray(cam_ops.undistort_pixels(jnp.asarray(uv_d), cam))
        # Oracle: solve distort(x) = xd by damped Newton per point.
        xn_d = (uv_d[:, 0] - cam.cx) / cam.fx
        yn_d = (uv_d[:, 1] - cam.cy) / cam.fy
        for i in range(uv_d.shape[0]):
            x = np.array([xn_d[i], yn_d[i]])
            target = x.copy()
            for _ in range(60):
                xj = jnp.asarray(x[None, :])
                f = np.asarray(
                    cam_ops.distort_normalized(xj, cam)
                )[0] - target
                eps = 1e-7
                J = np.zeros((2, 2))
                for d in range(2):
                    xp = x.copy()
                    xp[d] += eps
                    J[:, d] = (
                        np.asarray(
                            cam_ops.distort_normalized(
                                jnp.asarray(xp[None, :]), cam
                            )
                        )[0]
                        - (f + target)
                    ) / eps
                x = x - np.linalg.solve(J, f)
                if np.abs(f).max() < 1e-12:
                    break
            ref_u = x[0] * cam.fx + cam.cx
            ref_v = x[1] * cam.fy + cam.cy
            assert abs(out[i, 0] - ref_u) < 0.01
            assert abs(out[i, 1] - ref_v) < 0.01

    def test_no_distortion_passthrough(self):
        cam = synthetic_config().camera
        uv = jnp.asarray([[10.0, 20.0], [300.0, 200.0]])
        np.testing.assert_array_equal(
            np.asarray(cam_ops.undistort_pixels(uv, cam)), np.asarray(uv)
        )


class TestDistortedPipeline:
    def test_mono_pipeline_on_distorted_images(self):
        """Full monocular System on a sequence rendered with TUM1-class
        distortion. The renderer splats landmarks at their DISTORTED pixel
        positions; the pipeline must undistort keypoints and track with
        ATE comparable to the distortion-free baseline."""
        from orb_slam2_commit_tpu.slam.system import System
        from orb_slam2_commit_tpu.slam.tracking import TrackingState
        from orb_slam2_commit_tpu.utils import synthetic
        from orb_slam2_commit_tpu.utils import trajectory as traj

        cfg = synthetic_config(width=640, height=480, n_features=1000)
        # TUM1-magnitude distortion on the synthetic pinhole (k1=0.26
        # class; positive k1 keeps undistorted coords inside the raw
        # image, matching the reference's TUM default).
        cfg = dataclasses.replace(
            cfg,
            camera=dataclasses.replace(
                cfg.camera,
                k1=0.262383, k2=-0.953104,
                p1=-0.005358, p2=0.002628, k3=1.163314,
            ),
        )
        assert cfg.camera.has_distortion
        images, poses_gt, scene = synthetic.render_sequence(
            cfg.camera, n_frames=30, n_points=400, seed=3, step=0.05
        )
        sys_ = System(cfg)
        for i in range(images.shape[0]):
            sys_.track_monocular(images[i], i / 30.0)
        assert sys_.tracking_state() == TrackingState.OK
        assert sys_.map.n_keyframes() >= 3

        est = sys_.trajectory_positions()
        lost = np.asarray([e.lost for e in sys_.tracker.trajectory], bool)
        gt = np.asarray([-R.T @ t for R, t in poses_gt])
        offset = len(poses_gt) - len(est)
        ok = ~lost
        rmse = traj.ate_rmse(est[ok], gt[offset:][ok], align_scale=True)
        span = np.linalg.norm(gt[-1] - gt[0])
        assert rmse < 0.10 * span, (rmse, span)
        sys_.shutdown()
