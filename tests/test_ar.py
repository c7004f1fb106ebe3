"""AR plane anchoring (slam/ar.py) vs known synthetic geometry."""

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam2_commit_tpu.slam import ar


def _plane_cloud(rng, n_plane=120, n_out=40, noise=0.01):
    nrm = np.array([0.2, 0.9, -0.3])
    nrm /= np.linalg.norm(nrm)
    d = -2.0
    # Points on n.x + d = 0 with small normal noise + gross outliers.
    basis = np.linalg.svd(nrm[None, :])[2][1:]          # [2, 3] orthonormal
    uv = rng.uniform(-3, 3, (n_plane, 2))
    pts_plane = uv @ basis - d * nrm + noise * rng.normal(size=(n_plane, 3))
    pts_out = rng.uniform(-4, 4, (n_out, 3)) + np.array([0, 0, 8.0])
    pts = np.concatenate([pts_plane, pts_out])
    valid = np.ones(len(pts), bool)
    return pts, valid, nrm, d


def test_ransac_recovers_plane():
    rng = np.random.default_rng(0)
    pts, valid, nrm, d = _plane_cloud(rng)
    fit = ar.fit_plane_ransac(
        jnp.asarray(pts, jnp.float32), jnp.asarray(valid), jax.random.key(1)
    )
    got_n = np.asarray(fit.normal, np.float64)
    align = abs(float(got_n @ nrm))
    assert align > 0.999, align
    assert int(fit.n_inliers) >= 100
    # Inliers are (mostly) the planar points, not the outliers.
    inl = np.asarray(fit.inliers)
    assert inl[:120].mean() > 0.9
    assert inl[120:].mean() < 0.2


def test_plane_frame_faces_camera():
    nrm = np.array([0.0, 1.0, 0.0])
    centroid = np.zeros(3)
    cam = np.array([0.0, -5.0, 0.0])    # camera on the -n side
    Twp = ar.plane_frame(nrm, centroid, cam)
    # z axis flipped toward the camera; frame orthonormal.
    assert Twp[:3, 2] @ (cam - centroid) > 0
    R = Twp[:3, :3]
    np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-12)


def test_cube_overlay_draws_in_frame():
    h, w = 120, 160
    canvas = np.zeros((h, w, 3), np.uint8)
    # Plane 5m ahead, camera at origin looking +z.
    Twp = ar.plane_frame(np.array([0, 0, 1.0]), np.array([0, 0, 5.0]),
                         np.zeros(3))
    ok = ar.draw_cube(
        canvas, np.eye(3), np.zeros(3), 100.0, 100.0, w / 2, h / 2,
        Twp, size=1.0,
    )
    assert ok
    assert (canvas.sum(axis=-1) > 0).sum() > 50      # wireframe pixels drawn
    # Behind the camera -> refuses to draw.
    canvas2 = np.zeros_like(canvas)
    Twp_back = ar.plane_frame(np.array([0, 0, 1.0]), np.array([0, 0, -5.0]),
                              np.zeros(3))
    ok2 = ar.draw_cube(canvas2, np.eye(3), np.zeros(3), 100.0, 100.0,
                       w / 2, h / 2, Twp_back, size=1.0)
    assert not ok2 and canvas2.sum() == 0


def test_anchor_on_synthetic_map_cloud():
    """ARAnchor end-to-end on a planar-fraction synthetic scene cloud."""
    from orb_slam2_commit_tpu.utils import synthetic

    rng = np.random.default_rng(2)
    scene = synthetic.make_scene(rng, n_points=300, planar_frac=0.6)
    pts = scene.points
    valid = np.ones(len(pts), bool)
    anchor = ar.ARAnchor(min_points=40, seed=3)
    assert anchor.update(pts, valid, cam_center=np.zeros(3))
    canvas = np.zeros((300, 400, 3), np.uint8)
    ok = anchor.overlay(canvas, np.eye(3), np.zeros(3), 350.0, 350.0, 200, 150)
    assert ok and canvas.sum() > 0
