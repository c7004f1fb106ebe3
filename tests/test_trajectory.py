"""Trajectory evaluation oracles: RPE against hand-computed motions."""

import numpy as np

from orb_slam2_commit_tpu.utils import trajectory as traj


def _rot_z(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])


def _make_traj(n, step=0.1, yaw=0.02, seed=0):
    """Tcw poses of a forward-moving, slowly yawing camera."""
    poses = []
    R_wc = np.eye(3)
    p = np.zeros(3)
    for i in range(n):
        R_wc = _rot_z(yaw) @ R_wc
        p = p + R_wc @ np.array([0, 0, step])
        R_cw = R_wc.T
        t_cw = -R_cw @ p
        poses.append((R_cw, t_cw))
    return poses


def test_rpe_identical_trajectories_is_zero():
    poses = _make_traj(30)
    t_rmse, r_rmse = traj.rpe_stats(poses, poses, delta=1)
    assert t_rmse < 1e-12
    assert r_rmse < 1e-6


def test_rpe_constant_translation_drift():
    gt = _make_traj(40, step=0.1, yaw=0.0)
    # Estimated trajectory drifts by a constant extra 1 cm forward per
    # frame: every per-frame relative motion is off by exactly 0.01.
    est = _make_traj(40, step=0.11, yaw=0.0)
    t_rmse, r_rmse = traj.rpe_stats(est, gt, delta=1)
    np.testing.assert_allclose(t_rmse, 0.01, rtol=1e-9)
    assert r_rmse < 1e-9
    # Over delta=5 the drift accumulates to 5 cm per interval.
    t5, _ = traj.rpe_stats(est, gt, delta=5)
    np.testing.assert_allclose(t5, 0.05, rtol=1e-9)


def test_rpe_rotation_error():
    gt = _make_traj(25, step=0.1, yaw=0.00)
    est = _make_traj(25, step=0.1, yaw=0.01)
    t_rmse, r_rmse = traj.rpe_stats(est, gt, delta=1)
    np.testing.assert_allclose(r_rmse, 0.01, rtol=1e-6)


def test_rpe_invariant_to_global_transform():
    gt = _make_traj(30, step=0.1, yaw=0.03, seed=1)
    # Apply one global rigid transform to the whole estimated trajectory:
    # relative motions are unchanged, so RPE must be ~zero.
    Rg = _rot_z(1.1)
    tg = np.array([3.0, -2.0, 0.5])
    est = []
    for R_cw, t_cw in gt:
        # Twc' = G @ Twc with G = (Rg, tg)  =>  Tcw' = Tcw @ G^-1.
        R2 = R_cw @ Rg.T
        t2 = t_cw - R2 @ tg
        est.append((R2, t2))
    t_rmse, r_rmse = traj.rpe_stats(est, gt, delta=3)
    assert t_rmse < 1e-12
    assert r_rmse < 1e-6
