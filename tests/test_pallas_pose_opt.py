"""Single-kernel Pallas pose-only LM vs the XLA route (interpret mode on
CPU). Same problem shapes as test_optim's pose tests."""

import jax.numpy as jnp
import numpy as np

from orb_slam2_commit_tpu.ops import lie
from orb_slam2_commit_tpu.optim import pose_opt
from orb_slam2_commit_tpu.optim.pallas_pose_opt import pose_optimization_pallas
from orb_slam2_commit_tpu.optim.residuals import BAObservations

FX, FY, CX, CY = 500.0, 500.0, 320.0, 240.0


def project_np(R, t, X):
    pc = X @ R.T + t
    return np.stack(
        [FX * pc[:, 0] / pc[:, 2] + CX, FY * pc[:, 1] / pc[:, 2] + CY], -1
    )


def rot_angle(Ra, Rb):
    c = (np.trace(Ra.T @ Rb) - 1) / 2
    return np.degrees(np.arccos(np.clip(c, -1, 1)))


def _problem(seed, n=160, n_outliers=0, stereo=False):
    rng = np.random.default_rng(seed)
    X = np.stack(
        [rng.uniform(-3, 3, n), rng.uniform(-2, 2, n), rng.uniform(4, 10, n)],
        -1,
    )
    w_true = rng.normal(0, 0.1, 3)
    R_true = np.asarray(lie.so3_exp(jnp.asarray(w_true)))
    t_true = rng.normal(0, 0.3, 3)
    uv = project_np(R_true, t_true, X)
    bf = 40.0 if stereo else 0.0
    pc = X @ R_true.T + t_true
    ur = uv[:, 0] - bf / pc[:, 2] if stereo else np.zeros(n)
    uvr = np.concatenate([uv, ur[:, None]], -1)
    out_idx = np.array([], int)
    if n_outliers:
        out_idx = rng.choice(n, n_outliers, replace=False)
        uvr[out_idx, :2] += rng.uniform(15, 60, (n_outliers, 2)) * rng.choice(
            [-1, 1], (n_outliers, 2)
        )
    obs = BAObservations(
        cam_idx=jnp.zeros(n, jnp.int32),
        pt_idx=jnp.arange(n, dtype=jnp.int32),
        uvr=jnp.asarray(uvr, jnp.float32),
        inv_sigma2=jnp.ones(n, jnp.float32),
        is_stereo=jnp.full(n, stereo),
        valid=jnp.ones(n, bool),
    )
    dR = np.asarray(lie.so3_exp(jnp.asarray([0.02, -0.03, 0.01])))
    R0 = dR @ R_true
    t0 = t_true + np.array([0.05, -0.04, 0.08])
    return X, R_true, t_true, obs, R0, t0, bf, out_idx


def test_matches_xla_route_clean():
    X, R_true, t_true, obs, R0, t0, bf, _ = _problem(0)
    r_ref = pose_opt.pose_optimization_jit(
        jnp.asarray(R0), jnp.asarray(t0), jnp.asarray(X), obs,
        FX, FY, CX, CY, bf,
    )
    r_pal = pose_optimization_pallas(
        jnp.asarray(R0), jnp.asarray(t0), jnp.asarray(X), obs,
        FX, FY, CX, CY, bf,
    )
    # Both must land on the true pose (f32 kernel vs f64 oracle).
    assert rot_angle(np.asarray(r_pal.R), R_true) < 0.05
    assert np.linalg.norm(np.asarray(r_pal.t) - t_true) < 2e-3
    assert rot_angle(np.asarray(r_pal.R), np.asarray(r_ref.R)) < 0.05
    assert int(r_pal.n_inliers) == int(r_ref.n_inliers)


def test_outlier_classification_agrees():
    X, R_true, t_true, obs, R0, t0, bf, out_idx = _problem(3, n_outliers=25)
    r_ref = pose_opt.pose_optimization_jit(
        jnp.asarray(R0), jnp.asarray(t0), jnp.asarray(X), obs,
        FX, FY, CX, CY, bf,
    )
    r_pal = pose_optimization_pallas(
        jnp.asarray(R0), jnp.asarray(t0), jnp.asarray(X), obs,
        FX, FY, CX, CY, bf,
    )
    inl_pal = np.asarray(r_pal.inliers)
    # All injected outliers rejected; pose recovered despite them.
    assert not inl_pal[out_idx].any()
    assert rot_angle(np.asarray(r_pal.R), R_true) < 0.1
    assert np.linalg.norm(np.asarray(r_pal.t) - t_true) < 5e-3
    # Classification agrees with the XLA route up to boundary cases.
    inl_ref = np.asarray(r_ref.inliers)
    assert (inl_pal != inl_ref).sum() <= 3


def test_stereo_rows():
    X, R_true, t_true, obs, R0, t0, bf, _ = _problem(7, stereo=True)
    r_pal = pose_optimization_pallas(
        jnp.asarray(R0), jnp.asarray(t0), jnp.asarray(X), obs,
        FX, FY, CX, CY, bf,
    )
    assert rot_angle(np.asarray(r_pal.R), R_true) < 0.05
    assert np.linalg.norm(np.asarray(r_pal.t) - t_true) < 2e-3
    assert int(r_pal.n_inliers) >= obs.valid.shape[0] - 2


def test_masked_rows_ignored():
    X, R_true, t_true, obs, R0, t0, bf, _ = _problem(11)
    valid = np.asarray(obs.valid).copy()
    valid[100:] = False
    # Corrupt the masked rows: they must not affect the solution.
    uvr = np.asarray(obs.uvr).copy()
    uvr[100:] = 1e6
    obs = obs._replace(valid=jnp.asarray(valid), uvr=jnp.asarray(uvr))
    r_pal = pose_optimization_pallas(
        jnp.asarray(R0), jnp.asarray(t0), jnp.asarray(X), obs,
        FX, FY, CX, CY, bf,
    )
    assert rot_angle(np.asarray(r_pal.R), R_true) < 0.05
    assert not np.asarray(r_pal.inliers)[100:].any()
