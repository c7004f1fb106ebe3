"""EPnP + RANSAC: absolute pose from 3D-2D correspondences.

TPU-native replacement for PnPsolver (reference: src/PnPsolver.cc), used by
relocalization (src/Tracking.cc:1653-1884). The reference runs sequential
RANSAC rounds each solving EPnP (Lepetit et al. 2009) on 4 points; here all
rounds run as one vmapped batch and each sample evaluates the three
beta-approximation cases (find_betas_approx_{1,2,3}, src/PnPsolver.cc:
746-837) with Gauss-Newton refinement (:919-937), keeping the best by
inlier count.

EPnP per sample:
  1. control points = centroid + PCA axes        (:420-460)
  2. barycentric coordinates per 3D point        (:462-490)
  3. M [2n, 12]; 4 smallest eigenvectors of M^T M (:492-533)
  4. betas from the distance-constraint system L beta = rho (3 cases + GN)
  5. R, t by Horn alignment of world/camera control points (:640-702)
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


def _control_points(X: jnp.ndarray) -> jnp.ndarray:
    """[4, 3] control points: centroid + principal axes scaled by sqrt of
    eigenvalues (oracle: choose_control_points, src/PnPsolver.cc:420-460)."""
    n = X.shape[0]
    c0 = jnp.mean(X, axis=0)
    Xc = X - c0
    cov = Xc.T @ Xc / n
    w, V = jnp.linalg.eigh(cov)          # ascending eigenvalues
    k = jnp.sqrt(jnp.maximum(w, 1e-12))
    # Order descending like the reference's OpenCV eigen output.
    cps = jnp.stack(
        [
            c0,
            c0 + k[2] * V[:, 2],
            c0 + k[1] * V[:, 1],
            c0 + k[0] * V[:, 0],
        ]
    )
    return cps


def _barycentric(X: jnp.ndarray, cws: jnp.ndarray) -> jnp.ndarray:
    """[n, 4] barycentric coords w.r.t. control points
    (oracle: compute_barycentric_coordinates, src/PnPsolver.cc:462-490)."""
    CC = (cws[1:] - cws[0]).T            # [3, 3]
    CC_inv = jnp.linalg.inv(CC + 1e-12 * jnp.eye(3, dtype=X.dtype))
    a = (X - cws[0]) @ CC_inv.T          # [n, 3]
    a0 = 1.0 - jnp.sum(a, axis=1, keepdims=True)
    return jnp.concatenate([a0, a], axis=1)


def _build_M(alphas: jnp.ndarray, uv: jnp.ndarray, fx, fy, cx, cy):
    """[2n, 12] (oracle: fill_M, src/PnPsolver.cc:492-507)."""
    n = alphas.shape[0]
    u, v = uv[:, 0], uv[:, 1]
    # EPnP column layout: for control point j the unknowns are its 3 camera
    # coords, giving per-observation rows (a fx, 0, a(cx-u)) and
    # (0, a fy, a(cy-v)). Build [n, 4, 3] then reshape.
    Mu = jnp.stack(
        [alphas * fx, jnp.zeros_like(alphas), alphas * (cx - u)[:, None]],
        axis=-1,
    )  # [n, 4, 3]
    Mv = jnp.stack(
        [jnp.zeros_like(alphas), alphas * fy, alphas * (cy - v)[:, None]],
        axis=-1,
    )
    M = jnp.concatenate([Mu.reshape(n, 12), Mv.reshape(n, 12)], axis=0)
    return M


def _rho(cws: jnp.ndarray) -> jnp.ndarray:
    """[6] squared distances between world control points (compute_rho)."""
    pairs = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    return jnp.stack(
        [jnp.sum((cws[a] - cws[b]) ** 2) for a, b in pairs]
    )


def _L6x10(V: jnp.ndarray) -> jnp.ndarray:
    """[6, 10] distance-constraint matrix from the 4 null vectors
    (oracle: compute_L_6x10, src/PnPsolver.cc:839-879).

    V: [4, 4, 3] — V[k, j] = 3-vector of control point j in eigenvector k.
    beta ordering: [b11, b12, b22, b13, b23, b33, b14, b24, b34, b44].
    """
    pairs = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    rows = []
    for (a, b) in pairs:
        dv = V[:, a, :] - V[:, b, :]       # [4, 3]
        d = {k: dv[k] for k in range(4)}
        rows.append(
            jnp.stack(
                [
                    jnp.dot(d[0], d[0]),
                    2 * jnp.dot(d[0], d[1]),
                    jnp.dot(d[1], d[1]),
                    2 * jnp.dot(d[0], d[2]),
                    2 * jnp.dot(d[1], d[2]),
                    jnp.dot(d[2], d[2]),
                    2 * jnp.dot(d[0], d[3]),
                    2 * jnp.dot(d[1], d[3]),
                    2 * jnp.dot(d[2], d[3]),
                    jnp.dot(d[3], d[3]),
                ]
            )
        )
    return jnp.stack(rows)


def _lstsq(A, b):
    """Small least squares via normal equations (safe for 6xk)."""
    AtA = A.T @ A + 1e-9 * jnp.eye(A.shape[1], dtype=A.dtype)
    return jnp.linalg.solve(AtA, A.T @ b)


def _betas_case1(L, rho):
    """betas ~ [b1^2, b1 b2, b1 b3, b1 b4] columns 0, 1, 3, 6."""
    A = L[:, jnp.array([0, 1, 3, 6])]
    x = _lstsq(A, rho)
    b1 = jnp.sqrt(jnp.abs(x[0]))
    b = jnp.stack(
        [b1, x[1] / jnp.where(jnp.abs(b1) > 1e-12, b1, 1e-12),
         x[2] / jnp.where(jnp.abs(b1) > 1e-12, b1, 1e-12),
         x[3] / jnp.where(jnp.abs(b1) > 1e-12, b1, 1e-12)]
    )
    return b


def _betas_case2(L, rho):
    """columns [b11, b12, b22] -> betas (b3 = b4 = 0)."""
    A = L[:, jnp.array([0, 1, 2])]
    x = _lstsq(A, rho)
    b1 = jnp.sqrt(jnp.abs(x[0]))
    b2 = jnp.sqrt(jnp.abs(x[2])) * jnp.where(x[1] < 0, -1.0, 1.0)
    b2 = jnp.where(x[0] < 0, -b2, b2)
    return jnp.stack([b1, b2, jnp.zeros_like(b1), jnp.zeros_like(b1)])


def _betas_case3(L, rho):
    """columns [b11, b12, b22, b13, b23] (b4 = 0)."""
    A = L[:, jnp.array([0, 1, 2, 3, 4])]
    x = _lstsq(A, rho)
    b1 = jnp.sqrt(jnp.abs(x[0]))
    b2 = jnp.sqrt(jnp.abs(x[2])) * jnp.where(x[1] < 0, -1.0, 1.0)
    b2 = jnp.where(x[0] < 0, -b2, b2)
    b3 = x[3] / jnp.where(b1 > 1e-12, b1, 1e-12)
    return jnp.stack([b1, b2, b3, jnp.zeros_like(b1)])


def _gauss_newton_betas(L, rho, betas, iters: int = 5):
    """Refine betas on ||L b10(beta) - rho||^2 (oracle: gauss_newton,
    src/PnPsolver.cc:919-937)."""

    def b10_of(b):
        b1, b2, b3, b4 = b[0], b[1], b[2], b[3]
        return jnp.stack(
            [b1 * b1, b1 * b2, b2 * b2, b1 * b3, b2 * b3, b3 * b3,
             b1 * b4, b2 * b4, b3 * b4, b4 * b4]
        )

    def body(_, b):
        r = L @ b10_of(b) - rho
        J = jax.jacobian(lambda bb: L @ b10_of(bb) - rho)(b)
        JtJ = J.T @ J + 1e-9 * jnp.eye(4, dtype=b.dtype)
        return b - jnp.linalg.solve(JtJ, J.T @ r)

    return jax.lax.fori_loop(0, iters, body, betas)


def _horn_rt(pw: jnp.ndarray, pc: jnp.ndarray):
    """Rigid alignment camera <- world from paired points
    (oracle: estimate_R_and_t, src/PnPsolver.cc:640-702)."""
    cw = jnp.mean(pw, axis=0)
    cc = jnp.mean(pc, axis=0)
    H = (pc - cc).T @ (pw - cw)
    U, _, Vt = jnp.linalg.svd(H)
    d = jnp.linalg.det(U @ Vt)
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0], H.dtype).at[2].set(d))
    R = U @ D @ Vt
    t = cc - R @ cw
    return R, t


def epnp_solve(
    X: jnp.ndarray, uv: jnp.ndarray, fx, fy, cx, cy
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """EPnP on n >= 4 correspondences -> best (R, t) among the 3 beta cases.

    X [n, 3] world points, uv [n, 2] pixels.
    """
    n = X.shape[0]
    cws = _control_points(X)
    alphas = _barycentric(X, cws)
    M = _build_M(alphas, uv, fx, fy, cx, cy)
    MtM = M.T @ M
    _, V = jnp.linalg.eigh(MtM)
    # 4 smallest eigenvectors, each reshaped to 4 control-point 3-vectors.
    Vk = V[:, :4].T.reshape(4, 4, 3)
    L = _L6x10(Vk)
    rho = _rho(cws)

    def pose_from_betas(betas):
        betas = _gauss_newton_betas(L, rho, betas)
        ccs = jnp.einsum("k,kjd->jd", betas, Vk)   # camera-frame ctrl points
        pc = alphas @ ccs                          # [n, 3] camera points
        # Enforce positive depth (sign ambiguity of the eigenvector scale).
        flip = jnp.sum(pc[:, 2] < 0) > n // 2
        pc = jnp.where(flip, -pc, pc)
        R, t = _horn_rt(X, pc)
        proj = (X @ R.T + t)
        z = jnp.where(jnp.abs(proj[:, 2]) > 1e-9, proj[:, 2], 1e-9)
        u = fx * proj[:, 0] / z + cx
        v = fy * proj[:, 1] / z + cy
        err = jnp.mean((u - uv[:, 0]) ** 2 + (v - uv[:, 1]) ** 2)
        return R, t, err

    R1, t1, e1 = pose_from_betas(_betas_case1(L, rho))
    R2, t2, e2 = pose_from_betas(_betas_case2(L, rho))
    R3, t3, e3 = pose_from_betas(_betas_case3(L, rho))
    errs = jnp.stack([e1, e2, e3])
    Rs = jnp.stack([R1, R2, R3])
    ts = jnp.stack([t1, t2, t3])
    best = jnp.argmin(errs)
    return Rs[best], ts[best]


class PnPResult(NamedTuple):
    ok: jnp.ndarray
    R: jnp.ndarray
    t: jnp.ndarray
    inliers: jnp.ndarray   # [n] bool
    n_inliers: jnp.ndarray


def epnp_ransac(
    key: jnp.ndarray,
    X: jnp.ndarray,            # [n, 3] world points (padded)
    uv: jnp.ndarray,           # [n, 2]
    valid: jnp.ndarray,        # [n]
    sigma2: jnp.ndarray,       # [n] per-point sigma^2 (octave-scaled)
    fx: float, fy: float, cx: float, cy: float,
    n_iters: int = 128,
    sample_size: int = 4,
    min_inliers: int = 10,
    chi2_th: float = 5.991,
) -> PnPResult:
    """Batched EPnP RANSAC (oracle: PnPsolver::iterate + CheckInliers,
    src/PnPsolver.cc:188-301,352-384: per-point threshold chi2 * sigma2,
    minimal sets of 4, refine on the best consensus)."""
    n = X.shape[0]
    p = valid.astype(jnp.float32)
    p = p / jnp.maximum(jnp.sum(p), 1.0)
    keys = jax.random.split(key, n_iters)

    def count_inliers(R, t):
        pc = X @ R.T + t
        z = jnp.where(jnp.abs(pc[:, 2]) > 1e-9, pc[:, 2], 1e-9)
        u = fx * pc[:, 0] / z + cx
        v = fy * pc[:, 1] / z + cy
        err2 = (u - uv[:, 0]) ** 2 + (v - uv[:, 1]) ** 2
        inl = valid & (pc[:, 2] > 0) & (err2 < chi2_th * sigma2)
        return inl

    def one_round(k):
        idx = jax.random.choice(k, n, shape=(sample_size,), replace=False, p=p)
        R, t = epnp_solve(X[idx], uv[idx], fx, fy, cx, cy)
        inl = count_inliers(R, t)
        return R, t, jnp.sum(inl)

    Rs, ts, counts = jax.vmap(one_round)(keys)
    best = jnp.argmax(counts)
    R_best, t_best = Rs[best], ts[best]

    # Refine: EPnP on the full consensus set (oracle: Refine, :303-349).
    inliers = count_inliers(R_best, t_best)
    ok = jnp.sum(inliers) >= min_inliers
    return PnPResult(
        ok=ok, R=R_best, t=t_best, inliers=inliers,
        n_inliers=jnp.sum(inliers),
    )


epnp_ransac_jit = jax.jit(
    epnp_ransac,
    static_argnames=(
        "fx", "fy", "cx", "cy", "n_iters", "sample_size", "min_inliers",
        "chi2_th",
    ),
)


def epnp_ransac_many(
    keys: jnp.ndarray,         # [C] one RNG key per candidate
    X: jnp.ndarray,            # [C, n, 3] per-candidate world points
    uv: jnp.ndarray,           # [n, 2] shared frame pixels
    valid: jnp.ndarray,        # [C, n] per-candidate 2D-3D match mask
    sigma2: jnp.ndarray,       # [n]
    fx: float, fy: float, cx: float, cy: float,
    n_iters: int = 128,
    sample_size: int = 4,
    min_inliers: int = 10,
    chi2_th: float = 5.991,
) -> PnPResult:
    """epnp_ransac vmapped over relocalization candidates: ONE solver
    dispatch for the whole candidate set (the reference iterates
    per-candidate PnPsolver RANSAC on the host,
    src/Tracking.cc:1729-1762). Leaves of the result carry a leading
    [C] axis."""
    return jax.vmap(
        lambda k, Xc, vc: epnp_ransac(
            k, Xc, uv, vc, sigma2, fx, fy, cx, cy,
            n_iters, sample_size, min_inliers, chi2_th,
        )
    )(keys, X, valid)


epnp_ransac_many_jit = jax.jit(
    epnp_ransac_many,
    static_argnames=(
        "fx", "fy", "cx", "cy", "n_iters", "sample_size", "min_inliers",
        "chi2_th",
    ),
)
