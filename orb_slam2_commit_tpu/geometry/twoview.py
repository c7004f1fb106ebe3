"""Monocular two-view initialization: batched H/F RANSAC + reconstruction.

TPU-native replacement for the whole Initializer (reference:
src/Initializer.cc). The reference scores homography and fundamental in two
parallel std::threads over 200 sequential RANSAC rounds; here all 200
rounds of BOTH models run as one vmapped batch (SURVEY.md §2.4 P6): sample
-> normalized DLT -> score every correspondence, then argmax. Model choice
and reconstruction follow the reference's semantics:
  RH = SH / (SH + SF) > 0.40 -> homography (src/Initializer.cc:156-164)
  F -> E -> 4 (R, t) hypotheses (:648-763, DecomposeE :1317-1345)
  H -> Faugeras 8 hypotheses (:776-983)
chosen by CheckRT-style triangulation gates (:1134-1303).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from orb_slam2_commit_tpu.geometry import triangulation as tri

N_RANSAC = 200
SAMPLE_SIZE = 8
CHI2_H = 5.991   # chi2(2dof, 0.05) — homography transfer error
CHI2_F = 3.841   # chi2(1dof, 0.05) — epipolar distance
TH_SCORE = 5.991


def normalize_points(xy: jnp.ndarray, valid: jnp.ndarray):
    """Mean/mean-abs-dev normalization (oracle: src/Initializer.cc:1076-1131).

    Returns (normalized [N, 2], T [3, 3]) with T mapping raw -> normalized.
    """
    w = valid.astype(xy.dtype)
    n = jnp.maximum(jnp.sum(w), 1.0)
    mean = jnp.sum(xy * w[:, None], axis=0) / n
    d = jnp.abs(xy - mean) * w[:, None]
    mean_dev = jnp.sum(d, axis=0) / n
    s = 1.0 / jnp.maximum(mean_dev, 1e-9)
    xn = (xy - mean) * s
    T = jnp.array(
        [
            [s[0], 0.0, -mean[0] * s[0]],
            [0.0, s[1], -mean[1] * s[1]],
            [0.0, 0.0, 1.0],
        ],
        dtype=xy.dtype,
    )
    return xn, T


def _smallest_right_singular(A: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Null vector of A [m, dim] via eigh of A^T A (batched-friendly)."""
    _, V = jnp.linalg.eigh(A.T @ A)
    return V[:, 0]


def compute_h21(
    x1: jnp.ndarray, x2: jnp.ndarray, weight: jnp.ndarray | None = None
) -> jnp.ndarray:
    """DLT homography from >= 4 normalized correspondences, optionally
    0/1-weighted (oracle: src/Initializer.cc:315-360). x1 -> x2."""
    u1, v1 = x1[:, 0], x1[:, 1]
    u2, v2 = x2[:, 0], x2[:, 1]
    z = jnp.zeros_like(u1)
    o = jnp.ones_like(u1)
    rows_a = jnp.stack([z, z, z, -u1, -v1, -o, v2 * u1, v2 * v1, v2], axis=1)
    rows_b = jnp.stack([u1, v1, o, z, z, z, -u2 * u1, -u2 * v1, -u2], axis=1)
    A = jnp.concatenate([rows_a, rows_b], axis=0)
    if weight is not None:
        w = jnp.concatenate([weight, weight])[:, None].astype(A.dtype)
        A = A * w
    h = _smallest_right_singular(A, 9)
    return h.reshape(3, 3)


def compute_f21(
    x1: jnp.ndarray, x2: jnp.ndarray, weight: jnp.ndarray | None = None
) -> jnp.ndarray:
    """8-point fundamental with rank-2 projection, optionally 0/1-weighted
    (oracle: src/Initializer.cc:374-421). x2^T F x1 = 0."""
    u1, v1 = x1[:, 0], x1[:, 1]
    u2, v2 = x2[:, 0], x2[:, 1]
    o = jnp.ones_like(u1)
    A = jnp.stack(
        [u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, o], axis=1
    )
    if weight is not None:
        A = A * weight[:, None].astype(A.dtype)
    f = _smallest_right_singular(A, 9)
    F = f.reshape(3, 3)
    U, S, Vt = jnp.linalg.svd(F)
    S = S.at[2].set(0.0)
    return (U * S[None, :]) @ Vt


def score_homography(
    H21: jnp.ndarray,
    xy1: jnp.ndarray,
    xy2: jnp.ndarray,
    valid: jnp.ndarray,
    sigma: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric transfer error score (oracle: CheckHomography,
    src/Initializer.cc:424-533). Returns (score, inlier_mask)."""
    inv_sigma2 = 1.0 / (sigma * sigma)
    H12 = jnp.linalg.inv(H21)

    def transfer(H, a, b):
        ah = jnp.concatenate([a, jnp.ones_like(a[:, :1])], axis=1)
        p = ah @ H.T
        w = jnp.where(jnp.abs(p[:, 2]) > 1e-12, p[:, 2], 1e-12)
        d = p[:, :2] / w[:, None] - b
        return jnp.sum(d * d, axis=1)

    chi2_12 = transfer(H12, xy2, xy1) * inv_sigma2
    chi2_21 = transfer(H21, xy1, xy2) * inv_sigma2
    in1 = chi2_12 <= CHI2_H
    in2 = chi2_21 <= CHI2_H
    score = jnp.sum(
        jnp.where(valid & in1, CHI2_H - chi2_12, 0.0)
        + jnp.where(valid & in2, CHI2_H - chi2_21, 0.0)
    )
    return score, valid & in1 & in2


def score_fundamental(
    F21: jnp.ndarray,
    xy1: jnp.ndarray,
    xy2: jnp.ndarray,
    valid: jnp.ndarray,
    sigma: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Epipolar-distance score (oracle: CheckFundamental,
    src/Initializer.cc:536-636)."""
    inv_sigma2 = 1.0 / (sigma * sigma)

    def line_dist_sq(F, a, b):
        # Line in image b: l = F @ [a; 1].
        ah = jnp.concatenate([a, jnp.ones_like(a[:, :1])], axis=1)
        l = ah @ F.T
        num = jnp.sum(l[:, :2] * b, axis=1) + l[:, 2]
        den = jnp.maximum(l[:, 0] ** 2 + l[:, 1] ** 2, 1e-12)
        return num * num / den

    chi2_1 = line_dist_sq(F21, xy1, xy2) * inv_sigma2          # dist of x2 to F x1
    chi2_2 = line_dist_sq(F21.T, xy2, xy1) * inv_sigma2        # dist of x1 to F^T x2
    in1 = chi2_1 <= CHI2_F
    in2 = chi2_2 <= CHI2_F
    score = jnp.sum(
        jnp.where(valid & in1, TH_SCORE - chi2_1, 0.0)
        + jnp.where(valid & in2, TH_SCORE - chi2_2, 0.0)
    )
    return score, valid & in1 & in2


def _ransac_samples(key: jnp.ndarray, valid: jnp.ndarray, n_iters: int):
    """[n_iters, 8] indices drawn from valid matches (with high probability
    distinct within a sample; duplicates only degrade that sample)."""
    n = valid.shape[0]
    p = valid.astype(jnp.float32)
    p = p / jnp.maximum(jnp.sum(p), 1.0)

    def one(k):
        return jax.random.choice(k, n, shape=(SAMPLE_SIZE,), replace=False, p=p)

    keys = jax.random.split(key, n_iters)
    return jax.vmap(one)(keys)


class TwoViewModels(NamedTuple):
    H21: jnp.ndarray
    F21: jnp.ndarray
    score_h: jnp.ndarray
    score_f: jnp.ndarray
    inliers_h: jnp.ndarray
    inliers_f: jnp.ndarray


def find_models(
    key: jnp.ndarray,
    xy1: jnp.ndarray,
    xy2: jnp.ndarray,
    valid: jnp.ndarray,
    sigma: float = 1.0,
    n_iters: int = N_RANSAC,
) -> TwoViewModels:
    """Run all RANSAC rounds for H and F as one vmapped batch and keep the
    best of each (oracle: FindHomography/FindFundamental,
    src/Initializer.cc:170-294, thread pair :144-152)."""
    xn1, T1 = normalize_points(xy1, valid)
    xn2, T2 = normalize_points(xy2, valid)
    T2inv = jnp.linalg.inv(T2)

    samples = _ransac_samples(key, valid, n_iters)  # [n_iters, 8]

    def per_iter(idx):
        s1 = xn1[idx]
        s2 = xn2[idx]
        Hn = compute_h21(s1, s2)
        Fn = compute_f21(s1, s2)
        H21 = T2inv @ Hn @ T1
        F21 = T2.T @ Fn @ T1
        sh, _ = score_homography(H21, xy1, xy2, valid, sigma)
        sf, _ = score_fundamental(F21, xy1, xy2, valid, sigma)
        return H21, F21, sh, sf

    Hs, Fs, shs, sfs = jax.vmap(per_iter)(samples)
    bh = jnp.argmax(shs)
    bf = jnp.argmax(sfs)
    H_best = Hs[bh]
    F_best = Fs[bf]
    _, inl_h0 = score_homography(H_best, xy1, xy2, valid, sigma)
    _, inl_f0 = score_fundamental(F_best, xy1, xy2, valid, sigma)

    # Refit on the consensus set (one extra weighted DLT; improves on the
    # reference, which keeps the raw 8-point model of the best round).
    Hn = compute_h21(xn1, xn2, weight=inl_h0)
    Fn = compute_f21(xn1, xn2, weight=inl_f0)
    H_refit = T2inv @ Hn @ T1
    F_refit = T2.T @ Fn @ T1
    sh_refit, _ = score_homography(H_refit, xy1, xy2, valid, sigma)
    sf_refit, _ = score_fundamental(F_refit, xy1, xy2, valid, sigma)
    # Keep the refit only if it scores at least as well.
    H21 = jnp.where(sh_refit >= shs[bh], H_refit, H_best)
    F21 = jnp.where(sf_refit >= sfs[bf], F_refit, F_best)
    H21 = H21 / jnp.where(jnp.abs(H21[2, 2]) > 1e-12, H21[2, 2], 1.0)

    score_h, inl_h = score_homography(H21, xy1, xy2, valid, sigma)
    score_f, inl_f = score_fundamental(F21, xy1, xy2, valid, sigma)
    return TwoViewModels(H21, F21, score_h, score_f, inl_h, inl_f)


# ---------------------------------------------------------------------------
# Reconstruction
# ---------------------------------------------------------------------------


def decompose_e(E: jnp.ndarray):
    """E -> (R1, R2, t) with |t| = 1 (oracle: DecomposeE,
    src/Initializer.cc:1317-1345)."""
    U, _, Vt = jnp.linalg.svd(E)
    t = U[:, 2]
    t = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    R1 = U @ W @ Vt
    R1 = jnp.where(jnp.linalg.det(R1) < 0, -R1, R1)
    R2 = U @ W.T @ Vt
    R2 = jnp.where(jnp.linalg.det(R2) < 0, -R2, R2)
    return R1, R2, t


def check_rt(
    R: jnp.ndarray,
    t: jnp.ndarray,
    xy1: jnp.ndarray,
    xy2: jnp.ndarray,
    valid: jnp.ndarray,
    K: jnp.ndarray,
    sigma2: float = 1.0,
):
    """Triangulate under (R, t) and count points passing cheirality /
    parallax / reprojection gates (oracle: CheckRT,
    src/Initializer.cc:1134-1303).

    Returns (n_good, parallax_deg, points [N, 3], good_mask [N]).
    """
    th2 = 4.0 * sigma2
    eye = jnp.eye(3, dtype=R.dtype)
    zero = jnp.zeros(3, dtype=R.dtype)
    P1 = tri.projection_matrix(K, eye, zero)
    P2 = tri.projection_matrix(K, R, t)
    pts = tri.triangulate_dlt(xy1, xy2, P1, P2)

    finite = jnp.all(jnp.isfinite(pts), axis=1)
    c1 = zero
    c2 = -R.T @ t
    cosp = tri.cos_parallax(pts, c1, c2)
    z1 = pts[:, 2]
    z2 = tri.depths(pts, R, t)
    e1 = tri.reprojection_error_sq(pts, xy1, P1)
    e2 = tri.reprojection_error_sq(pts, xy2, P2)

    good = (
        valid
        & finite
        & (cosp < 0.99998)
        & (z1 > 0)
        & (z2 > 0)
        & (e1 < th2)
        & (e2 < th2)
    )
    n_good = jnp.sum(good)

    # Parallax statistic: the reference sorts the good cosines ascending and
    # takes index min(50, n_good-1) — the 51st-largest parallax
    # (src/Initializer.cc:1284-1295). Pad invalid with +2 so they sort last.
    cosp_good = jnp.where(good, cosp, 2.0)
    sorted_asc = jnp.sort(cosp_good)
    take = jnp.minimum(n_good, 50) - 1
    cos_sel = jnp.where(take >= 0, sorted_asc[jnp.maximum(take, 0)], 1.0)
    parallax_deg = jnp.degrees(jnp.arccos(jnp.clip(cos_sel, -1.0, 1.0)))
    parallax_deg = jnp.where(n_good > 0, parallax_deg, 0.0)
    return n_good, parallax_deg, pts, good


def reconstruct_f(
    F21: jnp.ndarray,
    xy1: jnp.ndarray,
    xy2: jnp.ndarray,
    inliers: jnp.ndarray,
    K: jnp.ndarray,
    sigma: float = 1.0,
    min_parallax: float = 1.0,
    min_triangulated: int = 50,
):
    """F -> E -> best of 4 (R, t) hypotheses (oracle: ReconstructF,
    src/Initializer.cc:648-763). Returns (ok, R, t, points, good_mask)."""
    E = K.T @ F21 @ K
    R1, R2, tu = decompose_e(E)
    hyps_R = jnp.stack([R1, R1, R2, R2])
    hyps_t = jnp.stack([tu, -tu, tu, -tu])

    n_good, parallax, pts, good = jax.vmap(
        lambda R, t: check_rt(R, t, xy1, xy2, inliers, K, sigma * sigma)
    )(hyps_R, hyps_t)

    n_max = jnp.max(n_good)
    n_inliers = jnp.sum(inliers)
    n_min_good = jnp.maximum(
        (0.9 * n_inliers).astype(jnp.int32), min_triangulated
    )
    n_similar = jnp.sum(n_good > 0.7 * n_max)
    best = jnp.argmax(n_good)
    ok = (
        (n_max >= n_min_good)
        & (n_similar == 1)
        & (parallax[best] > min_parallax)
    )
    return ok, hyps_R[best], hyps_t[best], pts[best], good[best]


def _faugeras_hypotheses(A: jnp.ndarray):
    """8 (R', t', n') hypotheses from the normalized homography A = K^-1 H K
    (oracle: ReconstructH, src/Initializer.cc:776-983, Faugeras-Lustman).

    Returns (R [8, 3, 3], t [8, 3], degenerate: bool scalar).
    """
    U, d, Vt = jnp.linalg.svd(A)
    s = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    d1, d2, d3 = d[0], d[1], d[2]
    degenerate = (d1 / jnp.maximum(d2, 1e-12) < 1.00001) | (
        d2 / jnp.maximum(d3, 1e-12) < 1.00001
    )

    aux1 = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) / (d1 * d1 - d3 * d3), 0.0))
    aux3 = jnp.sqrt(jnp.maximum((d2 * d2 - d3 * d3) / (d1 * d1 - d3 * d3), 0.0))
    x1_signs = jnp.array([1.0, 1.0, -1.0, -1.0], A.dtype)
    x3_signs = jnp.array([1.0, -1.0, 1.0, -1.0], A.dtype)
    x1 = aux1 * x1_signs
    x3 = aux3 * x3_signs

    # Case d' = +d2.
    aux_stheta = jnp.sqrt(
        jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)
    ) / ((d1 + d3) * d2)
    ctheta = (d2 * d2 + d1 * d3) / ((d1 + d3) * d2)
    stheta = aux_stheta * x1_signs * x3_signs

    def case_pos(i):
        Rp = jnp.array(
            [
                [ctheta, 0.0, -stheta[i]],
                [0.0, 1.0, 0.0],
                [stheta[i], 0.0, ctheta],
            ],
            A.dtype,
        )
        R = s * U @ Rp @ Vt
        tp = (d1 - d3) * jnp.array([x1[i], 0.0, -x3[i]], A.dtype)
        t = U @ tp
        return R, t / jnp.maximum(jnp.linalg.norm(t), 1e-12)

    # Case d' = -d2.
    aux_sphi = jnp.sqrt(
        jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)
    ) / jnp.where(jnp.abs(d1 - d3) > 1e-12, (d1 - d3) * d2, 1e-12)
    cphi = (d1 * d3 - d2 * d2) / jnp.where(
        jnp.abs(d1 - d3) > 1e-12, (d1 - d3) * d2, 1e-12
    )
    sphi = aux_sphi * x1_signs * x3_signs

    def case_neg(i):
        Rp = jnp.array(
            [
                [cphi, 0.0, sphi[i]],
                [0.0, -1.0, 0.0],
                [sphi[i], 0.0, -cphi],
            ],
            A.dtype,
        )
        R = s * U @ Rp @ Vt
        tp = (d1 + d3) * jnp.array([x1[i], 0.0, x3[i]], A.dtype)
        t = U @ tp
        return R, t / jnp.maximum(jnp.linalg.norm(t), 1e-12)

    Rs, ts = [], []
    for i in range(4):
        R, t = case_pos(i)
        Rs.append(R)
        ts.append(t)
    for i in range(4):
        R, t = case_neg(i)
        Rs.append(R)
        ts.append(t)
    return jnp.stack(Rs), jnp.stack(ts), degenerate


def reconstruct_h(
    H21: jnp.ndarray,
    xy1: jnp.ndarray,
    xy2: jnp.ndarray,
    inliers: jnp.ndarray,
    K: jnp.ndarray,
    sigma: float = 1.0,
    min_parallax: float = 1.0,
    min_triangulated: int = 50,
):
    """H -> best of 8 Faugeras hypotheses (oracle: ReconstructH,
    src/Initializer.cc:776-983). Returns (ok, R, t, points, good_mask)."""
    A = jnp.linalg.inv(K) @ H21 @ K
    hyps_R, hyps_t, degenerate = _faugeras_hypotheses(A)

    n_good, parallax, pts, good = jax.vmap(
        lambda R, t: check_rt(R, t, xy1, xy2, inliers, K, sigma * sigma)
    )(hyps_R, hyps_t)

    order = jnp.argsort(-n_good)
    best = order[0]
    second_best_good = n_good[order[1]]
    best_good = n_good[best]
    n_inliers = jnp.sum(inliers)
    ok = (
        ~degenerate
        & (second_best_good < 0.75 * best_good)
        & (parallax[best] >= min_parallax)
        & (best_good > min_triangulated)
        & (best_good > 0.9 * n_inliers)
    )
    return ok, hyps_R[best], hyps_t[best], pts[best], good[best]


class TwoViewResult(NamedTuple):
    ok: jnp.ndarray          # bool scalar
    used_homography: jnp.ndarray
    R21: jnp.ndarray         # [3, 3] camera-2-from-camera-1 rotation
    t21: jnp.ndarray         # [3] unit-scale translation
    points: jnp.ndarray      # [N, 3] triangulated in camera-1 frame
    good: jnp.ndarray        # [N] bool triangulation mask


def initialize_two_view(
    key: jnp.ndarray,
    xy1: jnp.ndarray,
    xy2: jnp.ndarray,
    valid: jnp.ndarray,
    K: jnp.ndarray,
    sigma: float = 1.0,
    min_parallax: float = 1.0,
    min_triangulated: int = 50,
) -> TwoViewResult:
    """Full two-view bootstrap (oracle: Initializer::Initialize,
    src/Initializer.cc:58-167). Model choice: RH > 0.40 -> H (:156-164)."""
    models = find_models(key, xy1, xy2, valid, sigma)
    rh = models.score_h / jnp.maximum(models.score_h + models.score_f, 1e-9)
    use_h = rh > 0.40

    ok_h, R_h, t_h, pts_h, good_h = reconstruct_h(
        models.H21, xy1, xy2, models.inliers_h, K, sigma,
        min_parallax, min_triangulated,
    )
    ok_f, R_f, t_f, pts_f, good_f = reconstruct_f(
        models.F21, xy1, xy2, models.inliers_f, K, sigma,
        min_parallax, min_triangulated,
    )

    # Marginal-H fallback (beyond reference). Forward motion against a
    # deep scene scores RH just above the 0.40 threshold (near-homographic
    # image motion), the 8-hypothesis H reconstruction then fails its
    # winner-dominance gates, and the reference simply waits — measured:
    # initialization deferred for 50+ frames while the F reconstruction
    # passes every gate. When H wins only marginally (RH <= 0.45, below
    # the reference's own "clear homography" notion) and fails to
    # reconstruct, accept a passing F solution instead.
    sel_h = use_h & (ok_h | (rh > 0.45))
    ok = jnp.where(sel_h, ok_h, ok_f)
    R = jnp.where(sel_h, R_h, R_f)
    t = jnp.where(sel_h, t_h, t_f)
    pts = jnp.where(sel_h, pts_h, pts_f)
    good = jnp.where(sel_h, good_h, good_f)
    return TwoViewResult(ok, sel_h, R, t, pts, good)


initialize_two_view_jit = jax.jit(
    initialize_two_view,
    static_argnames=("sigma", "min_parallax", "min_triangulated"),
)
