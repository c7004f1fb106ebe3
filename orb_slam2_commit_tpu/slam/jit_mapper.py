"""Batched device graphs for the local-mapping stage.

The staged mapper (slam/local_mapping.py) dispatches one matcher /
triangulation / fuse call per covisible neighbor — ~60 host<->device
round trips per keyframe, which is exactly what per-transfer latency
punishes on remote runtimes and what per-dispatch overhead punishes
everywhere. These graphs batch the whole neighbor loop into ONE
dispatch with packed inputs/outputs, vmapping the per-pair work across
a padded neighbor axis.

Oracle: LocalMapping::CreateNewMapPoints' per-neighbor loop
(src/LocalMapping.cc:281-558) and SearchInNeighbors' forward fuse pass
(src/LocalMapping.cc:560-664). The host keeps the sequential claim
semantics (a feature triangulated with an earlier neighbor is not
re-claimed by a later one) by deduplicating the batched results in
neighbor order.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from orb_slam2_commit_tpu.geometry import triangulation as tri
from orb_slam2_commit_tpu.optim.residuals import BAObservations  # noqa: F401
from orb_slam2_commit_tpu.slam import matchers
from orb_slam2_commit_tpu.utils.config import SLAMConfig

# kf/neighbor feature columns: xy(2) angle octave free -> [N, 5].
TRI_FEAT_COLS = 5
# Per-pair columns: F12(9) ep(2) P2(12) R2row2(3) t2z c2(3) valid -> [B, 31].
TRI_PAIR_COLS = 31
# Global meta: P1 flat(12) c1(3) cos_gate ratio_factor epi_min_d2 -> [17].
TRI_META_LEN = 17


def _pack_feats(xy, angle, octave, free):
    import numpy as np

    out = np.zeros((xy.shape[0], TRI_FEAT_COLS), np.float32)
    out[:, 0:2] = xy
    out[:, 2] = angle
    out[:, 3] = octave
    out[:, 4] = free
    return out


@functools.partial(jax.jit, static_argnames=("config",))
def fused_triangulation_jit(
    kf_f32,       # [N, TRI_FEAT_COLS]
    kf_desc,      # [N, 8] uint32
    nb_f32,       # [B, N, TRI_FEAT_COLS]
    nb_desc,      # [B, N, 8] uint32
    pair_f32,     # [B, TRI_PAIR_COLS]
    meta_f32,     # [TRI_META_LEN]
    config: SLAMConfig,
):
    """All neighbor pairs of CreateNewMapPoints in one dispatch.

    Returns (pts [B, N, 3] f32 triangulated world points per kf-feature
    row, flags [B, N, 2] f32: good gate mask and the matched neighbor
    feature index, -1 where unmatched)."""
    fdt = jnp.result_type(float)
    kf_f32 = kf_f32.astype(fdt)
    nb_f32 = nb_f32.astype(fdt)
    pair_f32 = pair_f32.astype(fdt)
    meta_f32 = meta_f32.astype(fdt)

    xy1 = kf_f32[:, 0:2]
    angle1 = kf_f32[:, 2]
    octave1 = kf_f32[:, 3].astype(jnp.int32)
    free1 = kf_f32[:, 4] > 0.5

    P1 = meta_f32[0:12].reshape(3, 4)
    c1 = meta_f32[12:15]
    cos_gate = meta_f32[15]
    ratio_factor = meta_f32[16]

    n_lv = config.orb.n_levels
    scale = config.orb.scale_factor
    scale_factors = jnp.asarray(config.orb.scale_factors(), fdt)
    sigma2 = jnp.asarray(config.orb.level_sigma2(), fdt)

    def one_pair(nb, nbd, pair):
        xy2 = nb[:, 0:2]
        angle2 = nb[:, 2]
        octave2 = nb[:, 3].astype(jnp.int32)
        free2 = nb[:, 4] > 0.5
        F12 = pair[0:9].reshape(3, 3)
        ep = pair[9:11]
        P2 = pair[11:23].reshape(3, 4)
        R2z = pair[23:26]
        t2z = pair[26]
        c2 = pair[27:30]
        pair_valid = pair[30] > 0.5

        m = matchers.match_for_triangulation.__wrapped__(
            xy1, kf_desc, angle1, free1 & pair_valid,
            xy2, nbd, angle2, free2,
            F12, octave2, ep, jnp.asarray(100.0, fdt),
            n_levels=n_lv, scale=scale,
        )
        idx = m.idx
        matched = idx >= 0
        uv2 = xy2[jnp.maximum(idx, 0)]
        pts = tri.triangulate_dlt(xy1, uv2, P1, P2)

        # Gates (reference :388-535): parallax, cheirality, reprojection,
        # scale consistency — all in-graph.
        r1 = pts - c1[None]
        r2 = pts - c2[None]
        d1 = jnp.linalg.norm(r1, axis=1)
        d2 = jnp.linalg.norm(r2, axis=1)
        cos_par = jnp.sum(r1 * r2, axis=1) / jnp.maximum(d1 * d2, 1e-12)
        # P1 = K [R1|t1]: its third row IS (R1 row3, t1z) since K row3 =
        # [0,0,1] — depth in camera 1 falls out of the projection matrix.
        z1 = pts @ P1[2, 0:3] + P1[2, 3]
        z2 = pts @ R2z + t2z
        e1 = tri.reprojection_error_sq(pts, xy1, P1)
        e2 = tri.reprojection_error_sq(pts, uv2, P2)
        o1c = jnp.clip(octave1, 0, n_lv - 1)
        o2c = jnp.clip(octave2[jnp.maximum(idx, 0)], 0, n_lv - 1)
        ratio_dist = d2 / jnp.maximum(d1, 1e-12)
        ratio_octave = scale_factors[o1c] / scale_factors[o2c]
        good = (
            matched
            & (cos_par > 0)
            & (cos_par < cos_gate)
            & (z1 > 0)
            & (z2 > 0)
            & (e1 < 5.991 * sigma2[o1c])
            & (e2 < 5.991 * sigma2[o2c])
            & (ratio_dist * ratio_factor >= ratio_octave)
            & (ratio_dist <= ratio_octave * ratio_factor)
            & jnp.isfinite(pts).all(axis=1)
            & pair_valid
        )
        flags = jnp.stack(
            [good.astype(jnp.float32), idx.astype(jnp.float32)], axis=1
        )
        return pts.astype(jnp.float32), flags

    return jax.vmap(one_pair)(nb_f32, nb_desc, pair_f32)


# ---------------------------------------------------------------------------
# Batched forward fuse: project this keyframe's points into each target
# neighbor (SearchInNeighbors' first loop) in one dispatch.
# ---------------------------------------------------------------------------

# Point columns: pos(3) normal(3) dmin dmax valid -> [P, 9].
FUSE_PT_COLS = 9
# Target feature columns: xy(2) octave valid -> [B, N, 4].
FUSE_FEAT_COLS = 4
# Per-target meta: R(9) t(3) valid -> [B, 13].
FUSE_TGT_COLS = 13


@functools.partial(jax.jit, static_argnames=("config",))
def fused_fuse_forward_jit(
    pt_f32,       # [P, FUSE_PT_COLS]
    pt_desc,      # [P, 8] uint32
    tgt_feat,     # [B, N, FUSE_FEAT_COLS]
    tgt_desc,     # [B, N, 8] uint32
    tgt_meta,     # [B, FUSE_TGT_COLS]
    config: SLAMConfig,
):
    """Returns idx [B, P] f32: target feature matched per point per
    target (-1 none)."""
    fdt = jnp.result_type(float)
    pt_f32 = pt_f32.astype(fdt)
    tgt_feat = tgt_feat.astype(fdt)
    tgt_meta = tgt_meta.astype(fdt)
    cam = config.camera

    pos = pt_f32[:, 0:3]
    normal = pt_f32[:, 3:6]
    dmin = pt_f32[:, 6]
    dmax = pt_f32[:, 7]
    pvalid = pt_f32[:, 8] > 0.5

    def one_target(feat, desc, meta):
        R = meta[0:9].reshape(3, 3)
        t = meta[9:12]
        tvalid = meta[12] > 0.5
        info = matchers.frustum_check.__wrapped__(
            pos, normal, dmin, dmax, pvalid & tvalid, R, t,
            cam.fx, cam.fy, cam.cx, cam.cy,
            float(cam.width), float(cam.height),
            n_levels=config.orb.n_levels, scale=config.orb.scale_factor,
        )
        m = matchers.match_fuse.__wrapped__(
            info, pt_desc,
            feat[:, 0:2], desc, feat[:, 2].astype(jnp.int32),
            feat[:, 3] > 0.5,
            th=3.0,
            n_levels=config.orb.n_levels, scale=config.orb.scale_factor,
        )
        return m.idx.astype(jnp.float32)

    return jax.vmap(one_target)(tgt_feat, tgt_desc, tgt_meta)
