"""Packed-canvas ORB extraction: every pyramid level in ONE kernel per stage.

The per-level extractor (ops/extractor.py) launches each stage once per
pyramid level — ~20 device kernels per level, ~150 per frame. On TPU the
wall-clock of this phase is dominated by fixed per-kernel launch latency
(~15-30 us each, measured on v5e through the remote runtime), not by
compute: the whole 8-level image stack is < 4 MB.

This module removes the per-level axis from the launch count by packing
all levels into one vertically-stacked canvas [sum(aligned heights), W0]
and running every dense stage exactly once on the canvas:

  pyramid levels --pack--> canvas
  canvas -> fused blur+FAST (1 Pallas call, ops/pallas_level.py)
         -> two-threshold fallback + NMS (ops/fast.combine_two_threshold)
         -> per-cell top-k  (ONE lax.top_k over all cells of all levels)
         -> per-level top-k (ONE lax.top_k over [L, slots])
         -> IC angle        (ONE Pallas patch gather + one einsum)
         -> rotated BRIEF   (ONE Pallas patch gather + one einsum)

Bit-exactness to the per-level route is preserved by construction:

  * level start rows are aligned to cell_size, so the canvas cell grid
    restricted to a level IS that level's cell grid (dead cells between
    levels score zero and sort last);
  * FAST/blur values can differ from the per-level route only within
    HALO=3 px of a level edge (neighbor-level bleed instead of reflect
    padding). The detection border is >= BRIEF_HALF + HALO = 22 px, so
    no selected keypoint's score, IC patch (|off| <= 15) or BRIEF sample
    (|off| <= 19, blur taps +/-3) ever reads one of those pixels;
  * border masking is applied to the score maps BEFORE the cell fallback
    and NMS in both routes (ops/extractor.py does the same), so the
    hi/lo cell decision sees identical inputs.

The only admissible divergence is tie-breaking among exactly-equal FAST
scores at a budget cutoff (slot enumeration order differs).

Reference context: this replaces ORBextractor::operator()'s per-level
loop (src/ORBextractor.cc:1138-1211) — same per-level budgets, borders
and coordinate rescaling, restructured for launch-latency-bound hardware.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from orb_slam2_commit_tpu.ops import (
    descriptors, fast, pallas_level, pallas_select, pyramid,
)
from orb_slam2_commit_tpu.ops.extractor import Features
from orb_slam2_commit_tpu.utils.config import ORBConfig


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class PackPlan(NamedTuple):
    """Static canvas layout for one (config, image-size) combination."""

    shapes: Tuple[Tuple[int, int], ...]   # per-level (h, w)
    row_offsets: Tuple[int, ...]          # level start row in the canvas
    aligned_heights: Tuple[int, ...]      # cell-aligned level heights
    canvas_h: int
    width: int                            # canvas width == level-0 width
    border: int                           # detection border (>= 22)


def make_plan(config: ORBConfig, height: int, width: int) -> PackPlan:
    shapes = config.level_shapes(height, width)
    cell = config.cell_size
    offsets, aligned = [], []
    off = 0
    for (h, _w) in shapes:
        ha = _round_up(h, cell)
        offsets.append(off)
        aligned.append(ha)
        off += ha
    border = max(config.edge_threshold - 3, descriptors.BRIEF_HALF + pallas_level.HALO)
    return PackPlan(
        shapes=tuple(shapes),
        row_offsets=tuple(offsets),
        aligned_heights=tuple(aligned),
        canvas_h=off,
        width=shapes[0][1],
        border=border,
    )


@functools.lru_cache(maxsize=None)
def _bounds_np(plan: PackPlan, hp: int) -> np.ndarray:
    """[hp, 128] int32 row-wise detection bounds: col 0 = x0, col 1 = x1
    ([x0, x1) valid detection columns; 0-width outside level interiors).
    The row-encoded form of _border_mask_np for pallas_level.combine_nms
    (level interiors are rectangles, so one x-range per row is exact)."""
    out = np.zeros((hp, 128), np.int32)
    b = plan.border
    for (h, w), off in zip(plan.shapes, plan.row_offsets):
        if h > 2 * b and w > 2 * b:
            out[off + b: off + h - b, 0] = b
            out[off + b: off + h - b, 1] = w - b
    return out


@functools.lru_cache(maxsize=None)
def _border_mask_np(plan: PackPlan) -> np.ndarray:
    """[canvas_h, W] float32 {0,1}: 1 inside some level's detection
    interior (>= border px from every level edge)."""
    m = np.zeros((plan.canvas_h, plan.width), np.float32)
    b = plan.border
    for (h, w), off in zip(plan.shapes, plan.row_offsets):
        if h > 2 * b and w > 2 * b:
            m[off + b : off + h - b, b : w - b] = 1.0
    return m


def pack_levels(levels, plan: PackPlan) -> jnp.ndarray:
    """Generic packing of explicit level arrays (used by tests/tools)."""
    canvas = jnp.zeros((plan.canvas_h, plan.width), jnp.float32)
    for img_l, off in zip(levels, plan.row_offsets):
        canvas = lax.dynamic_update_slice(canvas, img_l, (off, 0))
    return canvas


@functools.lru_cache(maxsize=None)
def _canvas_row_map(plan: PackPlan) -> np.ndarray:
    """[canvas_h - aligned_h0] row gather map into the [L-1, h0, w0] stack
    (viewed as [(L-1)*h0, w0]); alignment-gap rows point at zero rows of
    the stack (every stack row >= level height is zero by construction).
    Rows beyond h0 in a level's slot fall back to any zero row."""
    h0 = plan.shapes[0][0]
    rows = []
    for lvl in range(1, len(plan.shapes)):
        ha = plan.aligned_heights[lvl]
        h = plan.shapes[lvl][0]
        base = (lvl - 1) * h0
        r = base + np.minimum(np.arange(ha), h0 - 1)
        # alignment gap rows must be zero: stack rows [h, h0) are zero, so
        # clamping into that range is safe when ha <= h0; if ha > h0 (never
        # for scale > 1) we'd need explicit zeros.
        assert ha <= h0 and h < h0
        rows.append(r)
    return np.concatenate(rows).astype(np.int32)


def build_canvas(image: jnp.ndarray, plan: PackPlan) -> jnp.ndarray:
    """Tight packed canvas straight from the batched pyramid: level 0 is
    the input image (zero-padded to its aligned slot), levels 1+ are one
    static row-gather of pyramid.direct_pyramid_stack — no per-level
    update-slice chain."""
    stack = pyramid.direct_pyramid_stack(image, plan.shapes)
    h0, w0 = plan.shapes[0]
    flat = stack.reshape(-1, w0)
    rest = flat[jnp.asarray(_canvas_row_map(plan))]
    lvl0 = jnp.pad(image, ((0, plan.aligned_heights[0] - h0), (0, 0)))
    return jnp.concatenate([lvl0, rest], axis=0)


def packed_select(
    score: jnp.ndarray,
    plan: PackPlan,
    budgets: Tuple[int, ...],
    cell_size: int,
    cell_top_k: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Spatially-balanced selection for every level in two top_k calls.

    Returns per-level padded matrices over kmax = max(budgets) slots:
      yx[L, kmax, 2] CANVAS coords (parked in-level when invalid),
      response[L, kmax], valid[L, kmax].
    """
    hc, w = score.shape
    assert hc % cell_size == 0
    wp = _round_up(w, cell_size)
    sp = jnp.pad(score, ((0, 0), (0, wp - w)))
    n_cy, n_cx = hc // cell_size, wp // cell_size

    cells = sp.reshape(n_cy, cell_size, n_cx, cell_size)
    cells = cells.transpose(0, 2, 1, 3).reshape(n_cy * n_cx, cell_size * cell_size)
    # Per-cell top-k as ONE kernel (all k extraction rounds in VMEM);
    # identical values + tie-breaking to fast.topk_iterative.
    cell_vals, cell_arg = pallas_select.cell_topk(cells, cell_top_k)
    cell_vals = jnp.maximum(cell_vals, 0.0)  # -inf pads (k > nonzeros) -> 0

    cell_ids = jnp.arange(n_cy * n_cx, dtype=jnp.int32)[:, None]
    cy, cx = cell_ids // n_cx, cell_ids % n_cx
    iy = cy * cell_size + cell_arg // cell_size
    ix = cx * cell_size + cell_arg % cell_size

    # One extra zero slot at the end backs the padding of every level row.
    flat_vals = jnp.concatenate([cell_vals.reshape(-1), jnp.zeros(1)])
    flat_iy = jnp.concatenate(
        [iy.reshape(-1).astype(jnp.int32), jnp.zeros(1, jnp.int32)]
    )
    flat_ix = jnp.concatenate(
        [ix.reshape(-1).astype(jnp.int32), jnp.zeros(1, jnp.int32)]
    )

    # Regroup candidate slots by level with ONE static gather (level l owns
    # the contiguous flat range for cell rows
    # [row_off/cell, (row_off+aligned_h)/cell); padding points at the zero
    # slot). A slice-and-stack formulation costs ~3 kernels per level —
    # pure launch latency on TPU.
    n_levels = len(plan.shapes)
    slot_counts = [
        (ha // cell_size) * n_cx * cell_top_k for ha in plan.aligned_heights
    ]
    slot_max = max(slot_counts)
    zero_slot = int(cell_vals.size)
    gather_np = np.full((n_levels, slot_max), zero_slot, np.int32)
    for lvl in range(n_levels):
        start = (plan.row_offsets[lvl] // cell_size) * n_cx * cell_top_k
        gather_np[lvl, : slot_counts[lvl]] = start + np.arange(
            slot_counts[lvl], dtype=np.int32
        )
    gather_idx = jnp.asarray(gather_np)                   # [L, slot_max]
    lvl_vals = flat_vals[gather_idx]

    kmax = max(budgets)
    top_vals, top_pos = lax.top_k(lvl_vals, kmax)         # [L, kmax]
    # Map winning slots back to flat candidate ids, then to coordinates.
    flat_pos = jnp.take_along_axis(gather_idx, top_pos, axis=1)
    top_iy = flat_iy[flat_pos]
    top_ix = flat_ix[flat_pos]

    budgets_arr = jnp.asarray(np.array(budgets, np.int32))[:, None]
    valid = (jnp.arange(kmax, dtype=jnp.int32)[None, :] < budgets_arr) & (
        top_vals > 0
    )

    # Park invalid slots inside their own level's interior so downstream
    # patch gathers stay within level bounds.
    park_y = jnp.asarray(
        np.array(plan.row_offsets, np.int32) + plan.border
    )[:, None]
    yx = jnp.stack(
        [
            jnp.where(valid, top_iy, park_y),
            jnp.where(valid, top_ix, plan.border),
        ],
        axis=-1,
    ).astype(jnp.int32)
    return yx, jnp.where(valid, top_vals, 0.0), valid


def extract_features_packed(
    image: jnp.ndarray, config: ORBConfig, height: int, width: int
) -> Features:
    """Packed-canvas equivalent of ops/extractor.extract_features.

    Same output layout (level-major concatenation of per-level budgets,
    coords rescaled to level 0); see module docstring for the exactness
    contract vs the per-level route.
    """
    plan = make_plan(config, height, width)
    budgets = config.features_per_level()
    scales = config.scale_factors()

    canvas = build_canvas(image, plan)

    fused_nms = os.environ.get("ORB_TPU_FUSED_NMS", "1") == "1"
    if fused_nms and config.cell_size == pallas_level.CELL:
        # Fused path: unsliced score maps -> one mask+combine+NMS kernel
        # (the XLA formulation below moves ~245 MB/frame through HBM).
        # Pad rows/cols of the full-canvas maps carry edge-pad garbage;
        # the kernel's row bounds mask them to zero.
        blur_c, hi_c, lo_c = pallas_level.level_preprocess(
            canvas, float(config.ini_th_fast), float(config.min_th_fast),
            full_canvas=True,
        )
        hp = hi_c.shape[0]
        if (hp >= pallas_level._CNMS_WIN
                and hi_c.shape[1] <= 128 * pallas_level.CELL):
            bounds = jnp.asarray(_bounds_np(plan, hp))
            score = pallas_level.combine_nms(hi_c, lo_c, bounds)
        else:   # tiny canvas (unit tests): XLA fallback
            m = jnp.asarray(_border_mask_np(plan))
            mp = jnp.zeros(hi_c.shape, m.dtype).at[
                : m.shape[0], : m.shape[1]].set(m)
            score = fast.combine_two_threshold(
                hi_c * mp, lo_c * mp, config.cell_size
            )
    else:
        blur_c, hi_c, lo_c = pallas_level.level_preprocess(
            canvas, float(config.ini_th_fast), float(config.min_th_fast)
        )
        mask = jnp.asarray(_border_mask_np(plan))
        score = fast.combine_two_threshold(
            hi_c * mask, lo_c * mask, config.cell_size
        )

    yx, resp, valid = packed_select(
        score, plan, budgets, config.cell_size, config.cell_top_k
    )

    # Compact the [L, kmax] padded slot matrices to the N = sum(budgets)
    # output layout with ONE static gather (slot indices are compile-time
    # constants), so the per-keypoint stages below only touch real slots.
    kmax = yx.shape[1]
    sel_np = np.concatenate(
        [np.arange(b, dtype=np.int32) + l * kmax for l, b in enumerate(budgets)]
    )
    sel = jnp.asarray(sel_np)
    yx_flat = yx.reshape(-1, 2)[sel]
    resp_flat = resp.reshape(-1)[sel]
    valid_flat = valid.reshape(-1)[sel]

    # One Pallas patch gather feeds orientation AND subpixel refinement
    # (a second XLA gather for the 9x9 refinement windows measured
    # ~25% of the whole frontend step on v5e).
    from orb_slam2_commit_tpu.ops import pallas_patches

    patches = pallas_patches.extract_patches(
        canvas, yx_flat, descriptors.PATCH_SIZE
    )
    angle = descriptors.ic_angle_from_patches(patches)
    desc = descriptors.brief_descriptors_patches(blur_c, yx_flat, angle)

    sub_off = 0.0
    if config.subpixel_refine:
        from orb_slam2_commit_tpu.ops import subpix

        # Same pixels as the per-level route: every keypoint sits at
        # least `border` >= 19 px inside its level's canvas rows, so the
        # refinement stencil never crosses a level boundary. One Pallas
        # pass; oracle = subpix.corner_subpix_from_patches.
        half = descriptors.PATCH_SIZE // 2
        sub_off = subpix.corner_subpix_from_patches_pallas(
            patches, half, half
        )
    row_off_np = np.concatenate(
        [np.full(b, plan.row_offsets[l], np.float32) for l, b in enumerate(budgets)]
    )
    scale_np = np.concatenate(
        [np.full(b, scales[l], np.float32) for l, b in enumerate(budgets)]
    )
    octave_np = np.concatenate(
        [np.full(b, l, np.int32) for l, b in enumerate(budgets)]
    )
    xy_f = yx_flat.astype(jnp.float32) + sub_off
    x0 = xy_f[:, 1] * jnp.asarray(scale_np)
    y0 = (xy_f[:, 0] - jnp.asarray(row_off_np)) * jnp.asarray(scale_np)
    return Features(
        xy=jnp.stack([x0, y0], axis=-1),
        response=resp_flat,
        angle=angle,
        octave=jnp.asarray(octave_np),
        desc=desc,
        valid=valid_flat,
    )
