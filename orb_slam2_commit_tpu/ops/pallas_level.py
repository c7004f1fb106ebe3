"""Pallas TPU kernel: fused per-level preprocessing (Gaussian blur + FAST).

One kernel pass per pyramid level computes everything dense the extractor
needs from the level image:

  - 7x7 sigma=2 separable Gaussian blur (for BRIEF sampling)
  - FAST-9/16 corner scores at the high and low thresholds

The XLA formulation (ops/pyramid.gaussian_blur + ops/fast) materializes
~50 shifted whole-image intermediates in HBM (~2.8 ms per frame across
levels on v5e); here each 64-row stripe stays in VMEM across all ~150
elementwise steps, reading the level image from HBM exactly once.

Stripes need a 3-row halo (blur taps and the FAST circle both reach
+/-3), so the image input stays in HBM (`pltpu.ANY`) and each grid
instance DMAs its stripe+halo into VMEM scratch. The image is
reflect-padded by 3 on every side first, so blur AND FAST use
BORDER_REFLECT_101 neighborhoods — bit-identical to the XLA route
(ops/fast uses the same reflect neighborhood).

Oracles: cv-style blur (ops/pyramid.py, reference src/ORBextractor.cc:1190)
and the FAST segment test (ops/fast.py, reference
src/ORBextractor.cc:851-915).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from orb_slam2_commit_tpu.ops.fast import CIRCLE_OFFSETS
from orb_slam2_commit_tpu.ops.pyramid import gaussian_kernel_1d

HALO = 3          # blur radius 3, FAST circle radius 3
STRIPE = 64       # rows per grid instance


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _shift2(a: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """a[y + dy, x + dx] via static rolls. Wrap effects never reach valid
    outputs because the caller pads by HALO >= |dy|, |dx| on every side."""
    if dy:
        a = pltpu.roll(a, (-dy) % a.shape[0], 0)
    if dx:
        a = pltpu.roll(a, (-dx) % a.shape[1], 1)
    return a


def _has_arc(mask16: jnp.ndarray) -> jnp.ndarray:
    """Contiguous run of >= 9 bits in a 16-bit circular mask
    (same log-step trick as ops/fast._has_arc)."""
    m = mask16 | (mask16 << 16)
    r = m & (m >> 1)
    r = r & (r >> 2)
    r = r & (r >> 4)
    r = r & (m >> 8)
    return (r & 0xFFFF) != 0


def _level_kernel(
    img_hbm, blur_ref, hi_ref, lo_ref, vmem, sem,
    *, th_hi: float, th_lo: float,
):
    i = pl.program_id(0)
    # DMA row counts must be sublane-aligned (8); over-read past the halo.
    rows = STRIPE + 8

    copy = pltpu.make_async_copy(
        img_hbm.at[pl.ds(i * STRIPE, rows), :], vmem, sem
    )
    copy.start()
    copy.wait()
    img = vmem[:, :]

    # --- separable 7x7 blur (horizontal then vertical taps, matching
    # ops/pyramid.gaussian_blur's pass order bit-for-bit) ---
    # Tap constants must stay f32: under jax_enable_x64 a python float
    # would promote the multiply to f64 and double-round at the write.
    # (np scalars embed as literals; jnp scalars would be captured arrays.)
    taps = [np.float32(t) for t in gaussian_kernel_1d(7, 2.0)]
    acc = None
    for t in range(7):
        s = taps[t] * _shift2(img, 0, t - 3)
        acc = s if acc is None else acc + s
    blur = None
    for t in range(7):
        s = taps[t] * _shift2(acc, t - 3, 0)
        blur = s if blur is None else blur + s

    # --- FAST-9/16 two-threshold segment test + V-scores, one sweep ---
    shape = img.shape
    bb_hi = jnp.zeros(shape, jnp.int32)
    db_hi = jnp.zeros(shape, jnp.int32)
    bb_lo = jnp.zeros(shape, jnp.int32)
    db_lo = jnp.zeros(shape, jnp.int32)
    sb_hi = jnp.zeros(shape, jnp.float32)
    sd_hi = jnp.zeros(shape, jnp.float32)
    sb_lo = jnp.zeros(shape, jnp.float32)
    sd_lo = jnp.zeros(shape, jnp.float32)
    for bit, (dy, dx) in enumerate(CIRCLE_OFFSETS):
        d = _shift2(img, int(dy), int(dx)) - img
        w = jnp.int32(1 << bit)
        bb_hi += jnp.where(d > th_hi, w, 0)
        db_hi += jnp.where(d < -th_hi, w, 0)
        bb_lo += jnp.where(d > th_lo, w, 0)
        db_lo += jnp.where(d < -th_lo, w, 0)
        sb_hi += jnp.maximum(d - th_hi, 0.0)
        sd_hi += jnp.maximum(-d - th_hi, 0.0)
        sb_lo += jnp.maximum(d - th_lo, 0.0)
        sd_lo += jnp.maximum(-d - th_lo, 0.0)

    def scores(bb, db, s_b, s_d):
        corner = _has_arc(bb) | _has_arc(db)
        return jnp.where(corner, jnp.maximum(s_b, s_d), 0.0)

    lane = blur_ref.shape[1]
    r0, r1 = HALO, HALO + STRIPE
    blur_ref[:, :] = lax.slice(blur, (r0, HALO), (r1, HALO + lane))
    hi_ref[:, :] = lax.slice(
        scores(bb_hi, db_hi, sb_hi, sd_hi), (r0, HALO), (r1, HALO + lane)
    )
    lo_ref[:, :] = lax.slice(
        scores(bb_lo, db_lo, sb_lo, sd_lo), (r0, HALO), (r1, HALO + lane)
    )


@functools.partial(
    jax.jit, static_argnames=("th_hi", "th_lo", "interpret", "full_canvas")
)
def level_preprocess(
    image: jnp.ndarray,       # [H, W] float32
    th_hi: float,
    th_lo: float,
    interpret: bool | None = None,
    full_canvas: bool = False,
):
    """-> (blurred[H, W], score_hi[H, W], score_lo[H, W]).

    Bit-identical to ops/pyramid.gaussian_blur (reflect padding) and
    ops/fast.fast_score_map at both thresholds.

    full_canvas=True returns the UNSLICED stripe-padded arrays
    ([round_up(H, 64), round_up(W, 128)]; pad rows/cols carry edge-padded
    garbage that downstream masking must ignore) — this feeds
    combine_nms without a slice+repad round trip through HBM.
    """
    if interpret is None:
        interpret = _interpret()
    h, w = image.shape
    hp = _round_up(h, STRIPE)
    wp_out = _round_up(w, 128)
    wp_in = wp_out + 128  # room for the left HALO shift + right padding

    img = jnp.pad(image, HALO, mode="reflect")
    img = jnp.pad(
        img,
        ((0, hp - h + HALO), (0, wp_in - w - 2 * HALO)),
        mode="edge",
    )

    rows = STRIPE + 8
    out_shape = [
        jax.ShapeDtypeStruct((hp, wp_out), jnp.float32),
        jax.ShapeDtypeStruct((hp, wp_out), jnp.float32),
        jax.ShapeDtypeStruct((hp, wp_out), jnp.float32),
    ]
    blur, hi, lo = pl.pallas_call(
        functools.partial(_level_kernel, th_hi=th_hi, th_lo=th_lo),
        grid=(hp // STRIPE,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=[
            pl.BlockSpec((STRIPE, wp_out), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((STRIPE, wp_out), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((STRIPE, wp_out), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((rows, wp_in), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(img)
    if full_canvas:
        return blur, hi, lo
    return blur[:h, :w], hi[:h, :w], lo[:h, :w]


# ----------------------------------------------------------------------
# Fused border-mask + two-threshold cell combine + 3x3 NMS.
#
# The XLA formulation (mask multiplies + fast.combine_two_threshold +
# fast.nms_3x3) moves ~245 MB/frame through HBM at 640x480 — reduce_window
# and the cell repeat/reshape each re-materialize canvas-sized arrays.
# This kernel reads the two score maps once (2x row overlap for the cell
# halo), does everything in VMEM, and writes the final NMS'd map:
# ~37 MB/frame. Cell "has-high-response" tests use SUM > 0 instead of
# MAX > 0 (scores are non-negative, so they agree exactly) because group
# sums are two tiny MXU matmuls against 0/1 indicator matrices — there is
# no cheap cross-lane group-max on the VPU.
#
# Oracle (bit-identical): nms_3x3(where(cell_has_hi, hi*mask, lo*mask)),
# fast.combine_two_threshold semantics, reference
# src/ORBextractor.cc:441-460 (two-threshold cell fallback) + the cv FAST
# nonmax suppression.
# ----------------------------------------------------------------------

CELL = 32          # must match ORBConfig.cell_size for the packed route
_CNMS_WIN = 128    # rows windowed per 64-row output stripe (cell halo)


def _combine_nms_kernel(
    hi_hbm, lo_hbm, bounds_hbm, out_ref,
    hi_v, lo_v, bounds_v, sem_h, sem_l, sem_b,
    *, hp: int,
):
    i = pl.program_id(0)
    # Window: output rows [i*64, i*64+64) need combined scores at +-1 row
    # (NMS) and cell sums for cell rows (i*64-1)//32 .. (i*64+64)//32 —
    # i.e. canvas rows [i*64-32, i*64+96). Clamp into the canvas; the
    # clamped-away rows belong to cells whose pixels are all border-masked
    # zeros, so substituting nothing changes no output (see module note).
    # start must be PROVABLY sublane-aligned for the HBM memref slice:
    # clip in units of 8 rows, then scale (Mosaic proves q*8 % 8 == 0;
    # it cannot prove that through a clip of raw row offsets).
    q = jnp.clip(
        i * (STRIPE // 8) - CELL // 8, 0, hp // 8 - _CNMS_WIN // 8
    )
    start = q * 8
    d = i * STRIPE - start                    # output row offset in window

    for ref, vref, sem in (
        (hi_hbm, hi_v, sem_h), (lo_hbm, lo_v, sem_l),
        (bounds_hbm, bounds_v, sem_b),
    ):
        cp = pltpu.make_async_copy(
            ref.at[pl.ds(start, _CNMS_WIN), :], vref, sem
        )
        cp.start()
        cp.wait()

    wp = out_ref.shape[1]
    rows = _CNMS_WIN
    ix = lax.broadcasted_iota(jnp.int32, (rows, wp), 1)
    x0 = bounds_v[:, 0:1]
    x1 = bounds_v[:, 1:2]
    mask = (ix >= x0) & (ix < x1)
    mhi = jnp.where(mask, hi_v[:, :], 0.0)
    mlo = jnp.where(mask, lo_v[:, :], 0.0)

    # Per-pixel cell sums of mhi via 0/1 indicator matmuls (MXU):
    #   csum[c, cc] = sum of cell (c, cc); cell_px = row/col broadcast.
    # start % 32 == 0 always (STRIPE, CELL, hp all multiples of 32), so
    # window rows group into whole cells.
    n_cr = rows // CELL
    ErT = (
        lax.broadcasted_iota(jnp.int32, (n_cr, rows), 1) // CELL
        == lax.broadcasted_iota(jnp.int32, (n_cr, rows), 0)
    ).astype(jnp.float32)                                 # [n_cr, rows]
    Er = (
        lax.broadcasted_iota(jnp.int32, (rows, n_cr), 0) // CELL
        == lax.broadcasted_iota(jnp.int32, (rows, n_cr), 1)
    ).astype(jnp.float32)                                 # [rows, n_cr]
    EcT = (
        lax.broadcasted_iota(jnp.int32, (wp, 128), 0) // CELL
        == lax.broadcasted_iota(jnp.int32, (wp, 128), 1)
    ).astype(jnp.float32)                                 # [wp, 128]
    Ec = (
        lax.broadcasted_iota(jnp.int32, (128, wp), 1) // CELL
        == lax.broadcasted_iota(jnp.int32, (128, wp), 0)
    ).astype(jnp.float32)                                 # [128, wp]
    csum = jnp.dot(
        jnp.dot(ErT, mhi, preferred_element_type=jnp.float32),
        EcT, preferred_element_type=jnp.float32,
    )                                                     # [n_cr, 128]
    cell_px = jnp.dot(
        Er, jnp.dot(csum, Ec, preferred_element_type=jnp.float32),
        preferred_element_type=jnp.float32,
    )                                                     # [rows, wp]

    combined = jnp.where(cell_px > 0.0, mhi, mlo)

    # 3x3 NMS with raster-first tie-breaking (oracle: fast.nms_3x3).
    # Cyclic wrap at window edges only touches rows/columns whose scores
    # are border-masked zeros (border >= 19 >> 1), so it never flips an
    # output.
    nb_max = combined
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy or dx:
                nb_max = jnp.maximum(nb_max, _shift2(combined, dy, dx))
    is_max = (combined >= nb_max) & (combined > 0.0)
    flat = (
        (start + lax.broadcasted_iota(jnp.int32, (rows, wp), 0)) * wp + ix
    )
    big = jnp.int32(hp * wp)
    idx_map = jnp.where(is_max, flat, big)
    nb_min = idx_map
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy or dx:
                nb_min = jnp.minimum(nb_min, _shift2(idx_map, dy, dx))
    keep = is_max & (flat == nb_min)
    score = jnp.where(keep, combined, 0.0)
    # Traced-start slicing isn't lowerable; rotate the output window to
    # row 0 with a dynamic roll and take a static slice.
    score = pltpu.roll(score, (-d) % rows, 0)
    out_ref[:, :] = lax.slice(score, (0, 0), (STRIPE, wp))


@functools.partial(jax.jit, static_argnames=("interpret",))
def combine_nms(
    score_hi: jnp.ndarray,    # [hp, wp] float32, hp % 64 == 0, wp % 128 == 0
    score_lo: jnp.ndarray,
    bounds: jnp.ndarray,      # [hp, 128] int32: col 0 = x0, col 1 = x1
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Fused mask + per-cell two-threshold combine + 3x3 NMS -> [hp, wp].

    bounds gives each canvas row its valid detection column range
    [x0, x1) (0-width outside some level's interior) — the row-wise
    encoding of packed_extractor._border_mask_np. Bit-identical to
    nms_3x3(combine_two_threshold(hi*mask, lo*mask, 32)) on the same
    padded canvas.
    """
    if interpret is None:
        interpret = _interpret()
    hp, wp = score_hi.shape
    assert hp % STRIPE == 0 and wp % 128 == 0 and hp >= _CNMS_WIN
    assert bounds.shape == (hp, 128)
    # The column-cell indicator matrices in the kernel are [wp, 128] /
    # [128, wp]: at most 128 column cells. Wider canvases would silently
    # zero cell sums past column 128*CELL and fall back to the low
    # threshold — refuse instead (route such canvases to the XLA path).
    assert wp <= 128 * CELL, f"canvas width {wp} exceeds {128 * CELL}"

    return pl.pallas_call(
        functools.partial(_combine_nms_kernel, hp=hp),
        grid=(hp // STRIPE,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (STRIPE, wp), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((_CNMS_WIN, wp), jnp.float32),
            pltpu.VMEM((_CNMS_WIN, wp), jnp.float32),
            pltpu.VMEM((_CNMS_WIN, 128), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(score_hi, score_lo, bounds)
