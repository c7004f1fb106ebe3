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


@functools.partial(jax.jit, static_argnames=("th_hi", "th_lo", "interpret"))
def level_preprocess(
    image: jnp.ndarray,       # [H, W] float32
    th_hi: float,
    th_lo: float,
    interpret: bool | None = None,
):
    """-> (blurred[H, W], score_hi[H, W], score_lo[H, W]).

    Bit-identical to ops/pyramid.gaussian_blur (reflect padding) and
    ops/fast.fast_score_map at both thresholds.
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
    return blur[:h, :w], hi[:h, :w], lo[:h, :w]
