"""Pallas TPU kernels for fused descriptor matching.

The XLA route in `ops/matching.py` materializes the [M, N] Hamming
distance matrix (and a second [M, N] tensor for the runner-up pass) in
HBM between stages. These Pallas kernels keep the whole
``XOR -> popcount -> mask -> best/second-best reduction`` per row-tile in
VMEM, writing only [M, 4] back to HBM — the matcher becomes pure VPU
compute with minimal HBM traffic.

Two kernels:

- :func:`masked_hamming_top2` — generic [M, N] candidate mask supplied by
  the caller (covers BoW-bucket / epipolar variants).
- :func:`projection_hamming_top2` — the per-frame hot-path variant
  (ORBmatcher::SearchByProjection, reference src/ORBmatcher.cc:46-142,
  :1489-1646): the window + octave-band candidate mask is computed inside
  the kernel from per-row projections and per-column keypoint attributes,
  so no [M, N] tensor ever exists anywhere.

Semantics match ops/matching.py exactly (same tie-breaking as
``jnp.argmin``: first index of the minimum), verified by
tests/test_pallas_matching.py.

On CPU (tests) the kernels run in Pallas interpreter mode; on TPU they
compile through Mosaic. `ops/matching.py` / `slam/matchers.py` route to
these kernels when the default backend is a TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WORDS = 8           # 256-bit ORB descriptor = 8 uint32 words
TILE_M = 128        # rows per grid instance
LANE = 128          # TPU lane count; N is padded to a multiple
BIG = 1 << 20  # plain int: jnp constants would be captured as kernel operands


def _interpret() -> bool:
    """Pallas interpreter mode everywhere except on real TPU backends."""
    return jax.default_backend() == "cpu"


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pad_rows(a: jnp.ndarray, rows: int) -> jnp.ndarray:
    if a.shape[0] == rows:
        return a
    pad = [(0, rows - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
    return jnp.pad(a, pad)


def _dist_tile(a_ref, bT_ref, n: int) -> jnp.ndarray:
    """[TILE_M, N] int32 Hamming distances from packed-word refs.

    a_ref: [TILE_M, WORDS] uint32; bT_ref: [WORDS, N] uint32 (transposed
    so each word load is a [1, N] lane-contiguous row).
    """
    dist = jnp.zeros((a_ref.shape[0], n), jnp.int32)
    for w in range(WORDS):
        aw = a_ref[:, w : w + 1]      # [TILE_M, 1]
        bw = bT_ref[w : w + 1, :]     # [1, N]
        dist = dist + lax.population_count(
            jnp.bitwise_xor(aw, bw)
        ).astype(jnp.int32)
    return dist


COL_BITS = 12               # supports N (padded) up to 4096 columns
COL_MASK = (1 << COL_BITS) - 1
D_EMPTY = 1 << 18           # masked-candidate fill; (D_EMPTY << 12) fits int32


def _top2_reduce(d: jnp.ndarray, out_ref) -> None:
    """Row-wise (best, argbest, second, argsecond) -> out_ref[:, 0:4].

    d holds true distances at candidates and D_EMPTY elsewhere. Packs
    (dist << COL_BITS) | col into one int32 key so a single min yields
    both the best distance and its first-occurrence argmin (the same
    tie-break as jnp.argmin) — two min passes total instead of the naive
    four min + two where passes. Distances >= D_EMPTY decode to BIG.
    """
    tile_m, n = d.shape
    col = lax.broadcasted_iota(jnp.int32, (tile_m, n), 1)
    key = (d << COL_BITS) | col
    kbest = jnp.min(key, axis=1, keepdims=True)
    bidx = kbest & COL_MASK
    key2 = jnp.where(col == bidx, (D_EMPTY << COL_BITS) | COL_MASK, key)
    ksecond = jnp.min(key2, axis=1, keepdims=True)
    best = kbest >> COL_BITS
    second = ksecond >> COL_BITS
    out_ref[:, 0:1] = jnp.where(best >= D_EMPTY, BIG, best)
    out_ref[:, 1:2] = bidx
    out_ref[:, 2:3] = jnp.where(second >= D_EMPTY, BIG, second)
    out_ref[:, 3:4] = ksecond & COL_MASK


def _masked_kernel(a_ref, bT_ref, mask_ref, out_ref):
    dist = _dist_tile(a_ref, bT_ref, mask_ref.shape[1])
    d = jnp.where(mask_ref[:] != 0, dist, D_EMPTY)
    _top2_reduce(d, out_ref)


@functools.partial(jax.jit, static_argnames=("interpret",))
def masked_hamming_top2(
    desc_a: jnp.ndarray,    # [M, 8] uint32
    desc_b: jnp.ndarray,    # [N, 8] uint32
    mask: jnp.ndarray,      # [M, N] bool candidate pairs
    interpret: bool | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused masked Hamming + top-2: -> (best, best_idx, second, second_idx).

    best/second are BIG (=1<<20) where no candidate exists; indices are
    then the first-column fallback exactly like jnp.argmin over a
    BIG-filled row (callers gate on a distance threshold).
    """
    if interpret is None:
        interpret = _interpret()
    m, n = mask.shape
    mp, np_ = _round_up(max(m, 1), TILE_M), _round_up(max(n, 1), LANE)
    a = _pad_rows(desc_a, mp)
    bT = jnp.pad(
        desc_b.T, ((0, 0), (0, np_ - n))
    )  # [8, Np]
    mk = jnp.pad(mask, ((0, mp - m), (0, np_ - n))).astype(jnp.int8)

    out = pl.pallas_call(
        _masked_kernel,
        grid=(mp // TILE_M,),
        in_specs=[
            pl.BlockSpec((TILE_M, WORDS), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((WORDS, np_), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_M, np_), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_M, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, 8), jnp.int32),
        interpret=interpret,
    )(a, bT, mk)
    out = out[:m]
    # Padded columns are never candidates (mask padded with 0) so indices
    # never point past n except via the all-masked fallback; clamp anyway.
    return (
        out[:, 0],
        jnp.minimum(out[:, 1], n - 1),
        out[:, 2],
        jnp.minimum(out[:, 3], n - 1),
    )


def _unpack_pm1(a_ref) -> jnp.ndarray:
    """[TILE_M, 8] uint32 -> [TILE_M, 256] bfloat16 in {-1, +1}.

    Bit order matches ops.matching.signed_bits (word-major, LSB first) —
    irrelevant for the distance sum but kept consistent anyway.
    """
    tile_m = a_ref.shape[0]
    shifts = lax.broadcasted_iota(jnp.uint32, (1, 32), 1)
    cols = []
    for w in range(WORDS):
        aw = a_ref[:, w : w + 1]                       # [TILE_M, 1] uint32
        bits = (jnp.right_shift(aw, shifts)) & jnp.uint32(1)
        cols.append(bits)
    bits = jnp.concatenate(cols, axis=1)               # [TILE_M, 256]
    # Mosaic lacks uint32->float casts; values are 0/1 so a bitcast to
    # int32 is exact.
    bits_i = pltpu.bitcast(bits, jnp.int32)
    return (bits_i.astype(jnp.float32) * 2.0 - 1.0).astype(jnp.bfloat16)


def _projection_mxu_kernel(a_ref, ag_ref, bbits_ref, bg_ref, out_ref):
    """MXU variant: Hamming via +/-1 matmul on the systolic array.

    a_ref:     [TILE_M, 8] uint32 packed descriptors (unpacked in-kernel)
    bbits_ref: [256, N] bfloat16 +/-1 column-descriptor bits
    dist = (256 - A.B)/2 is integer-exact: +/-1 dot products are integers
    |.| <= 256, exactly representable in f32 accumulation.
    """
    n = bg_ref.shape[1]
    A = _unpack_pm1(a_ref)
    dot = jnp.dot(A, bbits_ref[:], preferred_element_type=jnp.float32)
    dist = (256.0 - dot) * 0.5

    u = ag_ref[:, 0:1]
    v = ag_ref[:, 1:2]
    r = ag_ref[:, 2:3]
    lo = ag_ref[:, 3:4]
    hi = ag_ref[:, 4:5]
    va = ag_ref[:, 5:6]
    x = bg_ref[0:1, :]
    y = bg_ref[1:2, :]
    oc = bg_ref[2:3, :]
    vb = bg_ref[3:4, :]
    mask = (
        (jnp.abs(u - x) <= r)
        & (jnp.abs(v - y) <= r)
        & (oc >= lo)
        & (oc <= hi)
        & (va > 0.0)
        & (vb > 0.0)
    )
    d = jnp.where(mask, dist.astype(jnp.int32), D_EMPTY)
    _top2_reduce(d, out_ref)


def _projection_kernel(a_ref, ag_ref, bT_ref, bg_ref, out_ref):
    """Fused SearchByProjection tile: mask built in-kernel.

    ag_ref: [TILE_M, 8] float32 rows (u, v, radius, oct_lo, oct_hi, valid, 0, 0)
    bg_ref: [4, N]      float32 rows (x, y, octave, valid)
    """
    n = bg_ref.shape[1]
    dist = _dist_tile(a_ref, bT_ref, n)

    u = ag_ref[:, 0:1]
    v = ag_ref[:, 1:2]
    r = ag_ref[:, 2:3]
    lo = ag_ref[:, 3:4]
    hi = ag_ref[:, 4:5]
    va = ag_ref[:, 5:6]
    x = bg_ref[0:1, :]
    y = bg_ref[1:2, :]
    oc = bg_ref[2:3, :]
    vb = bg_ref[3:4, :]

    mask = (
        (jnp.abs(u - x) <= r)
        & (jnp.abs(v - y) <= r)
        & (oc >= lo)
        & (oc <= hi)
        & (va > 0.0)
        & (vb > 0.0)
    )
    d = jnp.where(mask, dist, D_EMPTY)
    _top2_reduce(d, out_ref)


@functools.partial(jax.jit, static_argnames=("interpret", "mxu"))
def projection_hamming_top2(
    desc_a: jnp.ndarray,     # [M, 8] uint32
    proj: jnp.ndarray,       # [M, 2] projected pixel (u, v)
    radius: jnp.ndarray,     # [M] per-row window half-size
    oct_lo: jnp.ndarray,     # [M] inclusive octave band
    oct_hi: jnp.ndarray,     # [M]
    valid_a: jnp.ndarray,    # [M] bool
    desc_b: jnp.ndarray,     # [N, 8] uint32
    xy_b: jnp.ndarray,       # [N, 2] keypoint pixels
    octave_b: jnp.ndarray,   # [N] int
    valid_b: jnp.ndarray,    # [N] bool
    interpret: bool | None = None,
    mxu: bool = True,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """SearchByProjection's candidate gating fused into the distance+top-2
    kernel — no [M, N] intermediate exists in any memory space beyond one
    VMEM row-tile. Returns (best, best_idx, second, second_idx).

    mxu=True routes the Hamming distance through the systolic array
    (+/-1 bfloat16 matmul, integer-exact) instead of VPU popcount —
    measured ~4x faster at [1024, 1024] on TPU v5e.

    Oracle: src/ORBmatcher.cc:46-142 (window = th*sigma(octave), octave
    band, TH gating done by the caller).
    """
    if interpret is None:
        interpret = _interpret()
    m = desc_a.shape[0]
    n = desc_b.shape[0]
    mp, np_ = _round_up(max(m, 1), TILE_M), _round_up(max(n, 1), LANE)

    ag = jnp.zeros((mp, 8), jnp.float32)
    ag = ag.at[:m, 0:2].set(proj.astype(jnp.float32))
    ag = ag.at[:m, 2].set(radius.astype(jnp.float32))
    ag = ag.at[:m, 3].set(oct_lo.astype(jnp.float32))
    ag = ag.at[:m, 4].set(oct_hi.astype(jnp.float32))
    ag = ag.at[:m, 5].set(valid_a.astype(jnp.float32))

    bg = jnp.zeros((4, np_), jnp.float32)
    bg = bg.at[0, :n].set(xy_b[:, 0].astype(jnp.float32))
    bg = bg.at[1, :n].set(xy_b[:, 1].astype(jnp.float32))
    bg = bg.at[2, :n].set(octave_b.astype(jnp.float32))
    bg = bg.at[3, :n].set(valid_b.astype(jnp.float32))

    a = _pad_rows(desc_a, mp)

    if mxu:
        # +/-1 bit matrix for the systolic array; padded columns get the
        # b-validity 0 gate so their (wrong) distances never win.
        from orb_slam2_commit_tpu.ops.matching import signed_bits

        bbits = jnp.pad(
            signed_bits(desc_b).T.astype(jnp.bfloat16), ((0, 0), (0, np_ - n))
        )
        out = pl.pallas_call(
            _projection_mxu_kernel,
            grid=(mp // TILE_M,),
            in_specs=[
                pl.BlockSpec((TILE_M, WORDS), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE_M, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((256, np_), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((4, np_), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TILE_M, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((mp, 8), jnp.int32),
            interpret=interpret,
        )(a, ag, bbits, bg)
    else:
        bT = jnp.pad(desc_b.T, ((0, 0), (0, np_ - n)))
        out = pl.pallas_call(
            _projection_kernel,
            grid=(mp // TILE_M,),
            in_specs=[
                pl.BlockSpec((TILE_M, WORDS), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE_M, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((WORDS, np_), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((4, np_), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TILE_M, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((mp, 8), jnp.int32),
            interpret=interpret,
        )(a, ag, bT, bg)
    out = out[:m]
    return (
        out[:, 0],
        jnp.minimum(out[:, 1], n - 1),
        out[:, 2],
        jnp.minimum(out[:, 3], n - 1),
    )
