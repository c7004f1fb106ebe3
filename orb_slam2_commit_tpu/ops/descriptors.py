"""Keypoint orientation (intensity centroid) + rotated BRIEF descriptors.

TPU-native replacement for the reference's IC_Angle + computeOrbDescriptor
(reference: src/ORBextractor.cc:77-152). Both are formulated as batched
patch gathers over the whole keypoint set — no per-keypoint loops.

The 256-pair sampling pattern is NOT the reference's learned table
(src/ORBextractor.cc:155-413); it is generated deterministically from the
original BRIEF recipe (isotropic Gaussian, sigma = patch/5, fixed seed).
Descriptors only ever match against descriptors from this same engine (the
vocabulary is trained on them too), so internal consistency is what
matters, not bit-compatibility with OpenCV.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

HALF_PATCH_SIZE = 15
PATCH_SIZE = 31
N_BITS = 256
N_WORDS = 8  # 256 bits packed into 8 x uint32

# BRIEF steering quantization: angles snap to N_ANGLE_BINS bin centers
# before computing rotated sample offsets (the original ORB paper's 12
# degree lookup-table discretization, here 11.25 degrees). This makes the
# rotation a selection over a static per-bin offset table, which the TPU
# route turns into MXU matmuls; the CPU route uses the same table so
# descriptors are identical across routes.
N_ANGLE_BINS = 32
BRIEF_HALF = 19     # max |rotated offset| = ceil(13 * sqrt(2)) = 19
BRIEF_PATCH = 39


@functools.lru_cache()
def circular_umax() -> np.ndarray:
    """Max |x| per |y| row of the radius-15 circular patch, symmetric in the
    same way as the reference ctor (src/ORBextractor.cc:470-489)."""
    hp = HALF_PATCH_SIZE
    umax = np.zeros(hp + 2, dtype=np.int32)
    vmax = int(np.floor(hp * np.sqrt(2.0) / 2 + 1))
    vmin = int(np.ceil(hp * np.sqrt(2.0) / 2))
    for v in range(vmax + 1):
        umax[v] = int(round(np.sqrt(hp * hp - v * v)))
    v0 = 0
    for v in range(hp, vmin - 1, -1):
        while umax[v0] == umax[v0 + 1]:
            v0 += 1
        umax[v] = v0
        v0 += 1
    return umax[: hp + 1]


@functools.lru_cache()
def _circular_mask() -> np.ndarray:
    """[31, 31] 0/1 mask of the intensity-centroid patch."""
    umax = circular_umax()
    mask = np.zeros((PATCH_SIZE, PATCH_SIZE), dtype=np.float32)
    for dy in range(-HALF_PATCH_SIZE, HALF_PATCH_SIZE + 1):
        u = umax[abs(dy)]
        mask[dy + HALF_PATCH_SIZE, HALF_PATCH_SIZE - u : HALF_PATCH_SIZE + u + 1] = 1.0
    return mask


@functools.lru_cache()
def brief_pattern() -> np.ndarray:
    """[256, 2, 2] int32 sampling pairs ((x0, y0), (x1, y1)).

    Deterministic BRIEF-style pattern: Gaussian(0, patch/5) offsets clipped
    to +/-13, seeded RNG, duplicate pairs rejected.
    """
    rng = np.random.default_rng(20260817)
    sigma = PATCH_SIZE / 5.0
    pairs = []
    seen = set()
    while len(pairs) < N_BITS:
        p = np.clip(np.round(rng.normal(0.0, sigma, size=4)), -13, 13).astype(np.int32)
        key = tuple(p)
        if key in seen or (p[0] == p[2] and p[1] == p[3]):
            continue
        seen.add(key)
        pairs.append(p)
    return np.asarray(pairs, dtype=np.int32).reshape(N_BITS, 2, 2)


def gather_patches(
    image: jnp.ndarray, yx: jnp.ndarray, half: int = HALF_PATCH_SIZE
) -> jnp.ndarray:
    """Gather [N, 2*half+1, 2*half+1] patches centered at integer yx[N, 2]."""
    h, w = image.shape
    size = 2 * half + 1
    dy = jnp.arange(-half, half + 1)
    dx = jnp.arange(-half, half + 1)
    ys = jnp.clip(yx[:, 0, None] + dy[None, :], 0, h - 1)  # [N, size]
    xs = jnp.clip(yx[:, 1, None] + dx[None, :], 0, w - 1)
    flat = ys[:, :, None] * w + xs[:, None, :]  # [N, size, size]
    return jnp.take(image.reshape(-1), flat.reshape(-1), axis=0).reshape(
        -1, size, size
    )


def _moment_maps(image: jnp.ndarray):
    """Dense (m10, m01) intensity-moment maps of the circular patch.

    Decomposes the 31x31 circular-masked correlation into horizontal
    weighted/box row sums (one per distinct circle half-width) followed by
    vertical shifted accumulation — a few hundred fusable elementwise ops
    on the VPU instead of a large-kernel conv (which XLA lowers poorly) or
    961-element per-keypoint gathers (which the TPU hates).
    """
    umax = circular_umax()                       # half-width per |dy|
    distinct_u = sorted(set(int(u) for u in umax))
    hp = HALF_PATCH_SIZE

    # Horizontal phase: for each distinct half-width u, the weighted sum
    # sum_dx dx*I(y, x+dx) and box sum sum_dx I(y, x+dx) over |dx| <= u.
    acc_w = {u: jnp.zeros_like(image) for u in distinct_u}
    acc_b = {u: jnp.zeros_like(image) for u in distinct_u}
    for dx in range(-hp, hp + 1):
        s = jnp.roll(image, -dx, axis=1)
        for u in distinct_u:
            if abs(dx) <= u:
                if dx != 0:
                    acc_w[u] = acc_w[u] + float(dx) * s
                acc_b[u] = acc_b[u] + s

    # Vertical phase.
    m10 = jnp.zeros_like(image)
    m01 = jnp.zeros_like(image)
    for dy in range(-hp, hp + 1):
        u = int(umax[abs(dy)])
        m10 = m10 + jnp.roll(acc_w[u], -dy, axis=0)
        if dy != 0:
            m01 = m01 + float(dy) * jnp.roll(acc_b[u], -dy, axis=0)
    return m10, m01


def ic_angle(image: jnp.ndarray, yx: jnp.ndarray) -> jnp.ndarray:
    """Intensity-centroid orientation, radians in (-pi, pi].

    Oracle: IC_Angle (src/ORBextractor.cc:77-105): m10 = sum x*I,
    m01 = sum y*I over the circular patch; angle = atan2(m01, m10).

    TPU formulation: moments for EVERY pixel via shift-decomposed dense
    sums, then only N scalars gathered at the keypoints — dense compute
    beats 961-element per-keypoint gathers on TPU.
    """
    h, w = image.shape
    m10_map, m01_map = _moment_maps(image)
    ys = jnp.clip(yx[:, 0], 0, h - 1)
    xs = jnp.clip(yx[:, 1], 0, w - 1)
    flat = ys * w + xs
    m10 = jnp.take(m10_map.reshape(-1), flat)
    m01 = jnp.take(m01_map.reshape(-1), flat)
    return jnp.arctan2(m01, m10)


def angle_bin(angle: jnp.ndarray) -> jnp.ndarray:
    """Quantize radians in (-pi, pi] to one of N_ANGLE_BINS bins."""
    w = 2.0 * np.pi / N_ANGLE_BINS
    return (
        jnp.floor((angle + np.pi) / w).astype(jnp.int32) % N_ANGLE_BINS
    )


@functools.lru_cache()
def binned_offsets() -> np.ndarray:
    """[N_ANGLE_BINS, 256, 2, 2] int32 steered sample offsets (oy, ox) per
    bin center, computed once in float64 so every route shares the exact
    same integer table."""
    pattern = brief_pattern()                       # [256, 2, 2] (x, y)
    out = np.zeros((N_ANGLE_BINS, N_BITS, 2, 2), np.int32)
    for b in range(N_ANGLE_BINS):
        th = (b + 0.5) * 2.0 * np.pi / N_ANGLE_BINS - np.pi
        ca, sa = np.cos(th), np.sin(th)
        px = pattern[..., 0].astype(np.float64)     # [256, 2]
        py = pattern[..., 1].astype(np.float64)
        ox = np.round(px * ca - py * sa).astype(np.int32)
        oy = np.round(px * sa + py * ca).astype(np.int32)
        out[b, ..., 0] = oy
        out[b, ..., 1] = ox
    assert np.abs(out).max() <= BRIEF_HALF
    return out


@functools.lru_cache()
def _selection_matrices() -> np.ndarray:
    """[N_ANGLE_BINS, BRIEF_PATCH**2, 512] one-hot bf16: column 2j+k picks
    patch pixel at the bin's steered offset for pattern point (j, k)."""
    offs = binned_offsets()
    psq = BRIEF_PATCH * BRIEF_PATCH
    S = np.zeros((N_ANGLE_BINS, psq, 2 * N_BITS), np.float32)
    for b in range(N_ANGLE_BINS):
        oy = offs[b, ..., 0] + BRIEF_HALF           # [256, 2]
        ox = offs[b, ..., 1] + BRIEF_HALF
        cols = np.arange(2 * N_BITS)
        S[b, (oy * BRIEF_PATCH + ox).reshape(-1), cols] = 1.0
    return S


N_RESIDUAL_BINS = N_ANGLE_BINS // 4


@functools.lru_cache()
def _residual_selection_matrices() -> np.ndarray:
    """[N_ANGLE_BINS//4, BRIEF_PATCH**2, 512] selection matrices for the
    quadrant-decomposed BRIEF route.

    Steering by bin b = q*(B/4) + r factors as R(90 deg)^q . R(theta_r):
    a 90-degree rotation maps the integer offset lattice onto itself and
    np.round is odd-symmetric, so round(R(theta_b) p) ==
    R90^q round(R(theta_r) p) EXACTLY. The matmul therefore only needs the
    B/4 residual bins; the quadrant becomes a flip/transpose of the patch
    (vector ops), cutting the one-hot MXU contraction 4x."""
    offs = binned_offsets()
    # Safety: verify the exact-factorization identity for every bin.
    for b in range(N_ANGLE_BINS):
        q, r = divmod(b, N_RESIDUAL_BINS)
        v = offs[r].astype(np.int64)                # [256, 2, 2] (oy, ox)
        for _ in range(q):                          # apply R90: (y,x)->(x,-y)
            v = np.stack([v[..., 1], -v[..., 0]], axis=-1)
        assert np.array_equal(v, offs[b]), b
    return _selection_matrices()[:N_RESIDUAL_BINS]


def _pack_bits(vals: jnp.ndarray) -> jnp.ndarray:
    """[N, 256, 2] sampled pairs -> [N, 8] uint32 (bit = v0 < v1)."""
    bits = (vals[..., 0] < vals[..., 1]).astype(jnp.uint32)
    bits = bits.reshape(-1, N_WORDS, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(bits << shifts[None, None, :], axis=-1, dtype=jnp.uint32)


def brief_descriptors(
    blurred: jnp.ndarray, yx: jnp.ndarray, angle: jnp.ndarray
) -> jnp.ndarray:
    """Rotation-steered BRIEF, packed [N, 8] uint32.

    Oracle: computeOrbDescriptor (src/ORBextractor.cc:110-152): each pattern
    point p is steered to (round(px*cos - py*sin), round(px*sin + py*cos))
    and bit i = I(p0) < I(p1). Steering uses the binned-angle offset table
    (see N_ANGLE_BINS) so the gather (CPU) and patch-matmul (TPU) routes
    produce identical bits.
    """
    h, w = blurred.shape
    offs = jnp.asarray(binned_offsets())            # [B, 256, 2, 2]
    off = offs[angle_bin(angle)]                    # [N, 256, 2, 2]
    off_y, off_x = off[..., 0], off[..., 1]

    ys = jnp.clip(yx[:, 0, None, None] + off_y, 0, h - 1)
    xs = jnp.clip(yx[:, 1, None, None] + off_x, 0, w - 1)
    flat = (ys * w + xs).reshape(-1)
    vals = jnp.take(blurred.reshape(-1), flat, axis=0).reshape(-1, N_BITS, 2)
    return _pack_bits(vals)


@functools.lru_cache()
def _moment_weights() -> Tuple[np.ndarray, np.ndarray]:
    """[31, 31] dx- and dy-weight maps of the circular IC patch."""
    mask = _circular_mask()
    d = np.arange(-HALF_PATCH_SIZE, HALF_PATCH_SIZE + 1, dtype=np.float32)
    w10 = mask * d[None, :]   # weight = dx
    w01 = mask * d[:, None]   # weight = dy
    return w10, w01


def ic_angle_patches(image: jnp.ndarray, yx: jnp.ndarray) -> jnp.ndarray:
    """TPU route for ic_angle: Pallas patch extraction + two weighted
    reductions, replacing the dense whole-image moment maps (same math,
    different summation order -> float-level differences only)."""
    from orb_slam2_commit_tpu.ops import pallas_patches

    P = pallas_patches.extract_patches(image, yx, PATCH_SIZE)
    return ic_angle_from_patches(P)


def ic_angle_from_patches(P: jnp.ndarray) -> jnp.ndarray:
    """IC angle from pre-gathered patches [N, >=PATCH_SIZE, >=PATCH_SIZE]
    (keypoint at (PATCH_SIZE//2, PATCH_SIZE//2)); lets callers share one
    patch gather across orientation + subpixel refinement."""
    w10, w01 = _moment_weights()
    wpad = np.zeros((2,) + P.shape[1:], np.float32)
    wpad[0, :PATCH_SIZE, :PATCH_SIZE] = w10
    wpad[1, :PATCH_SIZE, :PATCH_SIZE] = w01
    m = jnp.einsum("npq,wpq->nw", P, jnp.asarray(wpad))
    return jnp.arctan2(m[:, 1], m[:, 0])


def use_patch_route() -> bool:
    """Pallas patch-kernel route for orientation/BRIEF? Default: on for
    TPU backends, off on CPU (where the XLA gather is fine and Pallas
    runs interpreted). Override with ORB_TPU_FORCE_PATCHES=0/1."""
    import os

    v = os.environ.get("ORB_TPU_FORCE_PATCHES")
    if v is not None:
        return v == "1"
    return jax.default_backend() != "cpu"


def brief_descriptors_patches(
    blurred: jnp.ndarray, yx: jnp.ndarray, angle: jnp.ndarray
) -> jnp.ndarray:
    """TPU route: Pallas patch extraction + per-bin one-hot matmuls on the
    MXU instead of 512 scalar gathers per keypoint. Bit-identical to
    brief_descriptors for in-bounds keypoints (>= BRIEF_HALF from the
    image border, which the extractor's detection border guarantees).
    """
    from orb_slam2_commit_tpu.ops import pallas_patches

    P = pallas_patches.extract_patches(blurred, yx, BRIEF_PATCH)
    P = P[:, :BRIEF_PATCH, :BRIEF_PATCH]
    b = angle_bin(angle)
    q = b // N_RESIDUAL_BINS
    r = b % N_RESIDUAL_BINS
    # Quadrant pre-rotation (see _residual_selection_matrices): Prot_q is
    # the patch resampled along R90^q, so selecting residual-bin offsets
    # from it reads exactly the full-bin offsets of the original patch.
    P1 = jnp.flip(jnp.swapaxes(P, 1, 2), axis=1)    # Patch[ix, 38-iy]
    P2 = jnp.flip(P, axis=(1, 2))                   # Patch[38-iy, 38-ix]
    P3 = jnp.flip(jnp.swapaxes(P, 1, 2), axis=2)    # Patch[38-ix, iy]
    qf = q[:, None, None]
    Prot = jnp.where(
        qf == 0, P, jnp.where(qf == 1, P1, jnp.where(qf == 2, P2, P3))
    )
    Prot = Prot.reshape(Prot.shape[0], -1)
    S = jnp.asarray(_residual_selection_matrices())  # [B/4, PSQ, 512]
    oh = jax.nn.one_hot(r, N_RESIDUAL_BINS, dtype=jnp.float32)
    # One-hot selection matmul: keeping the patch operand in f32 makes the
    # "sampling" exact (bf16 patches would flip borderline comparisons).
    vals = jnp.einsum(
        "np,bps,nb->ns", Prot, S, oh,
        preferred_element_type=jnp.float32,
    )
    return _pack_bits(vals.reshape(-1, N_BITS, 2))


def unpack_bits(desc: jnp.ndarray) -> jnp.ndarray:
    """[N, 8] uint32 -> [N, 256] 0/1 (bit i of word j -> column 32*j + i)."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (desc[:, :, None] >> shifts[None, None, :]) & jnp.uint32(1)
    return bits.reshape(desc.shape[0], N_BITS)
