"""Image pyramid + Gaussian blur.

TPU-native replacement for the reference's ComputePyramid + GaussianBlur
(reference: src/ORBextractor.cc:1215-1250, blur at :1190). Level shapes are
static (computed from the config at trace time), resizing is bilinear via
jax.image, and the 7x7 sigma=2 blur is a separable depthwise convolution.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def gaussian_kernel_1d(size: int = 7, sigma: float = 2.0) -> np.ndarray:
    """Normalized 1-D Gaussian taps (matches cv::GaussianBlur(7,7,2,2))."""
    half = (size - 1) / 2.0
    x = np.arange(size) - half
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(image: jnp.ndarray, size: int = 7, sigma: float = 2.0) -> jnp.ndarray:
    """Separable Gaussian blur of image[H, W] with reflect padding
    (cv::BORDER_REFLECT_101 equivalent)."""
    taps = jnp.asarray(gaussian_kernel_1d(size, sigma), dtype=image.dtype)
    pad = size // 2
    # Horizontal pass.
    x = jnp.pad(image, ((0, 0), (pad, pad)), mode="reflect")
    x = sum(taps[i] * x[:, i : i + image.shape[1]] for i in range(size))
    # Vertical pass.
    x = jnp.pad(x, ((pad, pad), (0, 0)), mode="reflect")
    x = sum(taps[i] * x[i : i + image.shape[0], :] for i in range(size))
    return x


def resize_bilinear(image: jnp.ndarray, out_shape: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize (cv::resize INTER_LINEAR equivalent)."""
    return jax.image.resize(image, out_shape, method="linear")


def build_pyramid(
    image: jnp.ndarray, level_shapes: Tuple[Tuple[int, int], ...]
) -> Tuple[jnp.ndarray, ...]:
    """Build the scale pyramid. image[H, W] float32, level 0 = input.

    The reference resizes level-to-level from the previous level
    (src/ORBextractor.cc:1228-1236); chained bilinear from the previous level
    is what we do too, for comparable anti-aliasing behavior.
    """
    levels = [image]
    for shape in level_shapes[1:]:
        levels.append(resize_bilinear(levels[-1], shape))
    return tuple(levels)
