"""Gaussian blur + 4x downsampling (HR -> LR) on device.

Replaces reference ``tf_data_gaussDownby4`` (lib/ops.py:347-367): a fixed
13x13 Gaussian kernel (sigma=1.5, k_w = 1 + 2*int(3*sigma)) applied as a
stride-4 VALID convolution per RGB channel. Implemented as a *separable*
depthwise conv (two rank-1 passes) — ~13x fewer MACs than the reference's
dense 13x13x3x3 conv, identical output.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np
from jax import lax


@functools.lru_cache(maxsize=None)
def _gaussian_window(size: int, sigma: float) -> np.ndarray:
    """Matches scipy.signal.gaussian (reference lib/ops.py:343)."""
    n = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    return np.exp(-0.5 * (n / sigma) ** 2)


def gaussian_kernel_2d(size: int, sigma: float) -> np.ndarray:
    """Normalized 2D Gaussian kernel; parity with reference lib/ops.py:339-345."""
    g1 = _gaussian_window(size, sigma).reshape(size, 1)
    g2 = np.outer(g1, g1)
    return g2 / g2.sum()


def gauss_down_by4(hr: jnp.ndarray, sigma: float = 1.5) -> jnp.ndarray:
    """Gaussian-blur + stride-4 VALID downsample of (B, H, W, C).

    Output spatial size is ``(H - k + 1 + 3) // 4`` with ``k = 1 + 2*int(3*sigma)``
    — for the canonical HR crop of ``4*crop + 2*int(3*sigma)`` this yields an
    LR frame of exactly ``crop`` (reference dataloader.py:279-280).
    """
    k_w = 1 + 2 * int(sigma * 3.0)
    g1 = _gaussian_window(k_w, sigma)
    g2sum = np.outer(g1, g1).sum()
    # Split the 2D normalisation across the two separable passes.
    g1n = g1 / np.sqrt(g2sum)

    c = hr.shape[-1]
    dtype = hr.dtype
    dn = lax.conv_dimension_numbers(hr.shape, (k_w, 1, 1, 1), ("NHWC", "HWIO", "NHWC"))

    # Vertical pass: stride 4 along H, VALID.
    kv = jnp.asarray(np.tile(g1n.reshape(k_w, 1, 1, 1), (1, 1, 1, c)), dtype=dtype)
    out = lax.conv_general_dilated(
        hr, kv, window_strides=(4, 1), padding="VALID",
        dimension_numbers=dn, feature_group_count=c,
    )
    # Horizontal pass: stride 4 along W, VALID.
    kh = jnp.asarray(np.tile(g1n.reshape(1, k_w, 1, 1), (1, 1, 1, c)), dtype=dtype)
    out = lax.conv_general_dilated(
        out, kh, window_strides=(1, 4), padding="VALID",
        dimension_numbers=dn, feature_group_count=c,
    )
    return out
