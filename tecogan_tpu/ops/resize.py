"""Integer-factor image resizing with TF1-exact semantics.

The reference relies on three resize flavours whose *exact* semantics matter
for output parity (SURVEY.md §7 "hard parts"):

- ``upscale_four`` (reference lib/ops.py:126-163): hand-rolled 4x bilinear
  matching TF1 ``resize_images`` with ``align_corners=False`` and integer-only
  source coordinates ``src = dst / factor`` (no half-pixel offset), with edge
  replication. Used to upscale LR flow fields to HR.
- ``tf.image.resize_images`` 2x bilinear inside fnet's decoder
  (reference lib/frvsr.py:22) and 4x in the Dst LR-upsample path
  (reference lib/Teco.py:244) — same legacy semantics, different factors.
- ``bicubic_four`` (reference lib/ops.py:166-212): separable Catmull-Rom
  (r=0.75) 4x bicubic with 1px top/left + 2px bottom/right edge-replication
  padding; the generator's residual skip.

All three are expressed here as small stacks of einsums over statically
shifted views, which XLA fuses into a handful of vectorized VPU passes —
no gathers, no dynamic shapes.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _bilinear_phase_weights(factor: int) -> np.ndarray:
    """Per-phase blend weights for legacy TF bilinear upscaling.

    Output pixel ``f*i + p`` samples source coordinate ``i + p/f``; the weight
    on source row ``i`` is ``1 - p/f`` and on ``i+1`` is ``p/f``.
    Returns array of shape (factor, 2).
    """
    t = np.arange(factor, dtype=np.float64) / factor
    return np.stack([1.0 - t, t], axis=1)


def upscale_bilinear(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Legacy TF1 bilinear upscale (align_corners=False, src = dst/f).

    Bit-matches reference ``upscale_four`` (lib/ops.py:126-163) at factor=4
    and TF1 ``tf.image.resize_images`` default bilinear at any integer factor.

    Args:
      x: (B, H, W, C) array.
      factor: integer upscaling factor.

    Returns:
      (B, H*factor, W*factor, C) array, same dtype as ``x`` (computed in its
      dtype; weights are cast to match).
    """
    b, h, w, c = x.shape
    # Edge-replicated +1 views: corners[a][d] is the source pixel at
    # (i+a, j+d) with clamping at the bottom/right border.
    x_r = jnp.concatenate([x[:, :, 1:], x[:, :, -1:]], axis=2)     # (i, j+1)
    x_d = jnp.concatenate([x[:, 1:], x[:, -1:]], axis=1)           # (i+1, j)
    x_dr = jnp.concatenate([x_d[:, :, 1:], x_d[:, :, -1:]], axis=2)
    corners = jnp.stack(
        [jnp.stack([x, x_r], axis=0), jnp.stack([x_d, x_dr], axis=0)], axis=0
    )  # (2[dy], 2[dx], B, H, W, C)

    wp = _bilinear_phase_weights(factor)
    wgt = np.einsum("pa,qd->pqad", wp, wp)  # (f, f, 2, 2)
    wgt_j = jnp.asarray(wgt, dtype=x.dtype)

    out = jnp.einsum(
        "pqad,adbhwc->bhpwqc", wgt_j, corners, precision="highest"
    )
    return out.reshape(b, h * factor, w * factor, c)


def upscale_four(x: jnp.ndarray) -> jnp.ndarray:
    """4x bilinear upscale; parity with reference lib/ops.py:126-163."""
    return upscale_bilinear(x, 4)


@functools.lru_cache(maxsize=None)
def _catmull_rom_weights() -> np.ndarray:
    """4-phase Catmull-Rom (r=0.75) weights; reference lib/ops.py:186-188."""
    r = 0.75
    mat = np.array(
        [
            [0, 1, 0, 0],
            [-r, 0, r, 0],
            [2 * r, r - 3, 3 - 2 * r, -r],
            [-r, 2 - r, r - 2, r],
        ],
        dtype=np.float64,
    )
    return np.stack(
        [np.array([1.0, t, t * t, t * t * t]) @ mat for t in (0.0, 0.25, 0.5, 0.75)]
    )  # (4 phases, 4 taps)


def bicubic_four(x: jnp.ndarray) -> jnp.ndarray:
    """4x Catmull-Rom bicubic upscale; parity with reference lib/ops.py:166-212.

    Separable rows-then-cols filtering over an edge-replicated pad of
    1px (top/left) and 2px (bottom/right), identical to TF1's
    ``resize_bicubic(align_corners=False)`` at a fixed 4x ratio.
    """
    b, h, w, c = x.shape
    # Pad: top 1, left 1, bottom 2, right 2, edge replicate.
    p = jnp.concatenate([x[:, :1], x, x[:, -1:], x[:, -1:]], axis=1)
    p = jnp.concatenate([p[:, :, :1], p, p[:, :, -1:], p[:, :, -1:]], axis=2)
    # p: (B, H+3, W+3, C)

    wgt = jnp.asarray(_catmull_rom_weights(), dtype=x.dtype)  # (4, 4)

    # Height pass over padded width.
    rows = jnp.stack([p[:, k : k + h] for k in range(4)], axis=0)  # (4,B,H,W+3,C)
    hi_y = jnp.einsum("pk,kbhwc->bhpwc", wgt, rows, precision="highest")
    hi_y = hi_y.reshape(b, h * 4, w + 3, c)

    # Width pass.
    cols = jnp.stack([hi_y[:, :, k : k + w] for k in range(4)], axis=0)
    hi = jnp.einsum("pk,kbhwc->bhwpc", wgt, cols, precision="highest")
    return hi.reshape(b, h * 4, w * 4, c)
