"""Space-to-depth / depth-to-space, matching ``tf.space_to_depth`` ordering.

The recurrent generator packs the warped previous HR output
(B, 4h, 4w, 3) into (B, h, w, 48) before concatenating with the LR frame
(reference main.py:201 uses ``tf.space_to_depth``; reference lib/Teco.py:145-148
builds the same permutation by hand with reshape/transpose — both produce
channel order ``(block_row, block_col, channel)``).
"""

from __future__ import annotations

import jax.numpy as jnp


def space_to_depth(x: jnp.ndarray, block: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/b, W/b, b*b*C) with TF channel ordering."""
    b, h, w, c = x.shape
    assert h % block == 0 and w % block == 0, (h, w, block)
    x = x.reshape(b, h // block, block, w // block, block, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // block, w // block, block * block * c)


def depth_to_space(x: jnp.ndarray, block: int) -> jnp.ndarray:
    """Inverse of :func:`space_to_depth`."""
    b, h, w, c = x.shape
    assert c % (block * block) == 0, (c, block)
    co = c // (block * block)
    x = x.reshape(b, h, w, block, block, co)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h * block, w * block, co)
