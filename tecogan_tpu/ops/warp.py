"""Dense backward image warping by a flow field (TF-exact semantics).

The single most important kernel of the framework (SURVEY.md §2.2): the
recurrent step warps the previous HR output toward the current frame once per
frame, and training additionally warps LR frames (fnet warp loss) and the
discriminator input triplets. Replaces ``tf.contrib.image.dense_image_warp``
(used at reference main.py:215, Teco.py:120-122,140-141,224,254).

Semantics (bit-matching TF's `_interpolate_bilinear`):
  output[b, y, x, c] = bilinear_sample(image[b], y - flow[b,y,x,0],
                                                 x - flow[b,y,x,1], c)
with, per axis: floor coordinates clamped into [0, size-2] *before* the
fractional weight is computed, and the fraction clamped into [0, 1]. This
gives edge-clamp behaviour for out-of-range queries.

Implementation notes (TPU): the sample is expressed as one flattened-index
gather of the 4 corner stencil via ``jnp.take_along_axis`` — XLA lowers this
to a single dynamic-gather per corner that stays on-chip. Gradients (needed
for training: warp loss drives fnet, and the recurrent warp backpropagates
through time) come for free via gather's scatter-add transpose. A fused
Pallas kernel for the inference hot path lives in
:mod:`tecogan_tpu.ops.warp_pallas`.
"""

from __future__ import annotations

import jax.numpy as jnp


def dense_image_warp(image: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Backward-warp ``image`` by ``flow`` ((dy, dx) channel order).

    Args:
      image: (B, H, W, C).
      flow: (B, H, W, 2); the sampled location is ``grid - flow``.

    Returns:
      (B, H, W, C) warped image, dtype of ``image``.
    """
    b, h, w, c = image.shape
    dtype = image.dtype
    flow = flow.astype(dtype)

    grid_y = jnp.arange(h, dtype=dtype)[None, :, None]
    grid_x = jnp.arange(w, dtype=dtype)[None, None, :]
    qy = grid_y - flow[..., 0]  # (B, H, W)
    qx = grid_x - flow[..., 1]

    fy = jnp.clip(jnp.floor(qy), 0.0, h - 2)
    fx = jnp.clip(jnp.floor(qx), 0.0, w - 2)
    ay = jnp.clip(qy - fy, 0.0, 1.0)[..., None]
    ax = jnp.clip(qx - fx, 0.0, 1.0)[..., None]

    iy = fy.astype(jnp.int32)
    ix = fx.astype(jnp.int32)

    flat = image.reshape(b, h * w, c)
    base = iy * w + ix  # (B, H, W)

    def gather(idx):
        g = jnp.take_along_axis(flat, idx.reshape(b, h * w, 1), axis=1)
        return g.reshape(b, h, w, c)

    tl = gather(base)
    tr = gather(base + 1)
    bl = gather(base + w)
    br = gather(base + w + 1)

    top = tl + (tr - tl) * ax
    bot = bl + (br - bl) * ax
    return top + (bot - top) * ay
