"""FNet: the optical-flow estimator of FRVSR/TecoGAN.

Architecture parity with reference lib/frvsr.py:4-41: a fully-convolutional
encoder-decoder over ``concat(LR_{t-1}, LR_t)`` (6 channels):

- 3 down blocks (conv3 + lrelu(0.2) twice, then 2x2 maxpool): 32/64/128 ch
- 3 up blocks  (conv3 + lrelu(0.2) twice, then 2x legacy-bilinear resize):
  256/128/64 ch
- output stage: conv3->32 + lrelu, conv3->2, ``tanh(.) * max_velocity``

The output flow is in LR-pixel units, bounded by ``max_velocity`` (24 px,
reference lib/frvsr.py:39-40), channel order (dy, dx) to feed
:func:`tecogan_tpu.ops.dense_image_warp` directly.

Input spatial dims need not be multiples of 8: like the reference inference
graph (main.py:188-190,212), the output is computed on the ``//8``-aligned
grid and symmetric-padded back — see :meth:`FNet.padded_output_size`.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from tecogan_tpu.models.layers import conv2, lrelu, maxpool_2x2
from tecogan_tpu.ops.resize import upscale_bilinear


class FNet(nn.Module):
    channels: Tuple[int, ...] = (32, 64, 128)
    up_channels: Tuple[int, ...] = (256, 128, 64)
    max_velocity: float = 24.0
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, H, W, 6) -> (B, H//8*8, W//8*8, 2) flow in LR pixels."""
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)

        def block(z, ch, name, up):
            z = conv2(z, ch, 3, 1, name=f"{name}_conv_1", **kw)
            z = lrelu(z, 0.2)
            z = conv2(z, ch, 3, 1, name=f"{name}_conv_2", **kw)
            z = lrelu(z, 0.2)
            return upscale_bilinear(z, 2) if up else maxpool_2x2(z)

        for i, ch in enumerate(self.channels):
            x = block(x, ch, f"encoder_{i + 1}", up=False)
        for i, ch in enumerate(self.up_channels):
            x = block(x, ch, f"decoder_{i + 1}", up=True)

        x = conv2(x, 32, 3, 1, name="output_conv1", **kw)
        x = lrelu(x, 0.2)
        x = conv2(x, 2, 3, 1, name="output_conv2", **kw)
        return jnp.tanh(x) * jnp.asarray(self.max_velocity, x.dtype)


def pad_flow_to(flow: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Symmetric-pad an FNet flow from the //8-aligned grid back to (h, w).

    Parity with reference main.py:188-190,212 (``tf.pad .. "SYMMETRIC"``).
    """
    fh, fw = flow.shape[1], flow.shape[2]
    if fh == h and fw == w:
        return flow
    return jnp.pad(
        flow, ((0, 0), (0, h - fh), (0, w - fw), (0, 0)), mode="symmetric"
    )
