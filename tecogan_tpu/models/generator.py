"""The recurrent 4x super-resolution generator (FRVSR G).

Architecture parity with reference lib/frvsr.py:44-88:

- input: LR frame (3ch) concat space-to-depth(warped previous HR, 4) (48ch)
  = 51 channels, values in [0, 1]
- conv3 -> 64 + ReLU (input stage)
- ``num_resblock`` residual blocks (conv3-64-ReLU, conv3-64, + skip);
  16 for TecoGAN, 10 for FRVSR / TecoGAN-mini (reference runGan.py:86,161,269)
- 2 x (transposed conv3 stride 2 -> 64 + ReLU) = 4x upsample
- conv3 -> 3 output stage
- + ``bicubic_four`` of the LR frame (residual skip, reference frvsr.py:85-86)
- ``preprocess``: output mapped to [-1, 1] (reference frvsr.py:87)
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from tecogan_tpu.models.layers import conv2, conv2_tran
from tecogan_tpu.ops.image import preprocess
from tecogan_tpu.ops.resize import bicubic_four


class Generator(nn.Module):
    num_resblock: int = 16
    channels: int = 64
    out_channels: int = 3
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, H, W, 51) in [0,1] -> (B, 4H, 4W, 3) in [-1, 1]."""
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        lr = x[..., : self.out_channels]  # LR frame for the bicubic skip

        net = conv2(x, self.channels, 3, 1, name="input_stage_conv", **kw)
        net = jax.nn.relu(net)

        for i in range(1, self.num_resblock + 1):
            skip = net
            net = conv2(net, self.channels, 3, 1, name=f"resblock_{i}_conv_1", **kw)
            net = jax.nn.relu(net)
            net = conv2(net, self.channels, 3, 1, name=f"resblock_{i}_conv_2", **kw)
            net = net + skip

        net = conv2_tran(net, self.channels, 3, 2, name="conv_tran1", **kw)
        net = jax.nn.relu(net)
        net = conv2_tran(net, self.channels, 3, 2, name="conv_tran2", **kw)
        net = jax.nn.relu(net)

        net = conv2(net, self.out_channels, 3, 1, name="output_stage_conv", **kw)
        net = net + bicubic_four(lr)
        return preprocess(net)
