"""The spatio-temporal discriminator Dst.

Architecture parity with reference lib/Teco.py:30-74:

- input stage: conv3 -> 64 + lrelu(0.2), no batchnorm
- 4 blocks: conv4 stride 2 (no bias) + batchnorm (center only, eps 1e-3,
  always batch stats) + lrelu(0.2); channels 64, 64, 128, 256; each block's
  activation is recorded in ``layers`` for the feature-matching loss
  (reference Teco.py:280-313)
- head: channel-wise dense -> 1 (+bias) + sigmoid

Input is 27 channels for the merged Dst (9ch original triplet | 9ch warped
triplet | 9ch bicubic-upscaled LR triplet; reference Teco.py:233-247) or
9 channels for a pure temporal Dt.
"""

from __future__ import annotations

from typing import Any, List, Tuple

import flax.linen as nn
import jax.numpy as jnp

from tecogan_tpu.models.layers import SlimBatchNorm, conv2, lrelu, xavier_init


class Discriminator(nn.Module):
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)

        net = conv2(x, 64, 3, 1, name="input_stage_conv", **kw)
        net = lrelu(net, 0.2)

        layers = []
        # Reference scopes are disblock_1/3/5/7 (Teco.py:54-67); keep the
        # odd numbering for checkpoint-name compatibility.
        for idx, ch in zip((1, 3, 5, 7), (64, 64, 128, 256)):
            net = conv2(net, ch, 4, 2, use_bias=False, name=f"disblock_{idx}_conv", **kw)
            net = SlimBatchNorm(dtype=self.dtype, name=f"disblock_{idx}_bn")(net)
            net = lrelu(net, 0.2)
            layers.append(net)

        # Channel-wise dense layer (reference lib/ops.py:96-103): a Dense on
        # the last axis == 1x1 conv with bias.
        net = nn.Dense(
            features=1,
            kernel_init=xavier_init,
            name="dense",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(net)
        net = nn.sigmoid(net)
        return net, layers
