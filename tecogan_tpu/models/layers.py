"""Shared layer building blocks with reference-parity semantics.

Mirrors the conv wrappers of reference lib/ops.py:35-93 (slim.conv2d /
slim.conv2d_transpose with SAME padding and Xavier init, LeakyReLU, 2x2
VALID max-pool, slim batch_norm with decay 0.9 / eps 1e-3 / no scale).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

# slim uses tf.contrib.layers.xavier_initializer() == glorot uniform.
xavier_init = nn.initializers.glorot_uniform()


def conv2(
    x,
    features: int,
    kernel: int = 3,
    stride: int = 1,
    use_bias: bool = True,
    name: str = "conv",
    dtype: Any = None,
    param_dtype: Any = jnp.float32,
):
    """SAME conv, Xavier init (reference lib/ops.py:47-56)."""
    return nn.Conv(
        features=features,
        kernel_size=(kernel, kernel),
        strides=(stride, stride),
        padding="SAME",
        use_bias=use_bias,
        kernel_init=xavier_init,
        name=name,
        dtype=dtype,
        param_dtype=param_dtype,
    )(x)


#: Apply the column-folded narrow-output conv above this output pixel count.
#: In-context A/B on v5e: folding WINS at 2160x3840 (g=32: step 83.5 ->
#: 80.6 ms) but LOSES at 576x720 (any g: 5.19 -> 5.55+ ms/frame — the
#: strided-conv layout work outweighs the small N=3 conv there), so the
#: threshold sits between the two production sizes.
_FOLD_THRESHOLD_PIXELS = 2_000_000
_FOLD_GROUP = 32  # preferred group; _fold_group() adapts to the width


def _fold_group(w: int) -> int:
    """Largest fold group dividing ``w`` (0 = no fold possible).

    N = group*3 output channels: wider groups fill more MXU lanes
    (g=32 -> N=96; 1080p sweep in BASELINE.md), but the group must divide
    the row width (3840 -> 32, 720 -> 24)."""
    for g in (32, 24, 16, 8):
        if w % g == 0:
            return g
    return 0


#: Narrow-output conv strategy below the fold threshold:
#: "direct" = plain SAME conv (N=3 starves the MXU lanes: ~2.2 TF/s),
#: "tappack" = 1x1 conv to 9*features tap channels (one K=in_f, N=27
#: matmul) + 9 shifted adds. A/B'd in-scan via tools/headline_ablate.py.
_OUTCONV_SMALL_MODE = "direct"


def apply_output_conv(x, k, b):
    """SAME 3x3 conv with few output channels (the generator's 64->3 output
    stage): the N=features conv uses features/128 MXU output lanes —
    measured ~2.3 TF/s at 2160p (tools/trace_2160p.py), the single slowest
    op of the streaming step. Shared by :class:`NarrowOutputConv` and the
    pytree fast-path applies (models/generator.py).

    Large frames (> ``_FOLD_THRESHOLD_PIXELS``): column-folded form — a
    stride-(1, group) conv with a 3x(group+2) kernel whose blocks are
    shifted copies of the 3x3 kernel: every output pixel still sees exactly
    its own 3x3xC window (identical taps; bit-equal on TPU at group=8,
    within 1 bf16 ulp at wider groups where the im2col accumulation order
    differs — tools/gen_ablate.py), then a free reshape
    (W/group, 3*group) -> (W, 3). Saves ~6.7 ms/frame at 2160p.

    Small frames: ``_OUTCONV_SMALL_MODE`` picks plain conv or the
    tap-packed form (1 bf16-ulp-level accumulation-order difference: taps
    sum outside the conv's f32 accumulator).
    """
    bsz, h, w, in_f = x.shape
    features = k.shape[-1]
    g = _fold_group(w)
    if h * w > _FOLD_THRESHOLD_PIXELS and g:
        kw = jnp.zeros((3, g + 2, in_f, g * features), k.dtype)
        for j in range(g):
            kw = kw.at[:, j:j + 3, :, j * features:(j + 1) * features].set(k)
        out = lax.conv_general_dilated(
            x, kw, (1, g), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return out.reshape(bsz, h, w, features) + b
    if _OUTCONV_SMALL_MODE == "tappack":
        # One K=in_f, N=9*features matmul (1x1 conv), then each tap's
        # plane shifted into place: out[y,x] = sum_t Y_t[y+dy-1, x+dx-1].
        kt = k.transpose(2, 0, 1, 3).reshape(1, 1, in_f, 9 * features)
        y = lax.conv_general_dilated(
            x, kt, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        yp = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)))
        out = b.astype(y.dtype)
        for t in range(9):
            dy, dx = divmod(t, 3)
            out = out + lax.dynamic_slice(
                yp, (0, dy, dx, t * features),
                (bsz, h, w, features))
        return out
    out = lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + b


class NarrowOutputConv(nn.Module):
    """Flax wrapper over :func:`apply_output_conv`. Param layout matches
    ``nn.Conv`` (kernel (3,3,in,out), bias (out,)) so checkpoints are
    unaffected. Replaces reference lib/ops.py:47-56's slim conv at the
    generator output (frvsr.py:83).
    """

    features: int
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_f = x.shape[-1]
        k = self.param("kernel", xavier_init, (3, 3, in_f, self.features),
                       self.param_dtype)
        b = self.param("bias", nn.initializers.zeros_init(),
                       (self.features,), self.param_dtype)
        from flax.linen.dtypes import promote_dtype
        x, k, b = promote_dtype(x, k, b, dtype=self.dtype)
        return apply_output_conv(x, k, b)


def conv2_tran(
    x,
    features: int,
    kernel: int = 3,
    stride: int = 2,
    use_bias: bool = True,
    name: str = "conv_tran",
    dtype: Any = None,
    param_dtype: Any = jnp.float32,
):
    """SAME transposed conv matching ``tf.nn.conv2d_transpose`` semantics
    (reference lib/ops.py:35-44): defined as the adjoint of a SAME strided
    conv, so output spatial = input * stride exactly.
    """
    return nn.ConvTranspose(
        features=features,
        kernel_size=(kernel, kernel),
        strides=(stride, stride),
        padding="SAME",
        use_bias=use_bias,
        kernel_init=xavier_init,
        transpose_kernel=True,  # TF conv2d_transpose kernel convention
        name=name,
        dtype=dtype,
        param_dtype=param_dtype,
    )(x)


def lrelu(x, alpha: float = 0.2):
    """LeakyReLU (reference lib/ops.py:84-85)."""
    return jnp.where(x >= 0, x, alpha * x)


def maxpool_2x2(x):
    """2x2 stride-2 VALID max pool (reference lib/ops.py:92-93)."""
    return lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        lax.max,
        window_dimensions=(1, 2, 2, 1),
        window_strides=(1, 2, 2, 1),
        padding="VALID",
    )


class SlimBatchNorm(nn.Module):
    """slim.batch_norm parity: decay 0.9, eps 1e-3, center, no scale,
    always training-mode statistics (reference lib/ops.py:88-90; the
    discriminator is built with is_training=True unconditionally,
    reference Teco.py:38)."""

    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        return nn.BatchNorm(
            use_running_average=False,
            momentum=0.9,
            epsilon=1e-3,
            use_bias=True,
            use_scale=False,
            dtype=self.dtype,
            name="bn",
        )(x)


def prelu(x, alpha):
    """Parametric ReLU given a learned per-channel alpha
    (reference lib/ops.py prelu_tf; defined for parity, unused in the main
    TecoGAN path just as in the reference)."""
    pos = jnp.maximum(x, 0.0)
    neg = alpha * jnp.minimum(x, 0.0)
    return pos + neg


def pixel_shuffler(x, scale: int = 2):
    """Sub-pixel upscale (reference lib/ops.py pixelShuffler/phaseShift;
    defined for parity, unused in the main path). Channel order matches the
    reference's split-then-phaseShift construction."""
    b, h, w, c = x.shape
    co = c // (scale * scale)
    parts = [x[..., i * (scale * scale):(i + 1) * (scale * scale)]
             for i in range(co)]

    def phase_shift(p):
        p = p.reshape(b, h, w, scale, scale)
        p = p.transpose(0, 1, 3, 2, 4)
        return p.reshape(b, h * scale, w * scale, 1)

    return jnp.concatenate([phase_shift(p) for p in parts], axis=-1)
