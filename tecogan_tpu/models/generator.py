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

from tecogan_tpu.models.layers import NarrowOutputConv, conv2, conv2_tran
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
        if self.dtype is not None:
            # Cast at entry: the convs promote internally, but the bicubic
            # skip would otherwise promote the whole output back to the
            # input dtype — in bf16 training that silently made every HR
            # activation (and the Dst warp + its 76 ms scatter backward)
            # run in f32 (tools/trace_step.py train).
            x = x.astype(self.dtype)
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

        # Column-folded on large frames: N=3 starves the MXU (see
        # models/layers.py:NarrowOutputConv); params identical to conv2.
        net = NarrowOutputConv(features=self.out_channels,
                               name="output_stage_conv", **kw)(net)
        net = net + bicubic_four(lr)
        return preprocess(net)


def generator_apply_hr_input(params, lr, warped_hr, num_resblock: int = 16,
                             s2d_mode: str = "stride4"):
    """Generator forward consuming the RAW warped HR frame — the
    space-to-depth pack is folded into the input stage.

    ``s2d_mode="stride4"``: ``conv3x3(concat(lr, s2d(warped, 4)))`` equals
    ``conv3x3(lr-part) + conv12x12_stride4(warped)`` with the HR kernel
    built by scattering the 48 s2d input channels back to their HR offsets:
    ``k_hr[4*dy+r, 4*dx+s, c] = k[dy, dx, 3 + (r*4+s)*3 + c]`` (TF s2d
    channel order, reference main.py:201). This skips materializing the
    (B, H, W, 48) packed tensor and its lane-interleave transpose —
    measured ~4.7 ms/frame at 2160p (tools/trace_2160p.py).

    ``s2d_mode="patchify"``: the space-to-depth itself becomes a VALID
    4x4-stride-4 conv with a 0/1 selection kernel — the relayout runs
    through the MXU's native im2col instead of VPU lane-interleave
    transposes — followed by the module's own 3x3 51->64 conv (identical
    accumulation to the flax path; the patchify conv is exact: one 1.0 tap
    per output channel in an f32 accumulator).

    Used by both inference and the training unroll (the default
    ``train_fold_s2d="patchify"`` routes every train step through here);
    takes the SAME param tree as :class:`Generator`. Gradients through this
    path are equality-tested against the packed flax apply in
    tests/test_recurrent.py.

    Args:
      lr: (B, h, w, 3) LR frame in [0, 1].
      warped_hr: (B, 4h, 4w, 3) warped previous HR output in [0, 1].
    """
    p = params
    dtype = lr.dtype
    k = p["input_stage_conv"]["kernel"].astype(dtype)  # (3, 3, 51, 64)
    b = p["input_stage_conv"]["bias"].astype(dtype)
    if s2d_mode == "patchify":
        import numpy as np
        sel = np.zeros((4, 4, 3, 48), np.float32)
        for r in range(4):
            for s in range(4):
                for c in range(3):
                    sel[r, s, c, (r * 4 + s) * 3 + c] = 1.0
        with jax.named_scope("patchify_s2d_conv"):
            z = jax.lax.conv_general_dilated(
                warped_hr, jnp.asarray(sel, dtype), (4, 4), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        with jax.named_scope("input_stage_conv"):
            net = jax.lax.conv_general_dilated(
                jnp.concatenate([lr, z], axis=-1), k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        net = jax.nn.relu(net + b)
        return _generator_tail(p, net, lr, num_resblock)
    k_lr = k[:, :, :3, :]
    # (3, 3, 48, C) -> (3, 4, 4, 3, C) [dy, r, s, rgb] -> (12, 12, 3, C).
    k_hr = k[:, :, 3:, :].reshape(3, 3, 4, 4, 3, k.shape[-1])
    k_hr = k_hr.transpose(0, 2, 1, 3, 4, 5).reshape(12, 12, 3, k.shape[-1])
    with jax.named_scope("fold_input_lr_conv"):
        a = jax.lax.conv_general_dilated(
            lr, k_lr, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    with jax.named_scope("fold_input_hr_stride4_conv"):
        c = jax.lax.conv_general_dilated(
            warped_hr, k_hr, (4, 4), ((4, 4), (4, 4)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    net = jax.nn.relu(a + c + b)
    return _generator_tail(p, net, lr, num_resblock)


#: Upsample-stage strategy for the pytree fast paths: "direct" =
#: lax.conv_transpose (XLA input-dilation lowering), "phase" = the exact
#: four-phase decomposition (ops/convtran.py, zero wasted MACs). Isolated
#: benches showed phase LOSING at 540x960 (112 vs 53 ms — interleave layout
#: cost), but isolated benches mislead on this backend (CLAUDE.md); A/B'd
#: in-scan via tools/headline_ablate.py. Training keeps the flax module.
_CONVTRAN_MODE = "direct"


def _apply_conv_tran(p, name, v):
    """Shared stride-2 transposed conv for the pytree fast paths
    (flax ConvTranspose(transpose_kernel=True, SAME) param layout)."""
    k = p[name]["kernel"].astype(v.dtype)
    b = p[name]["bias"].astype(v.dtype)
    with jax.named_scope(name):
        if _CONVTRAN_MODE == "phase":
            from tecogan_tpu.ops.convtran import conv_transpose_s2_phase
            return conv_transpose_s2_phase(v, k, b, transpose_kernel=True)
        out = jax.lax.conv_transpose(
            v, k, (2, 2), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            transpose_kernel=True)
        return out + b


def _generator_tail(p, net, lr, num_resblock):
    """Trunk + upsample + output stages on the input-stage activation
    (shared by the fused-input forward paths; matches Generator.apply)."""
    dtype = net.dtype

    def conv(name, v):
        with jax.named_scope(name):
            k = p[name]["kernel"].astype(v.dtype)
            out = jax.lax.conv_general_dilated(
                v, k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return out + p[name]["bias"].astype(v.dtype)

    def conv_tran(name, v):
        return _apply_conv_tran(p, name, v)

    for i in range(1, num_resblock + 1):
        skip = net
        net = jax.nn.relu(conv(f"resblock_{i}_conv_1", net))
        net = conv(f"resblock_{i}_conv_2", net) + skip

    net = jax.nn.relu(conv_tran("conv_tran1", net))
    net = jax.nn.relu(conv_tran("conv_tran2", net))

    from tecogan_tpu.models.layers import apply_output_conv
    with jax.named_scope("output_stage_conv"):
        net = apply_output_conv(
            net, p["output_stage_conv"]["kernel"].astype(dtype),
            p["output_stage_conv"]["bias"].astype(dtype))
    net = net + bicubic_four(lr)
    return preprocess(net)


def generator_apply_plain(params, x, num_resblock: int = 16):
    """Pure-pytree replica of :class:`Generator`'s apply (XLA convs
    throughout; the upsample stage honors ``_CONVTRAN_MODE``).

    Exists so the transposed-conv strategy can be A/B'd inside the real
    streaming scan on geometries where the folded-input fast paths are
    inactive (2160p: ``fold_input_s2d`` auto is off there) — the flax module
    pins ``lax.conv_transpose`` and cannot switch. Takes the SAME param tree
    as :class:`Generator`; bit-identical to the flax apply at
    ``_CONVTRAN_MODE="direct"`` (tests/test_models.py).
    """
    p = params
    lr = x[..., :3]
    k = p["input_stage_conv"]["kernel"].astype(x.dtype)
    b = p["input_stage_conv"]["bias"].astype(x.dtype)
    with jax.named_scope("input_stage_conv"):
        net = jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    net = jax.nn.relu(net + b)
    return _generator_tail(p, net, lr, num_resblock)


def generator_apply_fused(params, x, num_resblock: int = 16):
    """Pure-pytree generator forward with the residual trunk fused into
    Pallas launches (kernels/resblocks.py pair-packed chain; whole-image in
    VMEM when it fits, row-banded otherwise — 38.2 vs 49.6 ms at 540x960
    bf16 against XLA's conv chain on v5e).

    Takes the SAME param tree as :class:`Generator` (checkpoint-compatible)
    and matches ``Generator.apply`` exactly up to the trunk's bf16 tap-
    summation order. Inference-only fast path — training uses the flax
    module (XLA convs batch efficiently at batch >= 4).
    """
    from tecogan_tpu.kernels.resblocks import resblock_chain_paired_auto

    lr = x[..., :3]
    p = params

    def conv(name, v, stride=1):
        k = p[name]["kernel"].astype(v.dtype)
        out = jax.lax.conv_general_dilated(
            v, k, (stride, stride), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return out + p[name]["bias"].astype(v.dtype)

    def conv_tran(name, v):
        # flax ConvTranspose(transpose_kernel=True, SAME): kernel (k,k,out,in).
        return _apply_conv_tran(p, name, v)

    net = jax.nn.relu(conv("input_stage_conv", x))

    w1 = jnp.stack([p[f"resblock_{i}_conv_1"]["kernel"]
                    for i in range(1, num_resblock + 1)]).astype(net.dtype)
    b1 = jnp.stack([p[f"resblock_{i}_conv_1"]["bias"]
                    for i in range(1, num_resblock + 1)]).astype(net.dtype)
    w2 = jnp.stack([p[f"resblock_{i}_conv_2"]["kernel"]
                    for i in range(1, num_resblock + 1)]).astype(net.dtype)
    b2 = jnp.stack([p[f"resblock_{i}_conv_2"]["bias"]
                    for i in range(1, num_resblock + 1)]).astype(net.dtype)
    net = resblock_chain_paired_auto(net, w1, b1, w2, b2)

    net = jax.nn.relu(conv_tran("conv_tran1", net))
    net = jax.nn.relu(conv_tran("conv_tran2", net))
    # Same narrow-output conv strategy as the flax module.
    from tecogan_tpu.models.layers import apply_output_conv
    net = apply_output_conv(
        net, p["output_stage_conv"]["kernel"].astype(net.dtype),
        p["output_stage_conv"]["bias"].astype(net.dtype))
    net = net + bicubic_four(lr)
    return preprocess(net)
