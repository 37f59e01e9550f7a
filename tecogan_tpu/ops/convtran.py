"""Phase-decomposed stride-2 transposed convolution (exact rewrite).

XLA lowers ``lax.conv_transpose`` on TPU via input dilation: the input is
zero-interleaved to the output grid and a full 3x3 conv runs at output
resolution — 4x of the useful MACs multiply zeros (measured ~5-7 TF/s
useful on v5e at the generator's upsample stages, tools/conv_experiments.py).

A k=3, s=2 SAME transposed conv is algebraically four small phase convs at
INPUT resolution interleaved onto the 2x grid (the classic sub-pixel-conv
identity). With forward-conv kernel K (the adjoint's kernel):

  out[2m,   2n  ] = sum_{dy,dx in {0,1}} K[2-2dy, 2-2dx] x[m-1+dy, n-1+dx]
  out[2m,   2n+1] = sum_{dy}             K[2-2dy, 1]     x[m-1+dy, n]
  out[2m+1, 2n  ] = sum_{dx}             K[1,     2-2dx] x[m,      n-1+dx]
  out[2m+1, 2n+1] =                      K[1,     1]     x[m,      n]

(derived from the adjoint of a SAME stride-2 conv, whose XLA padding for
even input sizes is (lo=0, hi=1) per axis). The four convs cover exactly
the 9 taps — zero wasted MACs — and run as dense stride-1 convs that XLA
schedules on the MXU at normal conv efficiency.

Replaces the reference's cuDNN ``tf.nn.conv2d_transpose``
(lib/ops.py:35-44, used by the generator's 2x upsample stages
frvsr.py:75-80) with identical math; outputs match ``lax.conv_transpose``
bit-for-bit in f32 up to dot-product summation order (golden-tested in
tests/test_ops.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def conv_transpose_s2_phase(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    transpose_kernel: bool = True,
) -> jnp.ndarray:
    """Exact k=3 stride-2 SAME transposed conv via four phase convs + d2s.

    Args:
      x: (B, H, W, I).
      kernel: (3, 3, O, I) if ``transpose_kernel`` (the flax
        ``ConvTranspose(transpose_kernel=True)`` / TF ``conv2d_transpose``
        layout this codebase stores), else (3, 3, I, O).
      bias: optional (O,).

    Returns:
      (B, 2H, 2W, O), same dtype as ``x``.
    """
    if kernel.shape[0] != 3 or kernel.shape[1] != 3:
        raise ValueError(f"phase decomposition expects k=3, got {kernel.shape}")
    if transpose_kernel:
        # Forward-conv kernel of the adjoint: swap channel axes (no spatial
        # flip — conv_transpose(transpose_kernel=True) IS the adjoint of the
        # forward correlation with this kernel).
        k_fwd = kernel.transpose(0, 1, 3, 2)  # (3, 3, I, O)
    else:
        k_fwd = jnp.flip(kernel, (0, 1))
    k_fwd = k_fwd.astype(x.dtype)
    b, h, w, _ = x.shape
    o = k_fwd.shape[-1]

    def conv(pad_y, pad_x, kk):
        return jax.lax.conv_general_dilated(
            x, kk, (1, 1), (pad_y, pad_x),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    # Per-axis: even output phase reads taps (2, 0) over x[m-1:m+1]
    # (pad lo 1), odd output phase reads tap 1 at x[m]. Kernels assembled
    # with explicit stacks (negative-stride slices crash this TPU
    # toolchain's compiler — CLAUDE.md).
    k_ee = jnp.stack([
        jnp.stack([k_fwd[2, 2], k_fwd[2, 0]], 0),
        jnp.stack([k_fwd[0, 2], k_fwd[0, 0]], 0)], 0)        # (2, 2, I, O)
    k_eo = jnp.stack([k_fwd[2, 1], k_fwd[0, 1]], 0)[:, None]  # (2, 1, I, O)
    k_oe = jnp.stack([k_fwd[1, 2], k_fwd[1, 0]], 0)[None]     # (1, 2, I, O)
    k_oo = k_fwd[1:2, 1:2]                                    # (1, 1, I, O)

    ee = conv((1, 0), (1, 0), k_ee)
    eo = conv((1, 0), (0, 0), k_eo)
    oe = conv((0, 0), (1, 0), k_oe)
    oo = conv((0, 0), (0, 0), k_oo)

    # Interleave: out[:, 2m+py, 2n+px] = phase[py][px][:, m, n].
    rows_e = jnp.stack([ee, eo], axis=3)  # (B, H, W, 2, O)
    rows_o = jnp.stack([oe, oo], axis=3)
    out = jnp.stack([rows_e, rows_o], axis=2)  # (B, H, 2, W, 2, O)
    out = out.reshape(b, 2 * h, 2 * w, o)
    if bias is not None:
        out = out + bias.astype(x.dtype)
    return out
