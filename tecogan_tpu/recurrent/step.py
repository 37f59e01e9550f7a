"""The recurrent VSR step and training unroll.

One frame step (parity with reference main.py:194-216 inference graph and
lib/Teco.py:136-155 training unroll):

  flow_lr  = fnet(concat(prev_lr, cur_lr))          # LR-pixel flow
  flow_hr  = upscale_bilinear(flow_lr * 4, 4)       # HR flow
  warped   = dense_image_warp(prev_hr, flow_hr)     # warp previous output
  packed   = space_to_depth(warped, 4)              # (h, w, 48)
  hr       = generator(concat(cur_lr, packed))      # [-1, 1]

State convention: ``prev_hr`` is stored deprocessed in [0, 1] (matching
reference main.py:206-207 where ``pre_gen`` holds ``deprocess(gen_output)``
and Teco.py:143 where the warped previous output is deprocessed before
space-to-depth packing).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from tecogan_tpu.models.fnet import pad_flow_to
from tecogan_tpu.ops import (
    dense_image_warp,
    depth_to_space,
    deprocess,
    preprocess,
    space_to_depth,
    upscale_bilinear,
)
from tecogan_tpu.models.generator import generator_apply_hr_input
from tecogan_tpu.ops.warp import warp_space_to_depth


class RecurrentState(NamedTuple):
    prev_lr: jnp.ndarray  # (B, h, w, 3) in [0, 1]
    prev_hr: jnp.ndarray  # (B, 4h, 4w, 3) in [0, 1]


def init_state(batch: int, h: int, w: int, dtype=jnp.float32) -> RecurrentState:
    """Zero state; parity with reference main.py:197-199 zero Variables."""
    return RecurrentState(
        prev_lr=jnp.zeros((batch, h, w, 3), dtype),
        prev_hr=jnp.zeros((batch, 4 * h, 4 * w, 3), dtype),
    )


def upscale_flow(flow_lr: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """LR flow -> HR flow: symmetric-pad to (h, w), scale by 4, 4x bilinear
    upsample (reference main.py:212-213, Teco.py:113)."""
    flow_lr = pad_flow_to(flow_lr, h, w)
    return upscale_bilinear(flow_lr * 4.0, 4)


def frame_step(
    gen_apply,
    fnet_apply,
    gen_params,
    fnet_params,
    state: RecurrentState,
    lr_frame: jnp.ndarray,
    warp_fn=None,
) -> Tuple[RecurrentState, jnp.ndarray]:
    """Advance one frame. Returns (new_state, hr_frame in [0, 1]).

    ``warp_fn(prev_hr, flow_hr) -> packed`` overrides the fused warp+s2d
    (used by the spatially-sharded path to substitute the halo-exchange
    variant, ops/warp.py:warp_space_to_depth_halo)."""
    b, h, w, _ = lr_frame.shape
    flow_lr = fnet_apply(
        {"params": fnet_params}, jnp.concatenate([state.prev_lr, lr_frame], axis=-1)
    )
    flow_hr = upscale_flow(flow_lr, h, w)
    # Fused warp + space-to-depth: the warped HR frame is only ever consumed
    # packed, so gather directly in s2d order (ops/warp.py).
    if warp_fn is None:
        packed = warp_space_to_depth(state.prev_hr, flow_hr, 4)
    else:
        packed = warp_fn(state.prev_hr, flow_hr)
    gen_out = gen_apply(
        {"params": gen_params}, jnp.concatenate([lr_frame, packed], axis=-1)
    )
    hr = deprocess(gen_out)
    return RecurrentState(prev_lr=lr_frame, prev_hr=hr), hr


def extend_pingpong(seq: jnp.ndarray) -> jnp.ndarray:
    """(B, T, ...) -> (B, 2T-1, ...): forward then reversed-without-last
    (reference Teco.py:80-85).

    Reversal via ``jnp.flip`` rather than a negative-step slice: negative
    strides crash this TPU toolchain's compiler for batch > 1 (SIGABRT in
    the Mosaic/XLA helper); flip lowers to ``lax.rev`` which is fine.
    """
    return jnp.concatenate([seq, jnp.flip(seq, axis=1)[:, 1:]], axis=1)


def flows_for_sequence(
    fnet_apply, fnet_params, r_inputs: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched fnet over all adjacent frame pairs of (B, T, h, w, 3).

    Flattens to a single B*(T-1) batch so every pair rides one large MXU
    conv pass (the reference does the same flattening, Teco.py:102-115).

    Returns:
      flow_lr: (B, T-1, h, w, 2) LR flow
      flow_hr: (B, T-1, 4h, 4w, 2) HR flow
    """
    b, t, h, w, c = r_inputs.shape
    pre = r_inputs[:, :-1].reshape(b * (t - 1), h, w, c)
    cur = r_inputs[:, 1:].reshape(b * (t - 1), h, w, c)
    flow_lr = fnet_apply(
        {"params": fnet_params}, jnp.concatenate([pre, cur], axis=-1)
    )
    flow_hr = upscale_flow(flow_lr, h, w)
    return (
        flow_lr.reshape(b, t - 1, h, w, 2),
        flow_hr.reshape(b, t - 1, 4 * h, 4 * w, 2),
    )


def unroll_generator(
    gen_apply,
    gen_params,
    r_inputs: jnp.ndarray,
    flow_hr: jnp.ndarray,
    remat: bool = True,
    with_warppre: bool = True,
    fold_input=False,
    num_resblock: int = 16,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Recurrent generator unroll via lax.scan (reference Teco.py:125-164).

    Args:
      r_inputs: (B, T, h, w, 3) LR frames in [0, 1].
      flow_hr: (B, T-1, 4h, 4w, 2) HR flows from :func:`flows_for_sequence`.
      remat: rematerialize each frame's generator application in the backward
        pass — the 2N-1 ping-pong unroll of 4x HR activations does not
        otherwise fit HBM (SURVEY.md §7 "ping-pong memory").
      with_warppre: also return the warped previous outputs. The training
        loss never consumes them (only GIF summaries do, Teco.py:162-164),
        and under ``jax.checkpoint`` the dead scan output is NOT reliably
        eliminated — pass False on the loss path so the scan neither
        computes nor stacks the (B, T-1, 4h, 4w, 3) tensor.
      fold_input: skip the space-to-depth pack of the warped previous output
        and feed the raw warped HR frame to the generator through a folded
        input stage (models/generator.py:generator_apply_hr_input —
        mathematically identical, same param tree). True/"on" = the
        stride-4 kernel fold; "patchify" = the s2d as a 0/1-selection
        4x4-stride-4 conv (MXU im2col; input gradient is a non-overlapping
        4x4 convT, scatter-free). Either removes the per-frame s2d
        lane-interleave transpose from both the forward scan and its
        backward. False/"off" = the packed default.
      num_resblock: trunk depth for the ``fold_input`` path (the flax apply
        carries it in the module; the pure fold forward needs it passed).

    Returns:
      gen_outputs: (B, T, 4h, 4w, 3) in [-1, 1]
      gen_warppre: (B, T-1, 4h, 4w, 3) warped previous outputs in [-1, 1]
        (for telemetry/summaries, reference Teco.py:142,162-164), or None
        when ``with_warppre=False``.
    """
    b, t, h, w, _ = r_inputs.shape
    _FOLD_MODES = {False: None, "off": None, True: "stride4", "on": "stride4",
                   "patchify": "patchify"}
    try:
        fold_mode = _FOLD_MODES[fold_input]
    except KeyError:
        raise ValueError(
            f"unroll_generator fold_input={fold_input!r}: expected one of "
            "False/'off', True/'on', or 'patchify' (this is the TRAIN-unroll "
            "fold selector; the inference-side 'auto' resolves before here)"
        ) from None

    # Frame 0: zero recurrent features (reference Teco.py:127-133).
    inp0 = jnp.concatenate(
        [r_inputs[:, 0], jnp.zeros((b, h, w, 48), r_inputs.dtype)], axis=-1
    )
    out0 = gen_apply({"params": gen_params}, inp0)  # [-1, 1]

    def body(prev_out, xs):
        lr, flow = xs  # (B, h, w, 3), (B, 4h, 4w, 2)
        if fold_mode is not None:
            # Raw-HR warp (deprocess folded into the gather epilogue) + a
            # folded input stage — no s2d transpose materialized.
            warped01 = dense_image_warp(prev_out, flow, scale=0.5, shift=0.5)
            gen_out = generator_apply_hr_input(
                gen_params, lr.astype(prev_out.dtype), warped01, num_resblock,
                s2d_mode=fold_mode,
            )
            if with_warppre:
                return gen_out, (gen_out, preprocess(warped01))
            return gen_out, gen_out
        # Fused warp + deprocess + s2d pack ([-1,1] -> [0,1] folded into the
        # gather's output affine); warppre for telemetry is recovered by the
        # exact inverse permutation.
        packed = warp_space_to_depth(prev_out, flow, 4, scale=0.5, shift=0.5)
        gen_out = gen_apply(
            {"params": gen_params}, jnp.concatenate([lr, packed], axis=-1)
        )
        if with_warppre:
            warped = preprocess(depth_to_space(packed, 4))
            return gen_out, (gen_out, warped)
        return gen_out, gen_out

    if remat:
        body = jax.checkpoint(body)

    xs = (
        r_inputs[:, 1:].transpose(1, 0, 2, 3, 4),
        flow_hr.transpose(1, 0, 2, 3, 4),
    )
    if with_warppre:
        _, (outs, warppre) = jax.lax.scan(body, out0, xs)
        gen_warppre = warppre.transpose(1, 0, 2, 3, 4)
    else:
        _, outs = jax.lax.scan(body, out0, xs)
        gen_warppre = None

    gen_outputs = jnp.concatenate(
        [out0[:, None], outs.transpose(1, 0, 2, 3, 4)], axis=1
    )
    return gen_outputs, gen_warppre
