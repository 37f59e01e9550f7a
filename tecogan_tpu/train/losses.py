"""TecoGAN / FRVSR loss functions (parity with reference lib/Teco.py:77-435).

All reductions follow the reference exactly: the L2 losses are
``mean(sum(sq, channel))`` (i.e. 3x the plain MSE), the ping-pong loss is a
plain L1 mean, the VGG loss is one-minus-cosine-similarity per layer, and the
discriminator feature losses are channel-sum L1 means scaled to a fixed range.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from tecogan_tpu.config import TecoConfig
from tecogan_tpu.ops import (
    dense_image_warp,
    dense_image_warp_box,
    upscale_bilinear,
)


def content_loss(gen_outputs: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """L2 content loss: mean over pixels of the channel-summed square
    (reference Teco.py:318-325)."""
    diff = gen_outputs - targets
    return jnp.mean(jnp.sum(jnp.square(diff), axis=-1))


def warp_loss(
    r_inputs: jnp.ndarray, flow_lr: jnp.ndarray
) -> jnp.ndarray:
    """FNet warp loss in the LR domain (reference Teco.py:120-122,328-335).

    Warps frame t-1 by the predicted flow and compares to frame t.

    Args:
      r_inputs: (B, T, h, w, 3) LR frames in [0, 1].
      flow_lr: (B, T-1, h, w, 2) LR flow.
    """
    b, t, h, w, c = r_inputs.shape
    pre = r_inputs[:, :-1].reshape(b * (t - 1), h, w, c)
    cur = r_inputs[:, 1:].reshape(b * (t - 1), h, w, c)
    warped = dense_image_warp(pre, flow_lr.reshape(b * (t - 1), h, w, 2))
    return jnp.mean(jnp.sum(jnp.square(cur - warped), axis=-1))


def pingpong_loss(gen_outputs: jnp.ndarray, rnn_n: int) -> jnp.ndarray:
    """L1 between the forward half and the reversed backward half of the
    ping-pong unroll (reference Teco.py:362-372)."""
    first = gen_outputs[:, 0 : rnn_n - 1]
    # flip, not a negative-step slice (TPU compiler SIGABRT at batch > 1).
    last_rev = jnp.flip(gen_outputs[:, -(rnn_n - 1) :], axis=1)
    # f32 reduction: gen_outputs may be bf16 (compute_dtype) and a plain
    # bf16 mean over millions of elements loses the loss signal.
    return jnp.mean(jnp.abs(first.astype(jnp.float32)
                            - last_rev.astype(jnp.float32)))


def vgg_cosine_loss(
    gen_feats: Dict[str, jnp.ndarray], target_feats: Dict[str, jnp.ndarray]
) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
    """Sum over layers of (1 - mean cosine similarity); features are already
    channel-L2-normalized (reference Teco.py:339-358)."""
    per_layer = []
    total = 0.0
    for key in gen_feats:
        cos = jnp.sum(gen_feats[key].astype(jnp.float32)
                      * target_feats[key].astype(jnp.float32), axis=-1)
        layer = 1.0 - jnp.mean(cos)
        per_layer.append(layer)
        total = total + layer
    return total, per_layer


def d_layer_losses(
    real_layers: Sequence[jnp.ndarray],
    fake_layers: Sequence[jnp.ndarray],
    layer_norms: Sequence[float],
    fix_range: float,
) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
    """Discriminator feature-matching losses (reference Teco.py:280-313).

    Returns (sum of scaled layer losses for G, list of raw layer losses).
    """
    raw = []
    total = 0.0
    for real, fake, norm in zip(real_layers, fake_layers, layer_norms):
        layer = jnp.mean(jnp.sum(jnp.abs(
            real.astype(jnp.float32) - fake.astype(jnp.float32)), axis=-1))
        raw.append(layer)
        total = total + fix_range * layer / norm
    return total, raw


# ---------------------------------------------------------------------------
# Spatio-temporal discriminator input assembly (reference Teco.py:180-270)
# ---------------------------------------------------------------------------
def _triplet_channels_grouped(x: jnp.ndarray):
    """(TB, 3, H, W, C) -> (TB, H, W, 3C) with RRR GGG BBB channel order
    (reference Teco.py:227-229: transpose to (tb,H,W,C,3), merge last two)."""
    tb, _, h, w, c = x.shape
    x = x.transpose(0, 2, 3, 4, 1)
    return x.reshape(tb, h, w, c * 3)


def _triplet_channels(frames: jnp.ndarray, t_batch: int, h: int, w: int, c: int):
    """(TB*3, H, W, C) -> (TB, H, W, 3C); see :func:`_triplet_channels_grouped`."""
    return _triplet_channels_grouped(frames.reshape(t_batch, 3, h, w, c))


def assemble_dst_inputs(
    r_inputs: jnp.ndarray,
    r_targets: jnp.ndarray,
    gen_outputs: jnp.ndarray,
    flow_hr: jnp.ndarray,
    config: TecoConfig,
    flow_hr_back: jnp.ndarray = None,
    skip_identity_warp: bool = True,
    box_warp: bool = True,
    merge_rf: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Build the real/fake temporal-discriminator inputs.

    Frames are grouped in consecutive triplets (t-1, t, t+1); each triplet
    member is warped toward the middle frame (forward flow, zero, backward
    flow — backward reused from the ping-pong extension, reference
    Teco.py:206-209).

    With ``config.dt_mergeDs`` (the published spatio-temporal Dst,
    reference Teco.py:233-244): the warped stack is center-cropped by
    ``crop_dt`` and zero-padded back, then concatenated with the unwarped
    triplet and the bilinear-upscaled LR triplet — 27 channels at (4h, 4w).

    Without it (the pure temporal Dt of the TecoGAN supplemental): only the
    warped 9-channel triplet, center-CROPPED to the ``crop_dt`` box and NOT
    re-padded (reference Teco.py:230-231,265-266 — the crop shrinks the D's
    spatial extent). Note the reference's own code on this branch is broken
    TF (``discriminator_F`` returns a (net, layers) tuple consumed as a
    tensor at Teco.py:266, and ``real_layers`` is unbound under D_LAYERLOSS,
    Teco.py:292); this implements the documented intent.

    Under ``config.pingpong`` the backward flows are reused from the extended
    sequence (reference Teco.py:206-209); otherwise the caller must pass
    ``flow_hr_back`` of shape (B, T//3, 4h, 4w, 2) computed by fnet on the
    reversed middle/next frame pairs (reference Teco.py:190-203).

    ``box_warp``: with ``crop_dt < 1.0`` every warped value outside the
    center crop box is zero-masked (dt_mergeDs) or cropped away (pure Dt)
    anyway (reference Teco.py:216-220,230-234), so the warp — its gather AND
    its scatter-add backward — runs only on the box via
    :func:`dense_image_warp_box` (still gathering from the full source
    frames: flow reaches up to 96 HR px past the box edge). At the published
    ``crop_dt=0.75`` this removes 1 - 0.75^2 = 44% of the Dst warp family's
    indices. Bit-identical to the full warp + mask/crop (same arithmetic on
    the surviving pixels; zeros are exact) — False keeps the full-frame
    parity oracle for tests.

    ``skip_identity_warp``: the middle triplet member's flow is exactly zero
    (reference Teco.py:207 warps it anyway), and a zero-flow bilinear warp is
    an identity in both the forward (alpha=0 -> the top-left corner at
    weight 1.0) and the VJP (unit scatter at the exact index) — so only the
    outer 2/3 of the frames are warped, cutting a third of the train step's
    largest op family (the chunked gather + scatter-add backward). The only
    numeric delta vs warping is 1 ulp at the clamp-folded last row/column,
    where the warp's lerp computes ``tl + (bl - tl) * 1.0`` — passthrough is
    the MORE exact of the two. False keeps the all-frames warp as the parity
    oracle for tests.

    Returns:
      (real, fake): each (B * T//3, 4h, 4w, 27) for Dst, or
      (B * T//3, crop_dt_box, crop_dt_box, 9) for pure Dt.
    """
    b, t, hr_h, hr_w, c = r_targets.shape
    t_size = 3 * (t // 3)
    t_batch = b * t_size // 3

    # The whole D-input assembly runs in the model's compute dtype
    # (= gen_outputs.dtype): the D forward promotes to it internally
    # anyway, and an accidental f32 here made the batched warp's scatter
    # backward the single largest op of the train step (tools/trace_step.py).
    dtype = gen_outputs.dtype
    t_targets = r_targets[:, :t_size].astype(dtype).reshape(
        b * t_size, hr_h, hr_w, c)
    t_gen = gen_outputs[:, :t_size].reshape(b * t_size, hr_h, hr_w, c)

    # crop_dt box geometry (reference Teco.py:216-219).
    crop = int(hr_h * config.crop_dt)
    off = (hr_h - crop) // 2
    crop = hr_h - 2 * off
    use_box = box_warp and config.crop_dt < 1.0

    # Flow triplets: forward, zero, backward (reference Teco.py:206-213).
    v_pre = flow_hr[:, 0:t_size:3]
    if flow_hr_back is not None:
        v_nxt = flow_hr_back
    else:
        assert config.pingpong, (
            "Without ping-pong, backward flows must be passed explicitly "
            "(reference Teco.py:190-203)"
        )
        # Backward flows reused from the ping-pong half: every 3rd flow
        # counting back from the second-to-last (reference Teco.py:206-209).
        # Expressed as an ascending strided slice + flip — negative-step
        # slices crash this TPU toolchain's compiler at batch > 1.
        t_flows = flow_hr.shape[1]
        n_trip = t_size // 3
        start = t_flows - 2 - 3 * (n_trip - 1)  # ascending first index
        v_nxt = jnp.flip(flow_hr[:, start : t_flows - 1 : 3], axis=1)
    if use_box:
        # Only the box's flow is ever consumed (outside is masked/cropped).
        v_pre = v_pre[:, :, off : off + crop, off : off + crop]
        v_nxt = v_nxt[:, :, off : off + crop, off : off + crop]
    vel_h, vel_w = (crop, crop) if use_box else (hr_h, hr_w)
    # Flows stay f32: the warp promotes coordinates to f32 internally, so a
    # bf16 cast here would only quantize the sample positions (~0.4 px at the
    # 96 px bound) without making any op cheaper.
    if skip_identity_warp:
        # Only the outer members carry flow; (TB*2, h, w, 2).
        t_vel = jnp.stack([v_pre, v_nxt], axis=2)
        t_vel = t_vel.astype(jnp.float32).reshape(t_batch * 2, vel_h, vel_w, 2)
    else:
        v_mid = jnp.zeros_like(v_pre)
        t_vel = jnp.stack([v_pre, v_mid, v_nxt], axis=2)
        t_vel = t_vel.astype(jnp.float32).reshape(b * t_size, vel_h, vel_w, 2)
    t_vel = jax.lax.stop_gradient(t_vel)  # no D gradient into fnet (Teco.py:214)

    def warp_members(frames_flat: jnp.ndarray) -> jnp.ndarray:
        """Warp the triplet members toward the middle frame.

        (b*t_size, H, W, cm) -> (TB, 3, Hm, Wm, cm) where Hm=Wm=crop on the
        box path, else the full frame. Channel count ``cm`` is free: the warp
        treats channels independently (one set of gather indices + lerp
        weights for all of them), which is what makes the merged real+fake
        warp below bit-identical to two separate warps.
        """
        cm = frames_flat.shape[-1]
        trips = frames_flat.reshape(t_batch, 3, hr_h, hr_w, cm)
        if use_box:
            # Warp only the crop box (gathering from the full frames); the
            # box is then zero-padded back (dt_mergeDs) or IS the D input
            # (pure Dt) — reference Teco.py:216-220,230-234.
            if skip_identity_warp:
                edges = trips[:, 0::2].reshape(t_batch * 2, hr_h, hr_w, cm)
                we = dense_image_warp_box(edges, t_vel, (off, off))
                we = we.reshape(t_batch, 2, crop, crop, cm)
                mid = trips[:, 1:2, off : off + crop, off : off + crop]
                return jnp.concatenate([we[:, :1], mid, we[:, 1:]], axis=1)
            we = dense_image_warp_box(frames_flat, t_vel, (off, off))
            return we.reshape(t_batch, 3, crop, crop, cm)
        if skip_identity_warp:
            edges = trips[:, 0::2].reshape(t_batch * 2, hr_h, hr_w, cm)
            we = dense_image_warp(edges, t_vel)
            we = we.reshape(t_batch, 2, hr_h, hr_w, cm)
            return jnp.concatenate([we[:, :1], trips[:, 1:2], we[:, 1:]], axis=1)
        warped = dense_image_warp(frames_flat, t_vel)
        return warped.reshape(t_batch, 3, hr_h, hr_w, cm)

    def finalize(members: jnp.ndarray, frames_flat: jnp.ndarray):
        """(TB, 3, Hm, Wm, c) warped members -> (before9, warped9)."""
        warped9 = _triplet_channels_grouped(members)
        if not config.dt_mergeDs:
            # Pure Dt: crop without re-padding (Teco.py:230-231,265-266).
            if config.crop_dt < 1.0 and not use_box:
                warped9 = warped9[:, off : off + crop, off : off + crop, :]
            return None, warped9
        if use_box:
            warped9 = jnp.pad(
                warped9,
                ((0, 0), (off, hr_h - off - crop),
                 (off, hr_w - off - crop), (0, 0)))
        elif config.crop_dt < 1.0:
            # Center crop then zero-pad back (reference Teco.py:216-220,230-234).
            mask = jnp.zeros((1, hr_h, hr_w, 1), frames_flat.dtype)
            mask = mask.at[:, off : off + crop, off : off + crop, :].set(1.0)
            warped9 = warped9 * mask
        before9 = _triplet_channels(frames_flat, t_batch, hr_h, hr_w, c)
        return before9, warped9

    if merge_rf:
        # Real and fake triplets are warped by the SAME flows, so one gather
        # over the channel-concatenated pair fetches both: the gather is
        # index-rate-bound (~4-6 ns/index on v5e, ops/warp.py), so halving
        # the index count ~halves the Dst warp family's forward cost. The
        # backward is unchanged: only the fake channels carry cotangents
        # (targets are leaves, flows are stop-gradient'd), and the scatter
        # runs the same index count either way.
        members = warp_members(jnp.concatenate([t_targets, t_gen], axis=-1))
        members_r, members_f = members[..., :c], members[..., c:]
    else:
        members_r = warp_members(t_targets)
        members_f = warp_members(t_gen)
    before_r, warped_r = finalize(members_r, t_targets)
    before_f, warped_f = finalize(members_f, t_gen)
    if not config.dt_mergeDs:
        return warped_r, warped_f

    # Bilinear-upscaled LR triplet, shared by real and fake (Teco.py:240-244).
    lr_h, lr_w = r_inputs.shape[2], r_inputs.shape[3]
    t_in = r_inputs[:, :t_size].astype(dtype).reshape(b * t_size, lr_h, lr_w, c)
    t_in9 = _triplet_channels(t_in, t_batch, lr_h, lr_w, c)
    input_hi = upscale_bilinear(t_in9, 4)

    real = jnp.concatenate([before_r, warped_r, input_hi], axis=-1)
    fake = jnp.concatenate([before_f, warped_f, input_hi], axis=-1)
    return real, fake
