"""Trainer tests: FRVSR and TecoGAN step mechanics, adaptive-D gating,
loss assembly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tecogan_tpu.config import TecoConfig
from tecogan_tpu.train import Trainer, prepare_batch


def tiny_cfg(**kw):
    base = dict(
        num_resblock=2,
        crop_size=8,
        batch_size=2,
        rnn_n=4,
        vgg_scaling=-0.002,
        learning_rate=1e-3,
        remat_generator=False,
    )
    base.update(kw)
    return TecoConfig(**base)


def make_batch(cfg, rng, batch=2):
    tar = cfg.hr_load_size
    return jnp.asarray(
        rng.rand(batch, cfg.rnn_n, tar, tar, 3).astype(np.float32)
    )


def test_prepare_batch_shapes(rng):
    cfg = tiny_cfg()
    hr = make_batch(cfg, rng)
    lr, tar = prepare_batch(hr, cfg)
    assert lr.shape == (2, 4, 8, 8, 3)
    assert tar.shape == (2, 4, 32, 32, 3)
    # LR in [0,1]; targets in [-1,1].
    assert float(jnp.min(lr)) >= 0.0 and float(jnp.max(lr)) <= 1.0
    assert float(jnp.min(tar)) >= -1.0 and float(jnp.max(tar)) <= 1.0


def test_uint8_batch_matches_float(rng):
    """The cheap-upload path (uint8 batch, device /255 in prepare_batch)
    must reproduce the float path to the documented 1-ulp /255 bound."""
    from tecogan_tpu.train.trainer import Trainer

    cfg = tiny_cfg(ratio=-0.01)
    u8 = (rng.rand(2, cfg.rnn_n, cfg.hr_load_size, cfg.hr_load_size, 3)
          * 255).astype(np.uint8)
    f32 = jnp.asarray(u8.astype(np.float32) / 255.0)

    lr_a, tar_a = prepare_batch(jnp.asarray(u8), cfg)
    lr_b, tar_b = prepare_batch(f32, cfg)
    np.testing.assert_allclose(np.asarray(lr_a), np.asarray(lr_b),
                               rtol=1e-5, atol=1e-6)

    tr = Trainer(cfg)
    # train_step donates the state; use a fresh (identical-init) state per call.
    _, m_u8 = tr.train_step(tr.init_state(jax.random.PRNGKey(0)),
                            jnp.asarray(u8))
    _, m_f32 = tr.train_step(tr.init_state(jax.random.PRNGKey(0)), f32)
    np.testing.assert_allclose(float(m_u8["All_loss_Gen"]),
                               float(m_f32["All_loss_Gen"]),
                               rtol=1e-4)


def test_frvsr_train_step(rng):
    cfg = tiny_cfg(ratio=-0.01)  # FRVSR: no GAN
    trainer = Trainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    batch = make_batch(cfg, rng)

    before = jax.tree.map(lambda x: x.copy(), state.gen_params)
    state2, metrics = trainer.train_step(state, batch)
    assert int(state2.step) == 1
    for key in ("l2_content_loss", "l2_warp_loss", "All_loss_Gen"):
        v = float(metrics[key])
        assert np.isfinite(v) and v >= 0, (key, v)
    # Params actually moved.
    moved = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), before, state2.gen_params
    )
    assert max(jax.tree.leaves(moved)) > 0

    # Second step runs from donated state.
    state3, _ = trainer.train_step(state2, batch)
    assert int(state3.step) == 2
    # EMA telemetry populated.
    assert float(state3.ema_losses["l2_content_loss"]) > 0


def test_tecogan_train_step_full(rng):
    cfg = tiny_cfg(ratio=0.01, pingpong=True, pp_scaling=0.5, d_layerloss=True)
    trainer = Trainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    batch = make_batch(cfg, rng)

    state2, metrics = trainer.train_step(state, batch)
    for key in (
        "l2_content_loss",
        "l2_warp_loss",
        "PingPang",
        "t_adversarial_loss",
        "t_discrim_loss",
        "D_layer_loss_sum",
        "t_balance",
        "All_loss_Gen",
    ):
        assert np.isfinite(float(metrics[key])), key
    # D output stats in (0,1).
    assert 0 < float(metrics["t_discrim_real_output"]) < 1
    # First step: ema_tbalance starts at 0 < 0.4, so D trains.
    assert int(state2.counter_with_d) == 1
    assert int(state2.counter_wo_d) == 0
    assert float(jnp.abs(state2.ema_tbalance)) > 0


def test_adaptive_d_gate_blocks_updates(rng):
    cfg = tiny_cfg(ratio=0.01, pingpong=True)
    trainer = Trainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    batch = make_batch(cfg, rng)

    # Force the gate closed: EMA(t_balance) far above Dbalance.
    # (train_step donates its input state, so keep independent copies.)
    d_before = jax.tree.map(lambda x: np.asarray(x).copy(), state.d_params)
    closed = jax.tree.map(lambda x: x.copy(), state).replace(
        ema_tbalance=jnp.asarray(100.0)
    )
    state2, _ = trainer.train_step(closed, batch)
    diffs = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), d_before, state2.d_params
    )
    assert max(jax.tree.leaves(diffs)) == 0.0  # D frozen
    assert int(state2.counter_wo_d) == 1
    # Generator still trains.
    assert int(state2.step) == 1

    # Gate open: D moves.
    opened = jax.tree.map(lambda x: x.copy(), state).replace(
        ema_tbalance=jnp.asarray(-100.0)
    )
    state3, _ = trainer.train_step(opened, batch)
    diffs = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), d_before, state3.d_params
    )
    assert max(jax.tree.leaves(diffs)) > 0.0


def test_eval_step_no_mutation(rng):
    cfg = tiny_cfg(ratio=0.01, pingpong=True)
    trainer = Trainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    batch = make_batch(cfg, rng)
    metrics = trainer.eval_step(state, batch)
    assert np.isfinite(float(metrics["All_loss_Gen"]))


def test_non_pingpong_gan_backward_flows(rng):
    """GAN without ping-pong must compute explicit backward flows
    (reference Teco.py:190-203)."""
    cfg = tiny_cfg(ratio=0.01, pingpong=False, rnn_n=6)
    trainer = Trainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    batch = make_batch(cfg, rng)
    state2, metrics = trainer.train_step(state, batch)
    assert np.isfinite(float(metrics["t_discrim_loss"]))


def test_vgg_required_when_enabled():
    cfg = tiny_cfg(vgg_scaling=0.2)
    with pytest.raises(ValueError):
        Trainer(cfg)


def test_lr_schedule_decay():
    from tecogan_tpu.train.trainer import lr_schedule

    cfg = TecoConfig(learning_rate=1e-4, decay_step=100, decay_rate=0.5, stair=False)
    s = lr_schedule(cfg)
    np.testing.assert_allclose(float(s(0)), 1e-4, rtol=1e-6)
    np.testing.assert_allclose(float(s(100)), 5e-5, rtol=1e-6)
    np.testing.assert_allclose(float(s(50)), 1e-4 * 0.5**0.5, rtol=1e-6)

    cfg_stair = cfg.replace(stair=True)
    s2 = lr_schedule(cfg_stair)
    np.testing.assert_allclose(float(s2(50)), 1e-4, rtol=1e-6)
    np.testing.assert_allclose(float(s2(150)), 5e-5, rtol=1e-6)


def test_pingpong_backward_flow_slice_matches_reference(rng):
    """The flip-based backward-flow selection must equal the reference's
    ``gen_flow[:, -2:-1-t_size:-3]`` (Teco.py:209) — negative-stride slices
    are rewritten for the TPU compiler, this pins the equivalence."""
    from tecogan_tpu.train.losses import assemble_dst_inputs
    from tecogan_tpu.config import TecoConfig

    for rnn_n in (3, 6, 10):
        t = 2 * rnn_n - 1           # ping-pong extension length
        t_size = 3 * (t // 3)
        flows = np.arange(t - 1)    # flow index stand-ins
        want = flows[-2 : -1 - t_size : -3]          # reference expression
        n = t_size // 3
        start = (t - 1) - 2 - 3 * (n - 1)
        got = flows[start : t - 2 + 1 : 3][::-1]     # our rewrite
        np.testing.assert_array_equal(want, got)

    # And through the real assembly path: flows tagged by index must appear
    # as (fwd, zero, bwd) per triplet.
    cfg = TecoConfig(num_resblock=2, crop_size=8, batch_size=1, rnn_n=3,
                     ratio=0.01, pingpong=True, crop_dt=1.0)
    t = 5
    h = w = 4
    r_inputs = jnp.zeros((1, t, h, w, 3))
    r_targets = jnp.zeros((1, t, 4 * h, 4 * w, 3))
    gen = jnp.zeros((1, t, 4 * h, 4 * w, 3))
    # tag each flow with its index in channel 0
    flow = jnp.stack([jnp.full((1, 4 * h, 4 * w, 2), i, jnp.float32)
                      for i in range(t - 1)], axis=1) * 0
    flow = flow + jnp.arange(t - 1).reshape(1, t - 1, 1, 1, 1)
    # zero flows -> warped == original, but inspect t_vel via warping a ramp:
    # instead check shapes only here; numeric equivalence covered above.
    real, fake = assemble_dst_inputs(r_inputs, r_targets, gen, flow, cfg)
    assert real.shape == (1, 4 * h, 4 * w, 27)


@pytest.mark.parametrize("dt_mergeDs,crop_dt", [(True, 0.75), (True, 1.0),
                                                (False, 0.75)])
def test_dst_identity_warp_skip_equivalence(rng, dt_mergeDs, crop_dt):
    """Warping only the two flowed triplet members (skip_identity_warp=True,
    the default) must match the all-frames warp — the middle member's flow is
    exactly zero, so its warp is an exact identity in value AND gradient
    (VERDICT r2 #3; reference Teco.py:206-213 warps it anyway)."""
    from tecogan_tpu.train.losses import assemble_dst_inputs

    cfg = TecoConfig(num_resblock=2, crop_size=8, batch_size=2, rnn_n=4,
                     ratio=0.01, pingpong=True, dt_mergeDs=dt_mergeDs,
                     crop_dt=crop_dt, d_layerloss=dt_mergeDs)
    b, rnn_n, h = 2, 4, 8
    t = 2 * rnn_n - 1
    r_inputs = jnp.asarray(rng.rand(b, t, h, h, 3), jnp.float32)
    r_targets = jnp.asarray(rng.rand(b, t, 4 * h, 4 * h, 3), jnp.float32) * 2 - 1
    flow_hr = jnp.asarray(rng.randn(b, t - 1, 4 * h, 4 * h, 2) * 3, jnp.float32)

    def outputs(gen, skip):
        return assemble_dst_inputs(r_inputs, r_targets, gen, flow_hr, cfg,
                                   skip_identity_warp=skip)

    # Values: 1-ulp tolerance, not bit-equality — the all-warp ORACLE's
    # middle frame carries a lerp reassociation error at clamped boundary
    # rows (``tl + (bl - tl) * 1.0 != bl`` in fp); the skip path is the
    # exact identity there. Interior pixels are bit-identical.
    gen = jnp.asarray(rng.rand(b, t, 4 * h, 4 * h, 3), jnp.float32) * 2 - 1
    for fast, slow in zip(outputs(gen, True), outputs(gen, False)):
        np.testing.assert_allclose(
            np.asarray(fast), np.asarray(slow), rtol=0, atol=1.5e-7)

    # Gradient equality through a scalar readout of both branches.
    def loss(gen, skip):
        real, fake = outputs(gen, skip)
        return jnp.sum(jnp.sin(fake) * real)

    # Gradients agree to float epsilon, not bit-exactly: the warp VJP's
    # scatter-add accumulates corner contributions in a batch-geometry-
    # dependent order (12- vs 8-frame batch), which XLA does not keep
    # bit-stable. Values above ARE bit-exact.
    g_fast = jax.grad(lambda g: loss(g, True))(gen)
    g_slow = jax.grad(lambda g: loss(g, False))(gen)
    np.testing.assert_allclose(
        np.asarray(g_fast), np.asarray(g_slow), rtol=3e-6, atol=5e-7)


def test_pure_dt_mode_train_step(rng):
    """dt_mergeDs=False: 9ch cropped (not re-padded) Dt input, 0.3x D LR
    (reference Teco.py:230-231,265-266,423-424; the reference's own branch is
    broken TF — this pins the documented intent)."""
    cfg = tiny_cfg(ratio=0.01, pingpong=True, pp_scaling=0.5,
                   dt_mergeDs=False, d_layerloss=False, crop_dt=0.75)
    trainer = Trainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))

    # D input stage must be built for 9 channels.
    k = state.d_params["input_stage_conv"]["kernel"]
    assert k.shape[2] == 9, k.shape

    batch = make_batch(cfg, rng)

    # The assembled Dt inputs are spatially cropped, not re-padded.
    # (Checked before train_step: the step donates its input state.)
    from tecogan_tpu.train.losses import assemble_dst_inputs
    from tecogan_tpu.recurrent.step import extend_pingpong, flows_for_sequence
    from tecogan_tpu.train.trainer import prepare_batch
    r_inputs, r_targets = prepare_batch(batch, cfg)
    r_inputs = extend_pingpong(r_inputs)
    r_targets = extend_pingpong(r_targets)
    _, flow_hr = flows_for_sequence(trainer.fnet.apply, state.fnet_params, r_inputs)
    real, fake = assemble_dst_inputs(
        r_inputs, r_targets, jnp.zeros_like(r_targets), flow_hr, cfg)
    hr = 4 * cfg.crop_size
    crop = int(hr * cfg.crop_dt)
    off = (hr - crop) // 2
    box = hr - 2 * off
    assert real.shape[1:] == (box, box, 9), real.shape
    assert fake.shape == real.shape

    state2, metrics = trainer.train_step(state, batch)
    for key in ("t_adversarial_loss", "t_discrim_loss", "All_loss_Gen"):
        assert np.isfinite(float(metrics[key])), key
    assert "D_layer_loss_sum" not in metrics
    assert int(state2.counter_with_d) == 1


def test_pure_dt_rejects_layerloss():
    with pytest.raises(ValueError, match="d_layerloss"):
        Trainer(tiny_cfg(ratio=0.01, pingpong=True,
                         dt_mergeDs=False, d_layerloss=True))


def test_vgg_train_step_end_to_end(rng):
    """Full case-3 loss stack with the VGG perceptual term active, using
    randomly initialized VGG19 weights (the weights don't change the code
    path; the real npz is network-gated). Pins that vgg losses flow into
    All_loss_Gen and gradients stay finite (reference Teco.py:97,339-358)."""
    from tecogan_tpu.models.vgg19 import VGG19Features

    cfg = tiny_cfg(ratio=0.01, pingpong=True, pp_scaling=0.5,
                   vgg_scaling=0.2, crop_size=16, rnn_n=3, batch_size=1)
    vgg_params = VGG19Features().init(
        jax.random.PRNGKey(3), jnp.zeros((1, 64, 64, 3)))["params"]
    trainer = Trainer(cfg, vgg_params=vgg_params)
    state = trainer.init_state(jax.random.PRNGKey(0))
    batch = make_batch(cfg, rng, batch=1)

    state2, metrics = trainer.train_step(state, batch)
    for key in ("vgg_all", "vgg_loss_2", "vgg_loss_5",
                "t_adversarial_loss", "All_loss_Gen"):
        assert np.isfinite(float(metrics[key])), key
    assert float(metrics["vgg_all"]) > 0
    # vgg term actually contributes to the generator objective
    assert float(metrics["All_loss_Gen"]) > float(metrics["l2_content_loss"])
    assert float(state2.ema_losses["vgg_all"]) != 0.0


@pytest.mark.parametrize("dt_mergeDs,skip", [(True, True), (True, False),
                                             (False, True)])
def test_dst_box_warp_equivalence(rng, dt_mergeDs, skip):
    """Warping only the crop_dt box (box_warp=True, the default) must match
    the full-frame warp + mask/crop oracle in value and gradient — outside
    the box everything is zero-masked (dt_mergeDs) or cropped (pure Dt), so
    those gathers were pure waste (VERDICT r3 #1; reference
    Teco.py:216-220,230-234)."""
    from tecogan_tpu.train.losses import assemble_dst_inputs

    cfg = TecoConfig(num_resblock=2, crop_size=8, batch_size=2, rnn_n=4,
                     ratio=0.01, pingpong=True, dt_mergeDs=dt_mergeDs,
                     crop_dt=0.75, d_layerloss=dt_mergeDs)
    b, rnn_n, h = 2, 4, 8
    t = 2 * rnn_n - 1
    r_inputs = jnp.asarray(rng.rand(b, t, h, h, 3), jnp.float32)
    r_targets = jnp.asarray(rng.rand(b, t, 4 * h, 4 * h, 3), jnp.float32) * 2 - 1
    # Flows large enough that box queries sample OUTSIDE the box.
    flow_hr = jnp.asarray(rng.randn(b, t - 1, 4 * h, 4 * h, 2) * 6, jnp.float32)

    def outputs(gen, box):
        return assemble_dst_inputs(r_inputs, r_targets, gen, flow_hr, cfg,
                                   skip_identity_warp=skip, box_warp=box)

    gen = jnp.asarray(rng.rand(b, t, 4 * h, 4 * h, 3), jnp.float32) * 2 - 1
    for fast, slow in zip(outputs(gen, True), outputs(gen, False)):
        np.testing.assert_array_equal(np.asarray(fast), np.asarray(slow))

    def loss(gen, box):
        real, fake = outputs(gen, box)
        return jnp.sum(jnp.sin(fake) * real)

    # Scatter-add accumulation order differs (window vs full-frame index
    # sets), so gradients agree to float epsilon, not bit-exactly.
    g_fast = jax.grad(lambda g: loss(g, True))(gen)
    g_slow = jax.grad(lambda g: loss(g, False))(gen)
    np.testing.assert_allclose(
        np.asarray(g_fast), np.asarray(g_slow), rtol=3e-6, atol=5e-7)


@pytest.mark.parametrize("dt_mergeDs,skip,box", [
    (True, True, True), (True, False, True), (False, True, True),
    (True, True, False), (True, False, False),
])
def test_dst_merged_rf_warp_equivalence(rng, dt_mergeDs, skip, box):
    """One channel-merged gather over the real+fake pair (merge_rf=True, the
    default) must be BIT-identical to two separate warps in value, and match
    in gradient: the warp applies one set of indices/lerp weights per pixel
    to every channel independently (VERDICT r3 #8; the flows are shared,
    reference Teco.py:216-220)."""
    from tecogan_tpu.train.losses import assemble_dst_inputs

    cfg = TecoConfig(num_resblock=2, crop_size=8, batch_size=2, rnn_n=4,
                     ratio=0.01, pingpong=True, dt_mergeDs=dt_mergeDs,
                     crop_dt=0.75, d_layerloss=dt_mergeDs)
    b, rnn_n, h = 2, 4, 8
    t = 2 * rnn_n - 1
    r_inputs = jnp.asarray(rng.rand(b, t, h, h, 3), jnp.float32)
    r_targets = jnp.asarray(rng.rand(b, t, 4 * h, 4 * h, 3), jnp.float32) * 2 - 1
    flow_hr = jnp.asarray(rng.randn(b, t - 1, 4 * h, 4 * h, 2) * 6, jnp.float32)

    def outputs(gen, merge):
        return assemble_dst_inputs(r_inputs, r_targets, gen, flow_hr, cfg,
                                   skip_identity_warp=skip, box_warp=box,
                                   merge_rf=merge)

    gen = jnp.asarray(rng.rand(b, t, 4 * h, 4 * h, 3), jnp.float32) * 2 - 1
    for merged, separate in zip(outputs(gen, True), outputs(gen, False)):
        np.testing.assert_array_equal(np.asarray(merged), np.asarray(separate))

    def loss(gen, merge):
        real, fake = outputs(gen, merge)
        return jnp.sum(jnp.sin(fake) * real)

    g_merged = jax.grad(lambda g: loss(g, True))(gen)
    g_separate = jax.grad(lambda g: loss(g, False))(gen)
    np.testing.assert_allclose(
        np.asarray(g_merged), np.asarray(g_separate), rtol=3e-6, atol=5e-7)
