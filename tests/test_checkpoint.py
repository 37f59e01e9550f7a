"""Checkpoint tests: full resume, warm start, npz interchange, TF-name
conversion."""

import jax
import jax.numpy as jnp
import numpy as np

from tecogan_tpu.config import TecoConfig
from tecogan_tpu.train import Trainer
from tecogan_tpu.train.checkpoint import (
    convert_tf_npz,
    latest_step,
    npz_to_params,
    params_to_npz,
    restore_checkpoint,
    save_checkpoint,
    warm_start,
)


def tiny_cfg(**kw):
    base = dict(
        num_resblock=2, crop_size=8, batch_size=1, rnn_n=3,
        vgg_scaling=-0.002, remat_generator=False,
    )
    base.update(kw)
    return TecoConfig(**base)


def trees_equal(a, b):
    return all(
        jax.tree.leaves(
            jax.tree.map(lambda x, y: bool(jnp.all(x == y)), a, b)
        )
    )


def test_save_restore_roundtrip(tmp_path, rng):
    cfg = tiny_cfg(ratio=0.01, pingpong=True)
    trainer = Trainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    tar = cfg.hr_load_size
    batch = jnp.asarray(rng.rand(1, 3, tar, tar, 3).astype(np.float32))
    state, _ = trainer.train_step(state, batch)

    d = str(tmp_path / "ckpt")
    save_checkpoint(d, state, int(state.step))
    assert latest_step(d) == 1

    template = trainer.init_state(jax.random.PRNGKey(1))
    restored = restore_checkpoint(d, template)
    assert int(restored.step) == 1
    assert trees_equal(restored.gen_params, state.gen_params)
    assert trees_equal(restored.d_params, state.d_params)
    assert trees_equal(restored.gen_opt, state.gen_opt)


def test_warm_start_frvsr_to_tecogan(tmp_path, rng):
    """FRVSR checkpoint seeds TecoGAN: G/F weights load, D stays fresh,
    opt state and step reset (reference main.py:312-320)."""
    frvsr_cfg = tiny_cfg(ratio=-0.01)
    frvsr = Trainer(frvsr_cfg)
    fstate = frvsr.init_state(jax.random.PRNGKey(0))
    tar = frvsr_cfg.hr_load_size
    batch = jnp.asarray(rng.rand(1, 3, tar, tar, 3).astype(np.float32))
    fstate, _ = frvsr.train_step(fstate, batch)
    d = str(tmp_path / "frvsr")
    save_checkpoint(d, fstate, 1)

    teco_cfg = tiny_cfg(ratio=0.01, pingpong=True)
    teco = Trainer(teco_cfg)
    tstate = teco.init_state(jax.random.PRNGKey(7))
    d_fresh = jax.tree.map(lambda x: x.copy(), tstate.d_params)
    seeded = warm_start(tstate, d)
    assert trees_equal(seeded.gen_params, fstate.gen_params)
    assert trees_equal(seeded.fnet_params, fstate.fnet_params)
    assert trees_equal(seeded.d_params, d_fresh)  # no D in FRVSR ckpt
    assert int(seeded.step) == 0  # fresh training


def test_warm_start_grow_resblocks_zero_fill_identity(tmp_path, rng):
    """The canonical case-3 depth grow (10-block FRVSR ckpt -> 16-block
    TecoGAN, reference runGan.py:161,200-203): the intersection loads, each
    grown resblock's conv_2 is ZERO-filled (the block is an exact identity,
    reference rest_zero=True main.py:312-320) and its conv_1 keeps fresh init
    so the block can actually TRAIN (the reference's all-zero fill is a
    permanent saddle — see merge_partial_restore)."""
    from tecogan_tpu.models import Generator

    shallow = Trainer(tiny_cfg(num_resblock=2, ratio=-0.01))
    sstate = shallow.init_state(jax.random.PRNGKey(0))
    d = str(tmp_path / "frvsr2")
    save_checkpoint(d, sstate, 0)

    deep = Trainer(tiny_cfg(num_resblock=4, ratio=0.01, pingpong=True))
    dstate = deep.init_state(jax.random.PRNGKey(7))
    seeded = warm_start(dstate, d)

    # Intersection restored; grown blocks: conv_2 zeroed, conv_1 fresh.
    for i in (1, 2):
        assert trees_equal(seeded.gen_params[f"resblock_{i}_conv_1"],
                           sstate.gen_params[f"resblock_{i}_conv_1"])
    for i in (3, 4):
        assert all(bool(jnp.all(x == 0)) for x in jax.tree.leaves(
            seeded.gen_params[f"resblock_{i}_conv_2"]))
        assert trees_equal(seeded.gen_params[f"resblock_{i}_conv_1"],
                           dstate.gen_params[f"resblock_{i}_conv_1"])
    assert trees_equal(seeded.fnet_params, sstate.fnet_params)

    # Identity property: the 4-block seeded generator == the 2-block source.
    x = jnp.asarray(rng.rand(1, 8, 8, 51).astype(np.float32))
    out4 = Generator(num_resblock=4).apply({"params": seeded.gen_params}, x)
    out2 = Generator(num_resblock=2).apply({"params": sstate.gen_params}, x)
    np.testing.assert_array_equal(np.asarray(out4), np.asarray(out2))

    # Trainability: one step moves the grown conv_2 kernel off zero (under
    # the reference's all-zero fill its gradient is exactly zero forever).
    tar = deep.config.hr_load_size
    batch = jnp.asarray(rng.rand(1, 3, tar, tar, 3).astype(np.float32))
    stepped, _ = deep.train_step(seeded, batch)
    assert bool(jnp.any(stepped.gen_params["resblock_3_conv_2"]["kernel"] != 0))


def test_warm_start_shrink_resblocks_intersection(tmp_path, rng):
    """A deeper checkpoint into a shallower model restores the intersection
    (reference get_existing_from_ckpt finds every graph var in the ckpt and
    ignores the extra tensors, ops.py:370-391) and says what went unused."""
    deep = Trainer(tiny_cfg(num_resblock=4, ratio=-0.01))
    dstate = deep.init_state(jax.random.PRNGKey(0))
    d = str(tmp_path / "deep4")
    save_checkpoint(d, dstate, 0)

    shallow = Trainer(tiny_cfg(num_resblock=2, ratio=-0.01))
    sstate = shallow.init_state(jax.random.PRNGKey(3))
    seeded = warm_start(sstate, d)
    for i in (1, 2):
        for c in ("conv_1", "conv_2"):
            assert trees_equal(seeded.gen_params[f"resblock_{i}_{c}"],
                               dstate.gen_params[f"resblock_{i}_{c}"])
    assert trees_equal(seeded.gen_params["input_stage_conv"],
                       dstate.gen_params["input_stage_conv"])
    assert trees_equal(seeded.fnet_params, dstate.fnet_params)


def test_warm_start_channel_mismatch_raises(tmp_path, rng):
    """A genuine wrong-model warm start (same-named leaf, different shape)
    must ERROR, not silently keep fresh init (reference ops.py:382-384
    raises the same way): a silent miss once made a 'warm-started' GAN run
    train from scratch (round-5 train->eval harness)."""
    import pytest

    wide_cfg = tiny_cfg(num_resblock=2, gen_channels=32, ratio=-0.01)
    wide = Trainer(wide_cfg)
    wstate = wide.init_state(jax.random.PRNGKey(0))
    d = str(tmp_path / "wide")
    save_checkpoint(d, wstate, 1)

    normal = Trainer(tiny_cfg(num_resblock=2, ratio=-0.01))
    nstate = normal.init_state(jax.random.PRNGKey(1))
    with pytest.raises(ValueError, match="shape mismatch"):
        warm_start(nstate, d)


def test_inference_restore_reconciles_num_resblock(tmp_path, rng):
    """cli.main inference derives model depth from the checkpoint tree
    (flax silently ignores extra param subtrees, so a mismatched
    --num_resblock used to truncate the trunk without a word)."""
    from tecogan_tpu.cli.main import build_parser, config_from_args, \
        load_inference_params
    from tecogan_tpu.train.checkpoint import detect_num_resblock

    cfg = tiny_cfg(num_resblock=3, ratio=-0.01)
    trainer = Trainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    d = str(tmp_path / "ckpt")
    save_checkpoint(d, state, 1)

    args = build_parser().parse_args(
        ["--mode", "inference", "--output_dir", str(tmp_path),
         "--checkpoint", d, "--num_resblock", "2"])
    gp, fp, out_cfg = load_inference_params(args, config_from_args(args))
    assert detect_num_resblock(gp) == 3
    assert out_cfg.num_resblock == 3
    assert trees_equal(gp, state.gen_params)


def test_params_npz_roundtrip(tmp_path):
    cfg = tiny_cfg()
    trainer = Trainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    p = str(tmp_path / "w.npz")
    params_to_npz(p, generator=state.gen_params, fnet=state.fnet_params)
    out = npz_to_params(
        p, {"generator": state.gen_params, "fnet": state.fnet_params}
    )
    assert trees_equal(out["generator"], state.gen_params)
    assert trees_equal(out["fnet"], state.fnet_params)


def _synth_tf_npz(path, num_resblock, seed=0):
    """Synthesize an FRVSR-style TF-named npz with `num_resblock` blocks."""
    rng = np.random.RandomState(seed)
    data = {}

    def add_conv(scope, cin, cout, k=3):
        data[f"{scope}/Conv/weights"] = rng.randn(k, k, cin, cout).astype(np.float32)
        data[f"{scope}/Conv/biases"] = rng.randn(cout).astype(np.float32)

    def add_tran(scope, cin, cout, k=3):
        # TF layout [k, k, out, in]
        data[f"{scope}/Conv2d_transpose/weights"] = rng.randn(
            k, k, cout, cin
        ).astype(np.float32)
        data[f"{scope}/Conv2d_transpose/biases"] = rng.randn(cout).astype(np.float32)

    g = "generator/generator_unit"
    add_conv(f"{g}/input_stage/conv", 51, 64)
    for i in range(1, num_resblock + 1):
        add_conv(f"{g}/resblock_{i}/conv_1", 64, 64)
        add_conv(f"{g}/resblock_{i}/conv_2", 64, 64)
    add_tran(f"{g}/conv_tran2highres/conv_tran1", 64, 64)
    add_tran(f"{g}/conv_tran2highres/conv_tran2", 64, 64)
    add_conv(f"{g}/output_stage/conv", 64, 3)

    f = "fnet/autoencode_unit"
    enc_ch = [(6, 32), (32, 64), (64, 128)]
    dec_ch = [(128, 256), (256, 128), (128, 64)]
    for i in (1, 2, 3):
        ci, co = enc_ch[i - 1]
        add_conv(f"{f}/encoder_{i}/conv_1", ci, co)
        add_conv(f"{f}/encoder_{i}/conv_2", co, co)
        ci, co = dec_ch[i - 1]
        add_conv(f"{f}/decoder_{i}/conv_1", ci, co)
        add_conv(f"{f}/decoder_{i}/conv_2", co, co)
    add_conv(f"{f}/output_stage/conv1", 64, 32)
    add_conv(f"{f}/output_stage/conv2", 32, 2)
    np.savez(path, **data)


def test_convert_tf_npz(tmp_path):
    """Synthesize a TF-named npz and verify it converts and actually runs
    through the models."""
    path = str(tmp_path / "tf.npz")
    _synth_tf_npz(path, num_resblock=2)
    converted = convert_tf_npz(path, num_resblock=2)
    # Depth auto-detection from the checkpoint's own variable names.
    auto = convert_tf_npz(path, num_resblock=None)
    assert trees_equal(auto["generator"], converted["generator"])

    # Structures must match freshly initialized models, and apply must run.
    from tecogan_tpu.models import FNet, Generator

    gen = Generator(num_resblock=2)
    fnet = FNet()
    gp = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 51)))["params"]
    fp = fnet.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 6)))["params"]
    assert jax.tree.structure(converted["generator"]) == jax.tree.structure(gp)
    assert jax.tree.structure(converted["fnet"]) == jax.tree.structure(fp)
    out = gen.apply({"params": converted["generator"]}, jnp.zeros((1, 8, 8, 51)))
    assert out.shape == (1, 32, 32, 3)
    flow = fnet.apply({"params": converted["fnet"]}, jnp.zeros((1, 8, 8, 6)))
    assert flow.shape == (1, 8, 8, 2)


def test_warm_start_tf_npz_grow_identity(tmp_path, rng):
    """Reference case 3 verbatim: the published 10-block FRVSR npz seeds a
    deeper TecoGAN (runGan.py:161,200-203) — here 2 -> 4 blocks through the
    npz warm-start dispatch; rest_zero makes the grown generator compute the
    npz model's function exactly at step 0."""
    from tecogan_tpu.models import Generator

    path = str(tmp_path / "frvsr.npz")
    _synth_tf_npz(path, num_resblock=2)
    teco = Trainer(tiny_cfg(num_resblock=4, ratio=0.01, pingpong=True))
    tstate = teco.init_state(jax.random.PRNGKey(7))
    seeded = warm_start(tstate, path)  # .npz path dispatches to the converter

    src = convert_tf_npz(path, num_resblock=None)
    x = jnp.asarray(rng.rand(1, 8, 8, 51).astype(np.float32))
    out4 = Generator(num_resblock=4).apply({"params": seeded.gen_params}, x)
    out2 = Generator(num_resblock=2).apply({"params": src["generator"]}, x)
    np.testing.assert_array_equal(np.asarray(out4), np.asarray(out2))
    assert trees_equal(seeded.fnet_params, src["fnet"])


def test_convert_tf_npz_full_inventory(tmp_path):
    """Converter vs the *real* checkpoint variable set: 16 resblocks,
    discriminator (incl. BatchNorm stats), Adam slot variables for every
    trainable var, beta powers, loss-EMA shadows and global_step
    (reference frvsr.py:26-80, Teco.py:44-71, main.py:307-309 — the Saver
    persists all GLOBAL_VARIABLES). Weight-porting must ignore the
    optimizer/EMA extras and land every model var."""
    rng = np.random.RandomState(1)
    data = {}

    def add(name, shape):
        data[name] = rng.randn(*shape).astype(np.float32)
        # Adam slot variables as saved by a training checkpoint.
        data[name + "/Adam"] = np.zeros(shape, np.float32)
        data[name + "/Adam_1"] = np.zeros(shape, np.float32)

    def add_conv(scope, cin, cout, k=3, bias=True):
        add(f"{scope}/Conv/weights", (k, k, cin, cout))
        if bias:
            add(f"{scope}/Conv/biases", (cout,))

    g = "generator/generator_unit"
    add_conv(f"{g}/input_stage/conv", 51, 64)
    for i in range(1, 17):
        add_conv(f"{g}/resblock_{i}/conv_1", 64, 64)
        add_conv(f"{g}/resblock_{i}/conv_2", 64, 64)
    for t in ("conv_tran1", "conv_tran2"):
        add(f"{g}/conv_tran2highres/{t}/Conv2d_transpose/weights", (3, 3, 64, 64))
        add(f"{g}/conv_tran2highres/{t}/Conv2d_transpose/biases", (64,))
    add_conv(f"{g}/output_stage/conv", 64, 3)

    f = "fnet/autoencode_unit"
    enc_ch = [(6, 32), (32, 64), (64, 128)]
    dec_ch = [(128, 256), (256, 128), (128, 64)]
    for i in (1, 2, 3):
        ci, co = enc_ch[i - 1]
        add_conv(f"{f}/encoder_{i}/conv_1", ci, co)
        add_conv(f"{f}/encoder_{i}/conv_2", co, co)
        ci, co = dec_ch[i - 1]
        add_conv(f"{f}/decoder_{i}/conv_1", ci, co)
        add_conv(f"{f}/decoder_{i}/conv_2", co, co)
    add_conv(f"{f}/output_stage/conv1", 64, 32)
    add_conv(f"{f}/output_stage/conv2", 32, 2)

    d = "tdiscriminator/discriminator_unit"
    add_conv(f"{d}/input_stage/conv", 27, 64)
    for idx, (ci, co) in zip((1, 3, 5, 7), [(64, 64), (64, 64), (64, 128), (128, 256)]):
        add(f"{d}/disblock_{idx}/conv1/Conv/weights", (4, 4, ci, co))
        add(f"{d}/disblock_{idx}/BatchNorm/beta", (co,))
        # moving stats are saved but have no Adam slots
        data[f"{d}/disblock_{idx}/BatchNorm/moving_mean"] = np.zeros(co, np.float32)
        data[f"{d}/disblock_{idx}/BatchNorm/moving_variance"] = np.ones(co, np.float32)
    add(f"{d}/dense_layer_2/dense/kernel", (256, 1))
    add(f"{d}/dense_layer_2/dense/bias", (1,))

    # Optimizer/bookkeeping extras present in every training checkpoint.
    data["global_step"] = np.int64(913000)
    for scope in ("generator_optimizer", "fnet_optimizer", "tdiscriminator_optimizer"):
        data[f"{scope}/beta1_power"] = np.float32(0.9)
        data[f"{scope}/beta2_power"] = np.float32(0.999)
    data["l2_content_loss/ExponentialMovingAverage"] = np.float32(0.1)
    data["t_balance/ExponentialMovingAverage"] = np.float32(0.2)

    path = str(tmp_path / "tf_full.npz")
    np.savez(path, **data)
    converted = convert_tf_npz(path, num_resblock=16)
    assert converted["global_step"] == 913000

    from tecogan_tpu.models import Discriminator, FNet, Generator

    gen = Generator(num_resblock=16)
    fnet = FNet()
    disc = Discriminator()
    gp = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 51)))["params"]
    fp = fnet.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 6)))["params"]
    dv = disc.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 27)))
    assert jax.tree.structure(converted["generator"]) == jax.tree.structure(gp)
    assert jax.tree.structure(converted["fnet"]) == jax.tree.structure(fp)
    assert jax.tree.structure(converted["discriminator"]) == jax.tree.structure(
        dv["params"])
    assert jax.tree.structure(
        converted["discriminator_batch_stats"]
    ) == jax.tree.structure(dv["batch_stats"])
    # Shapes too, not just structure.
    jax.tree.map(lambda a, b: None if a.shape == b.shape else 1 / 0,
                 converted["discriminator"], dv["params"])
    (out, layers), _ = disc.apply(
        {"params": converted["discriminator"],
         "batch_stats": converted["discriminator_batch_stats"]},
        jnp.zeros((1, 32, 32, 27)), mutable=["batch_stats"])
    assert out.shape == (1, 2, 2, 1) and len(layers) == 4
