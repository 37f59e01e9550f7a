"""Model architecture tests: shapes, parameter counts (vs hand-computed
reference totals), and TF-semantics parity of the transposed conv."""

import flax
import jax
import jax.numpy as jnp
import numpy as np

from tecogan_tpu.models import Discriminator, FNet, Generator, VGG19Features
from tecogan_tpu.models.fnet import pad_flow_to


def n_params(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


def test_fnet_shape_and_params(rng):
    model = FNet()
    x = jnp.asarray(rng.rand(2, 32, 32, 6), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    flow = model.apply({"params": params}, x)
    assert flow.shape == (2, 32, 32, 2)
    # Bounded by max velocity (reference frvsr.py:39-40).
    assert float(jnp.max(jnp.abs(flow))) <= 24.0
    # Hand-computed from reference frvsr.py:4-41 conv shapes.
    assert n_params(params) == 1_745_506


def test_fnet_non_multiple_of_8(rng):
    """144x180 (calendar LR): output on //8 grid, symmetric pad back."""
    model = FNet()
    x = jnp.asarray(rng.rand(1, 16, 20, 6), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    flow = model.apply({"params": params}, x)
    assert flow.shape == (1, 16, 16, 2)  # 20//8*8 = 16
    padded = pad_flow_to(flow, 16, 20)
    assert padded.shape == (1, 16, 20, 2)
    # Symmetric pad mirrors the edge columns.
    np.testing.assert_array_equal(padded[:, :, 16], flow[:, :, 15])
    np.testing.assert_array_equal(padded[:, :, 17], flow[:, :, 14])


def test_generator_shape_and_params(rng):
    model = Generator(num_resblock=16)
    x = jnp.asarray(rng.rand(2, 8, 8, 51), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    out = model.apply({"params": params}, x)
    assert out.shape == (2, 32, 32, 3)
    # Hand-computed from reference frvsr.py:44-88 conv shapes @16 resblocks.
    assert n_params(params) == 1_286_723

    mini = Generator(num_resblock=10)
    p10 = mini.init(jax.random.PRNGKey(0), x)["params"]
    assert n_params(p10) == 1_286_723 - 6 * 73_856


def test_generator_zero_weights_is_bicubic_of_lr(rng):
    """With all-zero weights the generator reduces to preprocess(bicubic(LR)):
    validates the residual-skip wiring (reference frvsr.py:81-87)."""
    from tecogan_tpu.ops import bicubic_four, preprocess

    model = Generator(num_resblock=2)
    x = jnp.asarray(rng.rand(1, 6, 6, 51), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    zeros = jax.tree.map(jnp.zeros_like, params)
    out = model.apply({"params": zeros}, x)
    want = preprocess(bicubic_four(x[..., :3]))
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-6)


def test_discriminator_shape_params_and_layers(rng):
    model = Discriminator()
    x = jnp.asarray(rng.rand(2, 32, 32, 27), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    (out, layers), _ = model.apply(variables, x, mutable=["batch_stats"])
    assert out.shape == (2, 2, 2, 1)
    assert float(jnp.min(out)) >= 0.0 and float(jnp.max(out)) <= 1.0
    assert [l.shape for l in layers] == [
        (2, 16, 16, 64),
        (2, 8, 8, 64),
        (2, 4, 4, 128),
        (2, 2, 2, 256),
    ]
    # Hand-computed from reference Teco.py:30-74 conv shapes.
    assert n_params(variables["params"]) == 802_817
    assert n_params(variables["batch_stats"]) == 1_024


def test_conv_transpose_matches_tf_semantics(rng):
    """TF conv2d_transpose == adjoint (VJP) of a SAME strided conv.

    Extract the flax ConvTranspose kernel, build the true adjoint with
    jax.vjp, and require equality — this nails the output-padding rules that
    differ between libraries.
    """
    from tecogan_tpu.models.layers import conv2_tran
    import flax.linen as nn

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            return conv2_tran(x, 5, kernel=3, stride=2, use_bias=False)

    m = M()
    y = jnp.asarray(rng.rand(2, 7, 9, 4), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), y)["params"]
    got = m.apply({"params": params}, y)
    assert got.shape == (2, 14, 18, 5)

    kernel = params["conv_tran"]["kernel"]  # transpose_kernel=True layout
    # Adjoint oracle: forward f maps HR (2,14,18,5) -> LR (2,7,9,4) with a
    # SAME stride-2 conv whose HWIO kernel has in=5, out=4.
    assert kernel.shape[2:] == (5, 4) or kernel.shape[2:] == (4, 5)
    k_hwio = kernel if kernel.shape[2:] == (5, 4) else kernel.transpose(0, 1, 3, 2)

    def fwd(x_hr):
        return jax.lax.conv_general_dilated(
            x_hr,
            k_hwio,
            window_strides=(2, 2),
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    x0 = jnp.zeros((2, 14, 18, 5), jnp.float32)
    _, vjp = jax.vjp(fwd, x0)
    (want,) = vjp(y)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_vgg19_endpoints(rng):
    model = VGG19Features()
    x = jnp.asarray(rng.rand(1, 32, 32, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    feats = model.apply({"params": params}, x)
    assert feats["conv2_2"].shape == (1, 16, 16, 128)
    assert feats["conv3_4"].shape == (1, 8, 8, 256)
    assert feats["conv4_4"].shape == (1, 4, 4, 512)
    assert feats["conv5_4"].shape == (1, 2, 2, 512)
    # VGG19 conv-tower param count (no classifier): standard 20.02M.
    assert n_params(params) == 20_024_384


def test_generator_apply_fused_matches_flax(rng):
    """Pure-pytree fused-trunk apply == Generator.apply (XLA path on CPU)."""
    import jax
    import jax.numpy as jnp

    from tecogan_tpu.models import Generator
    from tecogan_tpu.models.generator import generator_apply_fused

    gen = Generator(num_resblock=3, channels=64)
    x = jnp.asarray(rng.rand(2, 16, 20, 51).astype(np.float32))
    p = gen.init(jax.random.PRNGKey(0), x)["params"]
    a = np.asarray(gen.apply({"params": p}, x))
    b = np.asarray(generator_apply_fused(p, x, num_resblock=3))
    np.testing.assert_array_equal(a, b)


def test_generator_apply_plain_matches_flax(rng):
    """Pure-pytree replica (the 2160p convT A/B carrier) == Generator.apply
    bit-exactly at _CONVTRAN_MODE="direct"; "phase" matches to float eps
    (exact arithmetic reassociation, ops/convtran.py)."""
    import jax
    import jax.numpy as jnp

    from tecogan_tpu.models import Generator
    from tecogan_tpu.models import generator as gen_mod

    gen = Generator(num_resblock=3, channels=64)
    x = jnp.asarray(rng.rand(2, 16, 20, 51).astype(np.float32))
    p = gen.init(jax.random.PRNGKey(0), x)["params"]
    want = np.asarray(gen.apply({"params": p}, x))
    got = np.asarray(gen_mod.generator_apply_plain(p, x, num_resblock=3))
    np.testing.assert_array_equal(want, got)

    orig = gen_mod._CONVTRAN_MODE
    try:
        gen_mod._CONVTRAN_MODE = "phase"
        got_phase = np.asarray(
            gen_mod.generator_apply_plain(p, x, num_resblock=3))
    finally:
        gen_mod._CONVTRAN_MODE = orig
    np.testing.assert_allclose(want, got_phase, rtol=2e-5, atol=2e-5)


def test_generator_apply_hr_input_matches_flax(rng):
    """s2d folded into a stride-4 HR input conv == flax Generator on
    concat(lr, s2d(warped)) (models/generator.py:generator_apply_hr_input)."""
    import jax
    from tecogan_tpu.models.generator import Generator, generator_apply_hr_input
    from tecogan_tpu.ops import space_to_depth

    h, w = 12, 16
    gen = Generator(num_resblock=3, channels=64)
    lr = jnp.asarray(rng.rand(2, h, w, 3).astype(np.float32))
    warped = jnp.asarray(rng.rand(2, 4 * h, 4 * w, 3).astype(np.float32))
    x = jnp.concatenate([lr, space_to_depth(warped, 4)], axis=-1)
    p = gen.init(jax.random.PRNGKey(0), x)["params"]
    want = gen.apply({"params": p}, x)
    got = generator_apply_hr_input(p, lr, warped, num_resblock=3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    # patchify mode: the s2d runs as a 0/1-selection conv — exact, so the
    # whole forward is bit-identical to the flax module.
    got_p = generator_apply_hr_input(p, lr, warped, num_resblock=3,
                                     s2d_mode="patchify")
    np.testing.assert_array_equal(np.asarray(got_p), np.asarray(want))


def test_tappack_output_conv_matches_direct(rng):
    """The tap-packed narrow-output conv (one K=in,N=9*out matmul + 9
    shifted adds) == the plain SAME conv up to f32 reassociation."""
    import jax
    from tecogan_tpu.models import layers

    x = jnp.asarray(rng.rand(2, 16, 20, 64).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 64, 3).astype(np.float32)) * 0.1
    b = jnp.asarray(rng.randn(3).astype(np.float32))
    want = layers.apply_output_conv(x, k, b)
    old = layers._OUTCONV_SMALL_MODE
    try:
        layers._OUTCONV_SMALL_MODE = "tappack"
        got = layers.apply_output_conv(x, k, b)
    finally:
        layers._OUTCONV_SMALL_MODE = old
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_streaming_patchify_input_matches_default():
    """StreamingSR(fold_input_s2d='patchify') == default path."""
    import jax
    from tecogan_tpu.config import TecoConfig
    from tecogan_tpu.models import FNet, Generator
    from tecogan_tpu.recurrent.inference import StreamingSR

    h, w = 16, 16
    cfg = TecoConfig(num_resblock=2, compute_dtype="float32", infer_chunk=3)
    gen = Generator(num_resblock=2, channels=cfg.gen_channels)
    fnet = FNet(channels=cfg.fnet_channels, up_channels=cfg.fnet_up_channels,
                max_velocity=cfg.flow_max_velocity)
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    gp = gen.init(k1, jnp.zeros((1, h, w, 51)))["params"]
    fp = fnet.init(k2, jnp.zeros((1, h, w, 6)))["params"]
    frames = np.random.RandomState(3).rand(5, h, w, 3).astype(np.float32)
    ref, _ = StreamingSR(cfg, gp, fp).run(frames)
    got, _ = StreamingSR(cfg.replace(fold_input_s2d="patchify"), gp, fp).run(
        frames)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_streaming_fold_input_s2d_matches_default():
    """StreamingSR(fold_input_s2d='on') == default path, bit-for-bit ops
    modulo float reassociation."""
    import jax
    from tecogan_tpu.config import TecoConfig
    from tecogan_tpu.models import FNet, Generator
    from tecogan_tpu.recurrent.inference import StreamingSR

    h, w = 16, 16
    cfg = TecoConfig(num_resblock=2, compute_dtype="float32", infer_chunk=3)
    gen = Generator(num_resblock=2, channels=cfg.gen_channels)
    fnet = FNet(channels=cfg.fnet_channels, up_channels=cfg.fnet_up_channels,
                max_velocity=cfg.flow_max_velocity)
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    gp = gen.init(k1, jnp.zeros((1, h, w, 51)))["params"]
    fp = fnet.init(k2, jnp.zeros((1, h, w, 6)))["params"]
    frames = np.random.RandomState(1).rand(5, h, w, 3).astype(np.float32)
    ref, _ = StreamingSR(cfg, gp, fp).run(frames)
    got, _ = StreamingSR(cfg.replace(fold_input_s2d="on"), gp, fp).run(frames)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_streaming_inline_flow_matches_default():
    """StreamingSR(inline_flow='on') == default path (the per-tile flow
    upsample is bit-exact vs the global legacy bilinear; ops/warp.py)."""
    import jax
    from tecogan_tpu.config import TecoConfig
    from tecogan_tpu.models import FNet, Generator
    from tecogan_tpu.recurrent.inference import StreamingSR

    h, w = 16, 16
    cfg = TecoConfig(num_resblock=2, compute_dtype="float32", infer_chunk=3)
    gen = Generator(num_resblock=2, channels=cfg.gen_channels)
    fnet = FNet(channels=cfg.fnet_channels, up_channels=cfg.fnet_up_channels,
                max_velocity=cfg.flow_max_velocity)
    k1, k2 = jax.random.split(jax.random.PRNGKey(2))
    gp = gen.init(k1, jnp.zeros((1, h, w, 51)))["params"]
    fp = fnet.init(k2, jnp.zeros((1, h, w, 6)))["params"]
    frames = np.random.RandomState(2).rand(5, h, w, 3).astype(np.float32)
    ref, _ = StreamingSR(cfg, gp, fp).run(frames)
    got, _ = StreamingSR(cfg.replace(inline_flow="on"), gp, fp).run(frames)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
