"""Converter activation-equality gate (VERDICT r2 #5).

An INDEPENDENT numpy implementation of TF-slim layer semantics — conv2d
SAME (reference lib/ops.py:47-56), conv2d_transpose SAME with the
[k, k, out, in] kernel layout (lib/ops.py:35-44), batch_norm center-only
eps 1e-3 batch-stats (lib/ops.py:88-90), and the channel-wise dense head
(lib/ops.py:96-103) — drives full-model forwards directly from a TF-named
weight dict. The same dict goes through ``convert_tf_npz`` into the flax
models; activations (not just names/shapes) must match.

This is the gate that would catch a silent converter layout/semantics bug
(convT kernel orientation, dense reshape, BN beta placement) BEFORE the
network-gated pretrained weights ever arrive: if the flax forward equals
TF-slim-semantics numpy on random weights, it equals it on the published
checkpoint too.

The numpy oracles are written from the TF padding/adjoint definitions, not
from the JAX implementation:
- SAME conv: out = ceil(h/s); pad_total = max((out-1)*s + k - h, 0),
  pad_before = pad_total // 2 (zeros).
- conv2d_transpose(z, K[kh,kw,out,in], stride s): the adjoint of the SAME
  strided conv — out[p] += z[q] @ K[k].T wherever q*s + k - pad_before = p,
  with pad for the corresponding forward conv (h*s -> h).
"""

import jax
import jax.numpy as jnp
import numpy as np

from tecogan_tpu.train.checkpoint import convert_tf_npz

from tests.test_ops import np_resize_bilinear_legacy, np_resize_bicubic_legacy4


# --------------------------------------------------------------- np layers
def np_conv2d_same(x, K, b=None, stride=1):
    """TF conv2d, SAME, NHWC x [kh, kw, in, out]."""
    n, h, w, cin = x.shape
    kh, kw, _, cout = K.shape
    oh, ow = -(-h // stride), -(-w // stride)
    ph = max((oh - 1) * stride + kh - h, 0)
    pw = max((ow - 1) * stride + kw - w, 0)
    pt, pl = ph // 2, pw // 2
    xp = np.zeros((n, h + ph, w + pw, cin), np.float64)
    xp[:, pt:pt + h, pl:pl + w] = x
    out = np.zeros((n, oh, ow, cout), np.float64)
    for dy in range(kh):
        for dx in range(kw):
            patch = xp[:, dy:dy + (oh - 1) * stride + 1:stride,
                       dx:dx + (ow - 1) * stride + 1:stride, :]
            out += patch @ K[dy, dx].astype(np.float64)
    if b is not None:
        out += b
    return out


def np_conv2d_transpose_same(z, K, b=None, stride=2):
    """TF conv2d_transpose, SAME, kernel [kh, kw, OUT, IN] (note the order),
    output spatial = input * stride."""
    n, h, w, cin = z.shape
    kh, kw, cout, cin2 = K.shape
    assert cin == cin2, (K.shape, z.shape)
    oh, ow = h * stride, w * stride
    ph = max((h - 1) * stride + kh - oh, 0)
    pw = max((w - 1) * stride + kw - ow, 0)
    pt, pl = ph // 2, pw // 2
    out = np.zeros((n, oh + ph, ow + pw, cout), np.float64)
    z64 = z.astype(np.float64)
    for dy in range(kh):
        for dx in range(kw):
            out[:, dy:dy + (h - 1) * stride + 1:stride,
                dx:dx + (w - 1) * stride + 1:stride, :] += (
                z64 @ K[dy, dx].T.astype(np.float64))
    out = out[:, pt:pt + oh, pl:pl + ow]
    if b is not None:
        out += b
    return out


def np_lrelu(x, alpha=0.2):
    return np.where(x >= 0, x, alpha * x)


def np_maxpool_2x2(x):
    n, h, w, c = x.shape
    return x[:, :h - h % 2, :w - w % 2].reshape(
        n, h // 2, 2, w // 2, 2, c).max(axis=(2, 4))


def np_batchnorm_slim(x, beta, eps=1e-3):
    """slim.batch_norm, center-only, training-mode batch statistics
    (biased variance) — the discriminator is built is_training=True
    unconditionally (reference Teco.py:38)."""
    mean = x.mean(axis=(0, 1, 2))
    var = x.var(axis=(0, 1, 2))
    return (x - mean) / np.sqrt(var + eps) + beta


# ------------------------------------------------------------- np forwards
def np_generator_forward(data, x51, num_resblock):
    g = "generator/generator_unit"

    def conv(scope, v):
        return np_conv2d_same(v, data[f"{scope}/Conv/weights"],
                              data[f"{scope}/Conv/biases"])

    net = np.maximum(conv(f"{g}/input_stage/conv", x51), 0.0)
    for i in range(1, num_resblock + 1):
        skip = net
        net = np.maximum(conv(f"{g}/resblock_{i}/conv_1", net), 0.0)
        net = conv(f"{g}/resblock_{i}/conv_2", net) + skip
    for t in ("conv_tran1", "conv_tran2"):
        s = f"{g}/conv_tran2highres/{t}"
        net = np.maximum(
            np_conv2d_transpose_same(
                net, data[f"{s}/Conv2d_transpose/weights"],
                data[f"{s}/Conv2d_transpose/biases"]), 0.0)
    net = conv(f"{g}/output_stage/conv", net)
    net = net + np_resize_bicubic_legacy4(x51[..., :3].astype(np.float64))
    return net * 2.0 - 1.0  # preprocess (reference frvsr.py:87)


def np_fnet_forward(data, x6, max_velocity=24.0):
    f = "fnet/autoencode_unit"

    def conv(scope, v):
        return np_conv2d_same(v, data[f"{scope}/Conv/weights"],
                              data[f"{scope}/Conv/biases"])

    net = x6.astype(np.float64)
    for i in (1, 2, 3):
        net = np_lrelu(conv(f"{f}/encoder_{i}/conv_1", net))
        net = np_lrelu(conv(f"{f}/encoder_{i}/conv_2", net))
        net = np_maxpool_2x2(net)
    for i in (1, 2, 3):
        net = np_lrelu(conv(f"{f}/decoder_{i}/conv_1", net))
        net = np_lrelu(conv(f"{f}/decoder_{i}/conv_2", net))
        net = np_resize_bilinear_legacy(net, 2)
    net = np_lrelu(conv(f"{f}/output_stage/conv1", net))
    net = conv(f"{f}/output_stage/conv2", net)
    return np.tanh(net) * max_velocity


def np_discriminator_forward(data, x):
    d = "tdiscriminator/discriminator_unit"
    net = np_lrelu(np_conv2d_same(
        x, data[f"{d}/input_stage/conv/Conv/weights"],
        data[f"{d}/input_stage/conv/Conv/biases"]))
    layers = []
    for idx in (1, 3, 5, 7):
        net = np_conv2d_same(
            net, data[f"{d}/disblock_{idx}/conv1/Conv/weights"], stride=2)
        net = np_batchnorm_slim(net, data[f"{d}/disblock_{idx}/BatchNorm/beta"])
        net = np_lrelu(net)
        layers.append(net)
    net = net @ data[f"{d}/dense_layer_2/dense/kernel"].astype(np.float64) \
        + data[f"{d}/dense_layer_2/dense/bias"]
    return 1.0 / (1.0 + np.exp(-net)), layers


# ------------------------------------------------------- checkpoint factory
def make_fake_checkpoint(rng, num_resblock=2, d_channels=27):
    """Random weights under the exact TF-slim names of the published
    checkpoints (SURVEY.md §5 namespace contract). Kernels scaled down so a
    deep trunk keeps activations O(1)."""
    data = {}

    def add_conv(scope, cin, cout, k=3, scale=0.1, bias=True):
        data[f"{scope}/Conv/weights"] = (
            rng.randn(k, k, cin, cout) * scale).astype(np.float32)
        if bias:
            data[f"{scope}/Conv/biases"] = (
                rng.randn(cout) * 0.1).astype(np.float32)

    def add_tran(scope, cin, cout, k=3, scale=0.1):
        data[f"{scope}/Conv2d_transpose/weights"] = (
            rng.randn(k, k, cout, cin) * scale).astype(np.float32)
        data[f"{scope}/Conv2d_transpose/biases"] = (
            rng.randn(cout) * 0.1).astype(np.float32)

    g = "generator/generator_unit"
    add_conv(f"{g}/input_stage/conv", 51, 64)
    for i in range(1, num_resblock + 1):
        add_conv(f"{g}/resblock_{i}/conv_1", 64, 64, scale=0.05)
        add_conv(f"{g}/resblock_{i}/conv_2", 64, 64, scale=0.05)
    add_tran(f"{g}/conv_tran2highres/conv_tran1", 64, 64)
    add_tran(f"{g}/conv_tran2highres/conv_tran2", 64, 64)
    add_conv(f"{g}/output_stage/conv", 64, 3)

    # fnet kernels scaled so the pre-tanh output stays in tanh's sensitive
    # range — saturated +-max_velocity plateaus would mask layout bugs.
    f = "fnet/autoencode_unit"
    enc_ch = [(6, 32), (32, 64), (64, 128)]
    dec_ch = [(128, 256), (256, 128), (128, 64)]
    for i in (1, 2, 3):
        ci, co = enc_ch[i - 1]
        add_conv(f"{f}/encoder_{i}/conv_1", ci, co, scale=0.02)
        add_conv(f"{f}/encoder_{i}/conv_2", co, co, scale=0.02)
        ci, co = dec_ch[i - 1]
        add_conv(f"{f}/decoder_{i}/conv_1", ci, co, scale=0.02)
        add_conv(f"{f}/decoder_{i}/conv_2", co, co, scale=0.02)
    add_conv(f"{f}/output_stage/conv1", 64, 32, scale=0.02)
    add_conv(f"{f}/output_stage/conv2", 32, 2, scale=0.02)

    d = "tdiscriminator/discriminator_unit"
    add_conv(f"{d}/input_stage/conv", d_channels, 64)
    for idx, (ci, co) in zip((1, 3, 5, 7),
                             [(64, 64), (64, 64), (64, 128), (128, 256)]):
        data[f"{d}/disblock_{idx}/conv1/Conv/weights"] = (
            rng.randn(4, 4, ci, co) * 0.1).astype(np.float32)
        data[f"{d}/disblock_{idx}/BatchNorm/beta"] = (
            rng.randn(co) * 0.1).astype(np.float32)
        data[f"{d}/disblock_{idx}/BatchNorm/moving_mean"] = (
            rng.randn(co) * 0.1).astype(np.float32)
        data[f"{d}/disblock_{idx}/BatchNorm/moving_variance"] = (
            1.0 + 0.1 * rng.rand(co)).astype(np.float32)
    data[f"{d}/dense_layer_2/dense/kernel"] = (
        rng.randn(256, 1) * 0.1).astype(np.float32)
    data[f"{d}/dense_layer_2/dense/bias"] = (
        rng.randn(1) * 0.1).astype(np.float32)
    return data


# -------------------------------------------------------------------- tests
def test_converted_generator_activations_match_tf_semantics(tmp_path, rng):
    data = make_fake_checkpoint(rng, num_resblock=2)
    path = str(tmp_path / "tf.npz")
    np.savez(path, **data)
    trees = convert_tf_npz(path, num_resblock=2)

    from tecogan_tpu.models import Generator

    x = rng.rand(2, 8, 8, 51).astype(np.float32)
    want = np_generator_forward(data, x, num_resblock=2)
    got = Generator(num_resblock=2).apply(
        {"params": trees["generator"]}, jnp.asarray(x))
    assert got.shape == want.shape == (2, 32, 32, 3)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=2e-5)


def test_converted_fnet_activations_match_tf_semantics(tmp_path, rng):
    data = make_fake_checkpoint(rng)
    path = str(tmp_path / "tf.npz")
    np.savez(path, **data)
    trees = convert_tf_npz(path, num_resblock=2)

    from tecogan_tpu.models import FNet

    x = rng.rand(2, 16, 16, 6).astype(np.float32)
    want = np_fnet_forward(data, x)
    got = FNet().apply({"params": trees["fnet"]}, jnp.asarray(x))
    assert got.shape == want.shape == (2, 16, 16, 2)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=2e-5)


def test_converted_discriminator_activations_match_tf_semantics(tmp_path, rng):
    data = make_fake_checkpoint(rng)
    path = str(tmp_path / "tf.npz")
    np.savez(path, **data)
    trees = convert_tf_npz(path, num_resblock=2)

    from tecogan_tpu.models import Discriminator

    x = rng.rand(2, 32, 32, 27).astype(np.float32)
    want, want_layers = np_discriminator_forward(data, x)
    disc = Discriminator()
    variables = {
        "params": trees["discriminator"],
        "batch_stats": trees["discriminator_batch_stats"],
    }
    (got, got_layers), _ = disc.apply(
        variables, jnp.asarray(x), mutable=["batch_stats"])
    assert got.shape == want.shape == (2, 2, 2, 1)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=2e-5)
    for gl, wl in zip(got_layers, want_layers):
        np.testing.assert_allclose(np.asarray(gl), wl, rtol=1e-5, atol=2e-5)


def test_convtranspose_orientation_is_load_bearing(tmp_path, rng):
    """Sanity that the gate has teeth: transposing the convT kernel's
    out/in axes (the classic conversion mistake) must NOT match."""
    data = make_fake_checkpoint(rng, num_resblock=1)
    bad = dict(data)
    for t in ("conv_tran1", "conv_tran2"):
        k = f"generator/generator_unit/conv_tran2highres/{t}/Conv2d_transpose/weights"
        bad[k] = np.ascontiguousarray(data[k].transpose(0, 1, 3, 2))
    path = str(tmp_path / "tf.npz")
    np.savez(path, **bad)
    trees = convert_tf_npz(path, num_resblock=1)

    from tecogan_tpu.models import Generator

    x = rng.rand(1, 8, 8, 51).astype(np.float32)
    want = np_generator_forward(data, x, num_resblock=1)
    got = Generator(num_resblock=1).apply(
        {"params": trees["generator"]}, jnp.asarray(x))
    assert float(np.max(np.abs(np.asarray(got) - want))) > 1e-3
