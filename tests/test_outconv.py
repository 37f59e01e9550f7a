"""Column-folded narrow-output conv (models/layers.py:NarrowOutputConv) and
the phase-decomposed transposed conv (ops/convtran.py).

The folded conv is the production output stage on large frames; these tests
pin (a) exact tap parity with the plain conv when folding engages, (b) param
tree compatibility with nn.Conv (checkpoint contract), and (c) the convtran
identity vs lax.conv_transpose (kept as a library op + documented negative
result: the HR interleave makes it slower in-context, tools/gen_ablate.py).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tecogan_tpu.models.layers as layers
from tecogan_tpu.models.layers import NarrowOutputConv
from tecogan_tpu.ops.convtran import conv_transpose_s2_phase


def test_narrow_output_conv_matches_plain_conv(rng, monkeypatch):
    # Engage folding at test size.
    monkeypatch.setattr(layers, "_FOLD_THRESHOLD_PIXELS", 0)
    x = jnp.asarray(rng.rand(2, 12, 40, 64) - 0.5, jnp.float32)
    mod = NarrowOutputConv(features=3)
    params = mod.init(jax.random.PRNGKey(0), x)["params"]

    got = mod.apply({"params": params}, x)

    want = jax.lax.conv_general_dilated(
        x, params["kernel"], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + params["bias"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_narrow_output_conv_plain_path_below_threshold(rng):
    # Below the threshold it must be the plain conv, exactly.
    x = jnp.asarray(rng.rand(1, 8, 16, 4) - 0.5, jnp.float32)
    mod = NarrowOutputConv(features=3)
    params = mod.init(jax.random.PRNGKey(0), x)["params"]
    got = mod.apply({"params": params}, x)
    want = jax.lax.conv_general_dilated(
        x, params["kernel"], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + params["bias"]
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_narrow_output_conv_param_tree_matches_nn_conv(rng):
    """Checkpoint contract: same leaves/shapes as the nn.Conv it replaced."""
    x = jnp.zeros((1, 8, 16, 64))
    a = NarrowOutputConv(features=3).init(jax.random.PRNGKey(0), x)["params"]
    b = nn.Conv(features=3, kernel_size=(3, 3), padding="SAME").init(
        jax.random.PRNGKey(0), x)["params"]
    assert set(a) == set(b) == {"kernel", "bias"}
    assert a["kernel"].shape == b["kernel"].shape
    assert a["bias"].shape == b["bias"].shape


def test_generator_folded_output_used_on_large_frames(rng, monkeypatch):
    """End-to-end: Generator output identical with folding on/off."""
    from tecogan_tpu.models import Generator

    x = jnp.asarray(rng.rand(1, 16, 24, 51), jnp.float32)
    gen = Generator(num_resblock=1)
    p = gen.init(jax.random.PRNGKey(0), x)["params"]
    base = gen.apply({"params": p}, x)
    monkeypatch.setattr(layers, "_FOLD_THRESHOLD_PIXELS", 0)
    folded = gen.apply({"params": p}, x)
    np.testing.assert_allclose(np.asarray(base), np.asarray(folded),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("shape", [(2, 6, 8, 5, 7), (1, 9, 7, 3, 4)])
def test_conv_transpose_phase_identity(rng, shape):
    b, h, w, i, o = shape
    x = jnp.asarray(rng.randn(b, h, w, i), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, o, i), jnp.float32)
    want = jax.lax.conv_transpose(
        x, k, (2, 2), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), transpose_kernel=True)
    got = conv_transpose_s2_phase(x, k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_generator_tail_phase_convtran_parity(rng, monkeypatch):
    """The pytree fast path with _CONVTRAN_MODE='phase' matches 'direct'
    (the headline_ablate phase_tran variant must be a pure perf knob)."""
    from tecogan_tpu.models import Generator
    from tecogan_tpu.models import generator as gen_mod
    from tecogan_tpu.models.generator import generator_apply_hr_input

    lr = jnp.asarray(rng.rand(1, 8, 12, 3), jnp.float32)
    warped = jnp.asarray(rng.rand(1, 32, 48, 3), jnp.float32)
    p = Generator(num_resblock=2).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 12, 51)))["params"]
    base = generator_apply_hr_input(p, lr, warped, num_resblock=2)
    monkeypatch.setattr(gen_mod, "_CONVTRAN_MODE", "phase")
    got = generator_apply_hr_input(p, lr, warped, num_resblock=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                               rtol=1e-5, atol=1e-5)


def test_conv_transpose_phase_bias_and_grad(rng):
    x = jnp.asarray(rng.randn(1, 8, 8, 4), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 6, 4), jnp.float32)
    bias = jnp.asarray(rng.randn(6), jnp.float32)

    def f_ref(xx, kk):
        return jnp.sum(jax.lax.conv_transpose(
            xx, kk, (2, 2), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            transpose_kernel=True) + bias)

    def f_phase(xx, kk):
        return jnp.sum(conv_transpose_s2_phase(xx, kk, bias))

    ga, gb = jax.grad(f_ref, (0, 1))(x, k), jax.grad(f_phase, (0, 1))(x, k)
    for a, b2 in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b2),
                                   rtol=1e-4, atol=1e-5)
