"""Pallas kernel tests.

On CPU the kernels run through the Pallas interpreter (slow but exact
control-flow semantics); numerical parity is asserted against the XLA
implementations in ops/resize.py, and the custom VJP against autodiff of
the XLA path.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tecogan_tpu.ops.resize import bicubic_four, upscale_bilinear


def _pallas_fns(interpret: bool):
    """Build interpreter-mode variants of the kernels for CPU testing."""
    import tecogan_tpu.kernels.upsample4 as m

    if not interpret:
        return m.upscale_bilinear_pallas, m.bicubic_four_pallas
    from unittest import mock
    from jax.experimental import pallas as pl

    wrapped = functools.partial(pl.pallas_call, interpret=True)
    patch = mock.patch.object(m.pl, "pallas_call", wrapped)
    return patch, m


def test_stencil_matrix_rows_sum_to_one():
    from tecogan_tpu.kernels.upsample4 import _stencil_matrix

    for filt in ("bilinear", "bicubic"):
        s = _stencil_matrix(12, filt)
        np.testing.assert_allclose(s.sum(axis=1), 1.0, atol=1e-6)
        assert s.shape == (48, 12)


@pytest.mark.parametrize("filt", ["bilinear", "bicubic"])
def test_pallas_upsample_matches_xla(filt, rng):
    patch, m = _pallas_fns(interpret=True)
    x = jnp.asarray(rng.rand(2, 12, 16, 3).astype(np.float32))
    with patch:
        got = np.asarray(m._upsample4_pallas(x, filt))
    want = np.asarray(
        upscale_bilinear(x, 4) if filt == "bilinear" else bicubic_four(x)
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    assert got.shape == (2, 48, 64, 3)


def test_pallas_upsample_vjp_matches_xla(rng):
    patch, m = _pallas_fns(interpret=True)
    x = jnp.asarray(rng.rand(1, 8, 8, 2).astype(np.float32))

    with patch:
        g_pallas = jax.grad(
            lambda v: jnp.sum(jnp.sin(m._upsample4_pallas(v, "bilinear")))
        )(x)
    g_xla = jax.grad(lambda v: jnp.sum(jnp.sin(upscale_bilinear(v, 4))))(x)
    np.testing.assert_allclose(
        np.asarray(g_pallas), np.asarray(g_xla), rtol=1e-4, atol=1e-5
    )


def test_upsample4_auto_falls_back_off_tpu(rng):
    from tecogan_tpu.kernels.upsample4 import upsample4_auto

    x = jnp.asarray(rng.rand(1, 8, 8, 2).astype(np.float32))
    got = np.asarray(upsample4_auto(x, "bilinear"))  # CPU in tests -> XLA path
    want = np.asarray(upscale_bilinear(x, 4))
    np.testing.assert_array_equal(got, want)
