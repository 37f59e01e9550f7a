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


def test_resblock_chain_pallas_matches_xla(rng):
    """Fused chain (interpret mode) == XLA oracle, fwd and bwd."""
    import functools
    from unittest import mock

    import jax
    from jax.experimental import pallas as pl

    import tecogan_tpu.kernels.resblocks as R

    B, H, W, C, N = 1, 16, 12, 8, 3
    x = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
    w1 = jnp.asarray(rng.randn(N, 3, 3, C, C).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.randn(N, 3, 3, C, C).astype(np.float32) * 0.1)
    b1 = jnp.asarray(rng.randn(N, C).astype(np.float32) * 0.1)
    b2 = jnp.asarray(rng.randn(N, C).astype(np.float32) * 0.1)

    want = R.resblock_chain_xla(x, w1, b1, w2, b2)
    with mock.patch.object(R.pl, "pallas_call",
                           functools.partial(pl.pallas_call, interpret=True)):
        w1t, b1r, w2t, b2r = R._taps(w1, b1, w2, b2)
        got = R._fused_chain_single(x[0], w1t, b1r, w2t, b2r, tile_rows=4)[None]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    # custom_vjp backward (XLA replay) == plain autodiff of the oracle.
    g1 = jax.grad(lambda v: jnp.sum(R.resblock_chain(v, w1, b1, w2, b2) ** 2))(x)
    g2 = jax.grad(lambda v: jnp.sum(R.resblock_chain_xla(v, w1, b1, w2, b2) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-5, atol=1e-6)


def test_resblock_chain_odd_length(rng):
    """Odd chain length exercises the final buf->out copy (interpret)."""
    import functools
    from unittest import mock

    from jax.experimental import pallas as pl

    import tecogan_tpu.kernels.resblocks as R

    H, W, C, N = 8, 12, 8, 1
    x = jnp.asarray(rng.rand(H, W, C).astype(np.float32))
    w1 = jnp.asarray(rng.randn(N, 3, 3, C, C).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.randn(N, 3, 3, C, C).astype(np.float32) * 0.1)
    b1 = jnp.asarray(rng.randn(N, C).astype(np.float32) * 0.1)
    b2 = jnp.asarray(rng.randn(N, C).astype(np.float32) * 0.1)
    want = R.resblock_chain_xla(x[None], w1, b1, w2, b2)[0]
    with mock.patch.object(R.pl, "pallas_call",
                           functools.partial(pl.pallas_call, interpret=True)):
        w1t, b1r, w2t, b2r = R._taps(w1, b1, w2, b2)
        got = R._fused_chain_single(x, w1t, b1r, w2t, b2r, tile_rows=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_resblock_chain_paired_banded_matches_xla(rng):
    """Row-banded pair-packed chain (interpret) == XLA oracle for every
    band/chunk geometry, including uneven final bands and sub-chains, and
    under an OUTER jit.

    The outer-jit case is a regression guard: the kernels originally read
    their source through an ``input_output_aliases``'d output block, which
    miscompiled when inlined into a surrounding jit on real TPUs (layout
    mismatch between the aliased operand and the output; ~27% NaNs at
    540x960). The kernels now read step 0 from their own input block.
    """
    import functools
    from unittest import mock

    import jax
    from jax.experimental import pallas as pl

    import tecogan_tpu.kernels.resblocks as R

    B, H, W, C, N = 2, 40, 12, 8, 4
    x = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32) - 0.5)
    w1 = jnp.asarray(rng.randn(N, 3, 3, C, C).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.randn(N, 3, 3, C, C).astype(np.float32) * 0.1)
    b1 = jnp.asarray(rng.randn(N, C).astype(np.float32) * 0.1)
    b2 = jnp.asarray(rng.randn(N, C).astype(np.float32) * 0.1)

    want = np.asarray(R.resblock_chain_xla(x, w1, b1, w2, b2))
    with mock.patch.object(R.pl, "pallas_call",
                           functools.partial(pl.pallas_call, interpret=True)):
        for band, chunk in [(16, 0), (16, 2), (12, 1), (40, 2)]:
            got = R.resblock_chain_paired_banded(
                x, w1, b1, w2, b2, band_rows=band, chunk=chunk)
            np.testing.assert_allclose(np.asarray(got), want,
                                       rtol=1e-4, atol=1e-4,
                                       err_msg=f"band={band} chunk={chunk}")
        jitted = jax.jit(lambda *a: R.resblock_chain_paired_banded(
            *a, band_rows=16, chunk=2))(x, w1, b1, w2, b2)
        np.testing.assert_allclose(np.asarray(jitted), want,
                                   rtol=1e-4, atol=1e-4)


def test_resblock_chain_paired_auto_dispatch(rng):
    """Off-TPU the auto dispatcher must return the XLA oracle result."""
    import tecogan_tpu.kernels.resblocks as R

    B, H, W, C, N = 1, 10, 8, 4, 2
    x = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
    w1 = jnp.asarray(rng.randn(N, 3, 3, C, C).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.randn(N, 3, 3, C, C).astype(np.float32) * 0.1)
    b1 = jnp.asarray(rng.randn(N, C).astype(np.float32) * 0.1)
    b2 = jnp.asarray(rng.randn(N, C).astype(np.float32) * 0.1)
    want = R.resblock_chain_xla(x, w1, b1, w2, b2)
    got = R.resblock_chain_paired_auto(x, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want))


def test_banded_upsample_matches_xla(rng, monkeypatch):
    """Big-frame H-banding (VERDICT r3 #4: 540p->2160p output planes exceed
    the 16 MB scoped VMEM): shrink the budget so a small frame bands, and
    check band selection + numerics against the XLA oracle."""
    import tecogan_tpu.kernels.upsample4 as m

    # Band selection: 540x960 bf16 must band under the real budget...
    hb = m._band_h(540, 960, 2)
    assert hb is not None and hb < 540 and 540 % hb == 0 and (4 * hb) % 8 == 0
    # ...small frames stay single-block; impossible budgets return None.
    assert m._band_h(144, 180, 2) == 144
    monkeypatch.setattr(m, "_VMEM_BUDGET", 1)
    assert m._band_h(32, 40, 4) is None

    # Numerics through the banded grid (budget forcing h=32 -> 4 bands).
    monkeypatch.setattr(m, "_VMEM_BUDGET", 70_000)
    assert m._band_h(32, 40, 4) == 8
    patch, m2 = _pallas_fns(interpret=True)
    x = jnp.asarray(rng.rand(2, 32, 40, 2).astype(np.float32))
    with patch:
        got = np.asarray(m2._upsample4_pallas(x, "bilinear"))
    want = np.asarray(upscale_bilinear(x, 4))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    # No fitting band at all -> the forward silently uses the XLA path.
    monkeypatch.setattr(m, "_VMEM_BUDGET", 1)
    with patch:
        got = np.asarray(m2._upsample4_pallas(x, "bilinear"))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    # Oversize backward routes through the XLA einsum transpose.
    g = jax.grad(lambda v: float(0) + jnp.sum(
        jnp.sin(m2._upsample4_pallas(v, "bilinear"))))
    g_xla = jax.grad(lambda v: jnp.sum(jnp.sin(upscale_bilinear(v, 4))))
    with patch:
        got_g = np.asarray(g(x))
    np.testing.assert_allclose(got_g, np.asarray(g_xla(x)),
                               rtol=1e-4, atol=1e-5)
