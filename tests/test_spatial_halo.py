"""Halo-exchange sharded warp (ops/warp.py:warp_space_to_depth_halo).

GSPMD all-gathers the full packed operand when partitioning the plain warp
(measured in tools/audit_spatial_hlo.py); the shard_map variant exchanges
only neighbor halo bands. These tests pin (a) bit-equality with the
unsharded fused warp+s2d, including global edge clamping across shard
boundaries, and (b) that the compiled HLO contains no large all-gather.
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from tecogan_tpu.ops.warp import warp_space_to_depth, warp_space_to_depth_halo
from tecogan_tpu.parallel import make_mesh

MD = 6.0  # test flow bound -> halo 7 < shard height 8


def _mk(rng, b, h, w, md=MD):
    image = jnp.asarray(rng.rand(b, h, w, 3), jnp.float32)
    flow = jnp.asarray(rng.rand(b, h, w, 2) * 2 * md - md, jnp.float32)
    return image, flow


def test_halo_warp_matches_unsharded(rng):
    mesh = make_mesh({"space": 8})
    image, flow = _mk(rng, 2, 64, 48)
    want = warp_space_to_depth(image, flow, 4)
    got = warp_space_to_depth_halo(
        image, flow, mesh, "space", 4, max_displacement=MD)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_halo_warp_edge_clamp_parity(rng):
    """Queries pushed off the image edge clamp exactly like TF's warp."""
    mesh = make_mesh({"space": 8})
    image = jnp.asarray(rng.rand(1, 64, 48, 3), jnp.float32)
    # Constant +MD / -MD flows drive edge rows out of range on both sides.
    for fy in (-MD, MD):
        flow = jnp.full((1, 64, 48, 2), fy, jnp.float32)
        want = warp_space_to_depth(image, flow, 4)
        got = warp_space_to_depth_halo(
            image, flow, mesh, "space", 4, max_displacement=MD)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_halo_warp_scale_shift(rng):
    mesh = make_mesh({"space": 4})
    image, flow = _mk(rng, 1, 32, 32)
    want = warp_space_to_depth(image, flow, 4, scale=0.5, shift=0.5)
    got = warp_space_to_depth_halo(
        image, flow, mesh, "space", 4, scale=0.5, shift=0.5,
        max_displacement=MD)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_halo_warp_rejects_small_shards():
    mesh = make_mesh({"space": 8})
    image = jnp.zeros((1, 64, 48, 3), jnp.float32)
    flow = jnp.zeros((1, 64, 48, 2), jnp.float32)
    with pytest.raises(ValueError, match="halo"):
        warp_space_to_depth_halo(
            image, flow, mesh, "space", 4, max_displacement=16.0)


def test_halo_warp_hlo_has_no_large_allgather():
    """The point of the halo path: collectives are neighbor bands only."""
    mesh = make_mesh({"space": 8})
    sh = NamedSharding(mesh, P(None, "space"))
    h, w = 64, 48
    fn = jax.jit(
        lambda im, fl: warp_space_to_depth_halo(
            im, fl, mesh, "space", 4, max_displacement=MD),
        in_shardings=(sh, sh), out_shardings=sh)
    hlo = fn.lower(
        jax.ShapeDtypeStruct((1, h, w, 3), jnp.float32),
        jax.ShapeDtypeStruct((1, h, w, 2), jnp.float32),
    ).compile().as_text()
    assert "all-gather" not in hlo
    # collective-permutes move only (b, halo, w, c) bands.
    shapes = re.findall(r"(\S+) collective-permute", hlo)
    halo_band = 1 * (int(MD) + 1) * w * 3 * 4  # bytes per band, f32
    for s in shapes:
        m = re.match(r"\w+\[([\d,]+)\]", s)
        if m:
            elems = int(np.prod([int(d) for d in m.group(1).split(",")]))
            assert elems * 4 <= 2 * halo_band, s


def test_spatial_streaming_uses_halo_when_geometry_allows(rng):
    """spatial_streaming_fn equality at a shape where the halo path engages.

    flow from FNet is tanh-bounded, so pass max_displacement small enough
    that 8-way shards of a 256-row HR frame (hs=32) exceed the halo.
    """
    from tecogan_tpu.models import FNet, Generator
    from tecogan_tpu.parallel import spatial_streaming_fn
    from tecogan_tpu.recurrent.step import frame_step, init_state

    h, w = 64, 32  # HR 256 rows; 8 shards -> hs 32 > halo 25
    gen = Generator(num_resblock=1)
    fnet = FNet()
    gp = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, h, w, 51)))["params"]
    fp = fnet.init(jax.random.PRNGKey(1), jnp.zeros((1, h, w, 6)))["params"]
    frames = jnp.asarray(rng.rand(2, 1, h, w, 3), jnp.float32)

    st = init_state(1, h, w)
    outs = []
    for i in range(2):
        st, hr = frame_step(gen.apply, fnet.apply, gp, fp, st, frames[i])
        outs.append(hr)
    want = jnp.stack(outs)

    mesh = make_mesh({"space": 8})
    run = spatial_streaming_fn(gen.apply, fnet.apply, mesh,
                               max_displacement=24.0)
    _, got = run(gp, fp, init_state(1, h, w), frames)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)
