"""Multi-device tests on the 8-way virtual CPU mesh: data-parallel training
equivalence, spatial sharding execution."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tecogan_tpu.config import TecoConfig
from tecogan_tpu.parallel import (
    DataParallelTrainer,
    make_mesh,
    spatial_streaming_fn,
)
from tecogan_tpu.train import Trainer


def tiny_cfg(**kw):
    base = dict(
        num_resblock=2, crop_size=8, batch_size=8, rnn_n=3,
        vgg_scaling=-0.002, remat_generator=False,
    )
    base.update(kw)
    return TecoConfig(**base)


def test_mesh_construction():
    mesh = make_mesh({"data": -1})
    assert mesh.devices.size == 8
    mesh2 = make_mesh({"data": 4, "space": 2})
    assert mesh2.shape == {"data": 4, "space": 2}
    with pytest.raises(ValueError):
        make_mesh({"data": 16})


def test_data_parallel_matches_single_device(rng):
    """Same batch, same init: DP over 8 devices must match single-device
    training numerically (the all-reduced mean gradient is the same sum)."""
    cfg = tiny_cfg(ratio=-0.01)
    tar = cfg.hr_load_size
    batch = rng.rand(8, 3, tar, tar, 3).astype(np.float32)

    single = Trainer(cfg)
    s_state = single.init_state(jax.random.PRNGKey(0))
    s_state, s_metrics = single.train_step(s_state, jnp.asarray(batch))
    s_state, s_metrics2 = single.train_step(s_state, jnp.asarray(batch))

    mesh = make_mesh({"data": 8})
    dp = DataParallelTrainer(cfg, mesh)
    d_state = dp.init_state(jax.random.PRNGKey(0))
    d_state, d_metrics = dp.train_step(d_state, dp.put_batch(batch))
    d_state, d_metrics2 = dp.train_step(d_state, dp.put_batch(batch))

    np.testing.assert_allclose(
        float(s_metrics["All_loss_Gen"]), float(d_metrics["All_loss_Gen"]),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        float(s_metrics2["All_loss_Gen"]), float(d_metrics2["All_loss_Gen"]),
        rtol=1e-4,
    )
    # Params numerically aligned after 2 steps.
    diffs = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        s_state.gen_params, d_state.gen_params,
    )
    assert max(jax.tree.leaves(diffs)) < 1e-5


def test_data_parallel_gan_step(rng):
    cfg = tiny_cfg(ratio=0.01, pingpong=True)
    mesh = make_mesh({"data": 8})
    dp = DataParallelTrainer(cfg, mesh)
    state = dp.init_state(jax.random.PRNGKey(0))
    tar = cfg.hr_load_size
    batch = rng.rand(8, 3, tar, tar, 3).astype(np.float32)
    state, metrics = dp.train_step(state, dp.put_batch(batch))
    assert np.isfinite(float(metrics["t_discrim_loss"]))
    assert int(state.counter_with_d) == 1


def test_spatial_sharding_matches_unsharded(rng):
    """H-sharded streaming step == unsharded streaming step."""
    from tecogan_tpu.models import FNet, Generator
    from tecogan_tpu.recurrent.step import frame_step, init_state

    h, w = 32, 16  # H divisible by 8 shards after /8 fnet alignment
    gen = Generator(num_resblock=2)
    fnet = FNet()
    gp = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, h, w, 51)))["params"]
    fp = fnet.init(jax.random.PRNGKey(1), jnp.zeros((1, h, w, 6)))["params"]

    frames = jnp.asarray(rng.rand(3, 1, h, w, 3), jnp.float32)

    # Unsharded oracle.
    state = init_state(1, h, w)
    outs = []
    st = state
    for i in range(3):
        st, hr = frame_step(gen.apply, fnet.apply, gp, fp, st, frames[i])
        outs.append(hr)
    want = jnp.stack(outs)

    mesh = make_mesh({"space": 4})
    run = spatial_streaming_fn(gen.apply, fnet.apply, mesh)
    _, got = run(gp, fp, init_state(1, h, w), frames)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_streaming_sr_spatial_mesh(rng):
    """StreamingSR with an H-sharded mesh matches the unsharded run."""
    from tecogan_tpu.parallel import make_mesh
    from tecogan_tpu.recurrent.inference import StreamingSR
    from tecogan_tpu.models import FNet, Generator

    cfg = TecoConfig(num_resblock=2, compute_dtype="float32", infer_chunk=4)
    H = W = 32  # divisible by 8 devices and fnet's /8 pools
    gen = Generator(num_resblock=2, channels=cfg.gen_channels)
    fnet = FNet(channels=cfg.fnet_channels, up_channels=cfg.fnet_up_channels,
                max_velocity=cfg.flow_max_velocity)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    gp = gen.init(k1, jnp.zeros((1, H, W, 51)))["params"]
    fp = fnet.init(k2, jnp.zeros((1, H, W, 6)))["params"]
    frames = rng.rand(6, H, W, 3).astype(np.float32)

    plain = StreamingSR(cfg, gp, fp)
    a, _ = plain.run(frames, warmup=1)

    mesh = make_mesh({cfg.sp_axis: 8})
    sharded = StreamingSR(cfg, gp, fp, spatial_mesh=mesh)
    b, _ = sharded.run(frames, warmup=1)
    np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5)
