"""Recurrent step / unroll tests: train-vs-inference consistency, ping-pong
ordering, streaming runner shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tecogan_tpu.config import TecoConfig
from tecogan_tpu.models import FNet, Generator
from tecogan_tpu.recurrent import (
    StreamingSR,
    extend_pingpong,
    flows_for_sequence,
    frame_step,
    init_state,
    unroll_generator,
)
from tecogan_tpu.recurrent.inference import prepend_warmup


def make_models(rng_key, h=8, w=8, resblocks=2):
    gen = Generator(num_resblock=resblocks)
    fnet = FNet()
    k1, k2 = jax.random.split(rng_key)
    gp = gen.init(k1, jnp.zeros((1, h, w, 51)))["params"]
    fp = fnet.init(k2, jnp.zeros((1, h, w, 6)))["params"]
    return gen, fnet, gp, fp


def test_unroll_matches_streaming_steps(rng):
    """The training scan unroll and the inference per-frame step must produce
    identical outputs for the same weights and frames."""
    b, t, h, w = 2, 4, 8, 8
    gen, fnet, gp, fp = make_models(jax.random.PRNGKey(0), h, w)
    seq = jnp.asarray(rng.rand(b, t, h, w, 3), jnp.float32)

    # Training path: batched flows + scan unroll.
    _, flow_hr = flows_for_sequence(fnet.apply, fp, seq)
    gen_outputs, warppre = unroll_generator(gen.apply, gp, seq, flow_hr, remat=False)
    assert gen_outputs.shape == (b, t, 4 * h, 4 * w, 3)
    assert warppre.shape == (b, t - 1, 4 * h, 4 * w, 3)

    # Inference path: sequential frame_step from zero state.
    state = init_state(b, h, w)
    stream_outs = []
    for i in range(t):
        state, hr = frame_step(gen.apply, fnet.apply, gp, fp, state, seq[:, i])
        stream_outs.append(hr)
    stream = jnp.stack(stream_outs, axis=1)  # [0, 1] domain

    from tecogan_tpu.ops import deprocess

    np.testing.assert_allclose(
        np.asarray(deprocess(gen_outputs)), np.asarray(stream), rtol=1e-4, atol=1e-5
    )


def test_unroll_remat_matches_no_remat(rng):
    b, t, h, w = 1, 3, 8, 8
    gen, fnet, gp, fp = make_models(jax.random.PRNGKey(1), h, w)
    seq = jnp.asarray(rng.rand(b, t, h, w, 3), jnp.float32)
    _, flow_hr = flows_for_sequence(fnet.apply, fp, seq)
    a, _ = unroll_generator(gen.apply, gp, seq, flow_hr, remat=False)
    c, _ = unroll_generator(gen.apply, gp, seq, flow_hr, remat=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=1e-5, atol=1e-6)


def test_unroll_no_warppre_and_fold_variants(rng):
    """The loss-path unroll options must not change gen_outputs:
    ``with_warppre=False`` is the identical computation minus the telemetry
    output (bit-equal), and ``fold_input=True`` routes the warped previous
    frame through the stride-4 folded input conv (models/generator.py:
    generator_apply_hr_input) — mathematically identical, different f32
    reduction order."""
    b, t, h, w = 2, 4, 8, 8
    gen, fnet, gp, fp = make_models(jax.random.PRNGKey(5), h, w)
    seq = jnp.asarray(rng.rand(b, t, h, w, 3), jnp.float32)
    _, flow_hr = flows_for_sequence(fnet.apply, fp, seq)

    ref, warppre = unroll_generator(gen.apply, gp, seq, flow_hr, remat=False)

    nowp, none_wp = unroll_generator(
        gen.apply, gp, seq, flow_hr, remat=False, with_warppre=False)
    assert none_wp is None
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(nowp))

    fold, fold_wp = unroll_generator(
        gen.apply, gp, seq, flow_hr, remat=False, fold_input=True,
        num_resblock=2)
    assert fold_wp.shape == warppre.shape
    np.testing.assert_allclose(np.asarray(ref), np.asarray(fold),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(warppre), np.asarray(fold_wp),
                               rtol=1e-4, atol=1e-5)

    # Gradients must agree too (the fold is used on the training loss path).
    def loss(params, fold_input):
        outs, _ = unroll_generator(
            gen.apply, params, seq, flow_hr, remat=False,
            with_warppre=False, fold_input=fold_input, num_resblock=2)
        return jnp.mean(jnp.square(outs))

    from jax.flatten_util import ravel_pytree

    g_ref = jax.grad(loss)(gp, False)
    g_fold = jax.grad(loss)(gp, True)
    flat_r, _ = ravel_pytree(g_ref)
    flat_f, _ = ravel_pytree(g_fold)
    np.testing.assert_allclose(np.asarray(flat_r), np.asarray(flat_f),
                               rtol=1e-3, atol=1e-5)

    # "patchify" fold: the s2d as a 0/1-selection conv — same outputs and
    # parameter gradients (config.py train_fold_s2d="patchify").
    patch, _ = unroll_generator(
        gen.apply, gp, seq, flow_hr, remat=False, with_warppre=False,
        fold_input="patchify", num_resblock=2)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(patch),
                               rtol=1e-4, atol=1e-5)
    g_patch = jax.grad(loss)(gp, "patchify")
    flat_p, _ = ravel_pytree(g_patch)
    np.testing.assert_allclose(np.asarray(flat_r), np.asarray(flat_p),
                               rtol=1e-3, atol=1e-5)


def test_extend_pingpong_order(rng):
    x = jnp.arange(5)[None, :, None]  # (1, 5, 1)
    ext = extend_pingpong(x)
    np.testing.assert_array_equal(
        np.asarray(ext[0, :, 0]), [0, 1, 2, 3, 4, 3, 2, 1, 0]
    )
    assert ext.shape[1] == 2 * 5 - 1


def test_prepend_warmup_order():
    frames = [f"f{i}" for i in range(8)]
    got = prepend_warmup(frames)
    assert got[:5] == ["f5", "f4", "f3", "f2", "f1"]
    assert got[5:] == frames


def test_streaming_sr_shapes_and_chunking(rng):
    cfg = TecoConfig(num_resblock=2, infer_chunk=3)
    h, w = 8, 8
    gen, fnet, gp, fp = make_models(jax.random.PRNGKey(2), h, w)
    sr = StreamingSR(cfg, gp, fp)
    frames = rng.rand(7, h, w, 3).astype(np.float32)
    out, secs = sr.run(frames, warmup=2)
    assert out.shape == (5, 4 * h, 4 * w, 3)
    assert secs > 0

    # Chunk boundaries must not change results vs one big chunk.
    out_big, _ = sr.run(frames, warmup=2, chunk=7)
    np.testing.assert_allclose(out, out_big, rtol=1e-4, atol=1e-5)


def test_scan_unroll_matches_default(rng):
    """scan_unroll only changes XLA scheduling, never results (including a
    factor that does not divide the chunk length). The knob exists for the
    measured-negative headline experiment (tools/bench_unroll.py;
    BASELINE.md round-5) — kept reproducible, defaulted off."""
    cfg = TecoConfig(num_resblock=2, compute_dtype="float32", infer_chunk=5)
    h, w = 8, 8
    gen, fnet, gp, fp = make_models(jax.random.PRNGKey(4), h, w)
    frames = rng.rand(9, h, w, 3).astype(np.float32)
    base, _ = StreamingSR(cfg, gp, fp).run(frames, warmup=2)
    for k in (2, 3):
        out, _ = StreamingSR(cfg, gp, fp, scan_unroll=k).run(frames, warmup=2)
        np.testing.assert_allclose(out, base, rtol=2e-5, atol=2e-5)
    with pytest.raises(ValueError):
        StreamingSR(cfg, gp, fp, scan_unroll=0)


def test_run_streams_matches_single(rng):
    """B concurrent streams == B independent single-stream runs."""
    from tecogan_tpu.config import TecoConfig
    from tecogan_tpu.models import FNet, Generator
    from tecogan_tpu.recurrent.inference import StreamingSR
    import jax

    cfg = TecoConfig(num_resblock=2, compute_dtype="float32", infer_chunk=4)
    gen = Generator(num_resblock=2, channels=cfg.gen_channels)
    fnet = FNet(channels=cfg.fnet_channels, up_channels=cfg.fnet_up_channels,
                max_velocity=cfg.flow_max_velocity)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    gp = gen.init(k1, jnp.zeros((1, 16, 16, 51)))["params"]
    fp = fnet.init(k2, jnp.zeros((1, 16, 16, 6)))["params"]
    sr = StreamingSR(cfg, gp, fp, output="float32")

    streams = rng.rand(3, 6, 16, 16, 3).astype(np.float32)
    multi, _ = sr.run_streams(streams, warmup=1)
    for b in range(3):
        single, _ = sr.run(streams[b], warmup=1)
        np.testing.assert_allclose(multi[b], single, rtol=2e-5, atol=2e-5)


def test_uint8_upload_path_matches_float(rng):
    """uint8 LR uploads (device-side /255 normalize) vs the f32 host path:
    XLA lowers the constant division to a reciprocal multiply, so inputs
    differ by at most 1 ulp — bound: <=1 uint8 step on <0.1% of output
    pixels (recurrent/inference.py run_chunk)."""
    cfg = TecoConfig(num_resblock=2, infer_chunk=4, compute_dtype="float32")
    h = w = 16
    gen, fnet, gp, fp = make_models(jax.random.PRNGKey(3), h, w)
    u8 = (rng.rand(9, h, w, 3) * 255).astype(np.uint8)
    f32 = u8.astype(np.float32) / 255.0
    out_f, _ = StreamingSR(cfg, gp, fp, output="uint8").run(f32, warmup=2)
    out_u, _ = StreamingSR(cfg, gp, fp, output="uint8").run(u8, warmup=2)
    d = np.abs(out_f.astype(np.int16) - out_u.astype(np.int16))
    assert d.max() <= 1, d.max()
    assert (d != 0).mean() < 1e-3, (d != 0).mean()


def test_run_on_chunk_streaming_delivery(rng):
    """on_chunk must deliver exactly the post-warmup frames, in order, with
    correct global start indices, matching the accumulated run()."""
    cfg = TecoConfig(num_resblock=2, infer_chunk=3, compute_dtype="float32")
    h = w = 8
    gen, fnet, gp, fp = make_models(jax.random.PRNGKey(4), h, w)
    frames = rng.rand(8, h, w, 3).astype(np.float32)
    want, _ = StreamingSR(cfg, gp, fp, output="uint8").run(frames, warmup=4)

    got = {}
    def on_chunk(arr, start):
        got[start] = arr.copy()
    res, _ = StreamingSR(cfg, gp, fp, output="uint8").run(
        frames, warmup=4, on_chunk=on_chunk)
    assert res is None
    # warmup=4 crosses a chunk boundary (chunks of 3): first delivery starts
    # mid-chunk at index 4.
    starts = sorted(got)
    assert starts[0] == 4
    stitched = np.concatenate([got[s] for s in starts], axis=0)
    np.testing.assert_array_equal(stitched, want)


def test_pallas_flow_upsample_modes(rng):
    """"auto" must validate, resolve to the XLA path off-TPU (bit-equal to
    "off"), and reject unknown spellings (config.py mode validation)."""
    import pytest

    h, w = 8, 8
    gen, fnet, gp, fp = make_models(jax.random.PRNGKey(5), h, w)
    frames = rng.rand(5, h, w, 3).astype(np.float32)
    outs = {}
    for mode in ("off", "auto"):
        cfg = TecoConfig(num_resblock=2, infer_chunk=3,
                         pallas_flow_upsample=mode)
        sr = StreamingSR(cfg, gp, fp)
        outs[mode], _ = sr.run(frames, warmup=1)
    np.testing.assert_array_equal(outs["off"], outs["auto"])
    with pytest.raises(ValueError):
        TecoConfig(pallas_flow_upsample="never")
