"""Serving layer: multi-stream continuous batching + AOT export.

The server's batched masked step must be indistinguishable, per stream,
from the reference's one-stream-per-process loop (main.py:253-270), which
`frame_step` reproduces — streams must not leak into each other through
the shared batch, slot reuse must reset state, and the exported StableHLO
artifact must round-trip to the same numbers.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tecogan_tpu.config import TecoConfig
from tecogan_tpu.models import FNet, Generator
from tecogan_tpu.recurrent.step import frame_step, init_state
from tecogan_tpu.serve import (
    MultiGeometryServer,
    VSRServer,
    build_frame_fn,
    export_frame_step,
    load_frame_step,
    save_frame_step,
)

H = W = 16


def make(resblocks=2, **cfg_kw):
    cfg = TecoConfig(num_resblock=resblocks, **cfg_kw)
    gen = Generator(num_resblock=resblocks)
    fnet = FNet()
    k1, k2 = jax.random.split(jax.random.PRNGKey(7))
    gp = gen.init(k1, jnp.zeros((1, H, W, 51)))["params"]
    fp = fnet.init(k2, jnp.zeros((1, H, W, 6)))["params"]
    return cfg, gen, fnet, gp, fp


def solo_run(gen, fnet, gp, fp, frames):
    """The reference-style single-stream loop (frame_step from zero state)."""
    h, w = np.asarray(frames[0]).shape[:2]
    state = init_state(1, h, w)
    outs = []
    for f in frames:
        state, hr = frame_step(gen.apply, fnet.apply, gp, fp, state,
                               jnp.asarray(f)[None])
        outs.append(np.asarray(hr[0]))
    return np.stack(outs)


def test_server_matches_frame_step(rng):
    cfg, gen, fnet, gp, fp = make()
    frames = rng.rand(4, H, W, 3).astype(np.float32)
    srv = VSRServer(cfg, gp, fp, H, W, max_streams=2, output="float32")
    srv.open("a")
    got = np.stack([srv.step({"a": f})["a"] for f in frames])
    np.testing.assert_allclose(got, solo_run(gen, fnet, gp, fp, frames),
                               rtol=1e-5, atol=1e-6)


def test_streams_isolated_and_frozen_when_idle(rng):
    """A second stream joining/pausing/leaving must not perturb the first,
    and a paused stream's state must be frozen, not advanced."""
    cfg, gen, fnet, gp, fp = make()
    a_frames = rng.rand(5, H, W, 3).astype(np.float32)
    b_frames = rng.rand(2, H, W, 3).astype(np.float32)

    # A alone in a 3-slot pool.
    srv = VSRServer(cfg, gp, fp, H, W, max_streams=3, output="float32")
    srv.open("a")
    a_alone = np.stack([srv.step({"a": f})["a"] for f in a_frames])

    # Same pool, B joins at tick 1, skips tick 2 (state frozen), returns at
    # tick 3, closes before tick 4.
    srv = VSRServer(cfg, gp, fp, H, W, max_streams=3, output="float32")
    srv.open("a")
    a_mixed, b_mixed = [], []
    a_mixed.append(srv.step({"a": a_frames[0]})["a"])
    srv.open("b")
    out = srv.step({"a": a_frames[1], "b": b_frames[0]})
    a_mixed.append(out["a"]); b_mixed.append(out["b"])
    a_mixed.append(srv.step({"a": a_frames[2]})["a"])  # b idle: frozen
    out = srv.step({"a": a_frames[3], "b": b_frames[1]})
    a_mixed.append(out["a"]); b_mixed.append(out["b"])
    srv.close("b")
    a_mixed.append(srv.step({"a": a_frames[4]})["a"])

    # Identical compiled program + batch geometry on both runs: per-slot
    # results must be bit-equal regardless of the other slots' contents.
    np.testing.assert_array_equal(np.stack(a_mixed), a_alone)
    np.testing.assert_allclose(np.stack(b_mixed),
                               solo_run(gen, fnet, gp, fp, b_frames),
                               rtol=1e-5, atol=1e-6)


def test_slot_reuse_resets_state(rng):
    cfg, gen, fnet, gp, fp = make()
    frames = rng.rand(3, H, W, 3).astype(np.float32)
    srv = VSRServer(cfg, gp, fp, H, W, max_streams=1, output="float32")
    srv.open("a")
    srv.step({"a": frames[0]})
    srv.step({"a": frames[1]})
    srv.close("a")
    srv.open("c")  # reuses the slot: must start from the zero state
    got = srv.step({"c": frames[2]})["c"]
    np.testing.assert_allclose(
        got, solo_run(gen, fnet, gp, fp, frames[2:]) [0],
        rtol=1e-5, atol=1e-6)


def test_server_fold_path_matches(rng):
    """fold_input_s2d="on" routes the stride-4 folded input conv —
    mathematically identical, different f32 reduction order."""
    cfg, gen, fnet, gp, fp = make(fold_input_s2d="on")
    frames = rng.rand(3, H, W, 3).astype(np.float32)
    srv = VSRServer(cfg, gp, fp, H, W, max_streams=2, output="float32")
    srv.open("a")
    got = np.stack([srv.step({"a": f})["a"] for f in frames])
    np.testing.assert_allclose(got, solo_run(gen, fnet, gp, fp, frames),
                               rtol=1e-4, atol=1e-5)


def test_uint8_io(rng):
    cfg, gen, fnet, gp, fp = make()
    frames01 = rng.rand(3, H, W, 3).astype(np.float32)
    frames_u8 = (frames01 * 255).astype(np.uint8)
    srv = VSRServer(cfg, gp, fp, H, W, max_streams=2, output="uint8")
    srv.open("a")
    got = np.stack([srv.step({"a": f})["a"] for f in frames_u8])
    assert got.dtype == np.uint8 and got.shape == (3, 4 * H, 4 * W, 3)
    # The float-input float-output oracle, quantized host-side; inputs
    # differ by the uint8 round-trip so allow a few gray levels.
    ref = solo_run(gen, fnet, gp, fp, frames_u8.astype(np.float32) / 255.0)
    ref_u8 = np.clip(ref * 255.0, 0, 255).astype(np.uint8)
    assert np.mean(np.abs(got.astype(int) - ref_u8.astype(int)) > 2) < 1e-3


def test_server_mesh_sharded_matches(rng):
    """Slot pool sharded over the 8-device mesh == single-device server."""
    from tecogan_tpu.parallel import make_mesh

    cfg, gen, fnet, gp, fp = make()
    mesh = make_mesh({cfg.dp_axis: -1})
    n = mesh.shape[cfg.dp_axis]
    frames = rng.rand(3, H, W, 3).astype(np.float32)

    ref = VSRServer(cfg, gp, fp, H, W, max_streams=n, output="float32")
    srv = VSRServer(cfg, gp, fp, H, W, max_streams=n, output="float32",
                    mesh=mesh)
    for s in (ref, srv):
        s.open("a"); s.open("b")
    for f in frames:
        tick = {"a": f, "b": rng.rand(H, W, 3).astype(np.float32)}
        want = ref.step(tick)
        got = srv.step(tick)
        np.testing.assert_allclose(got["a"], want["a"], rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(got["b"], want["b"], rtol=1e-5, atol=1e-6)

    with pytest.raises(ValueError):
        VSRServer(cfg, gp, fp, H, W, max_streams=n + 1, mesh=mesh)


def test_multi_geometry_server_matches_frame_step(rng):
    """Streams of two different LR geometries served from one process must
    each match the reference-style single-stream loop, across mixed ticks,
    idle ticks, and a mid-run join."""
    cfg, gen, fnet, gp, fp = make()
    h2, w2 = 8, 24
    a_frames = rng.rand(4, H, W, 3).astype(np.float32)
    b_frames = rng.rand(3, h2, w2, 3).astype(np.float32)

    srv = MultiGeometryServer(cfg, gp, fp, slots_per_geometry=2,
                              output="float32")
    srv.open("a", H, W)
    a_out = [srv.step({"a": a_frames[0]})["a"]]
    srv.open("b", h2, w2)                      # second geometry joins
    out = srv.step({"a": a_frames[1], "b": b_frames[0]})
    a_out.append(out["a"])
    b_out = [out["b"]]
    a_out.append(srv.step({"a": a_frames[2]})["a"])   # b idle this tick
    out = srv.step({"a": a_frames[3], "b": b_frames[1]})
    a_out.append(out["a"])
    b_out.append(out["b"])
    b_out.append(srv.step({"b": b_frames[2]})["b"])
    assert srv.geometries == {(H, W): (1, 2), (h2, w2): (1, 2)}

    np.testing.assert_allclose(np.stack(a_out),
                               solo_run(gen, fnet, gp, fp, a_frames),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.stack(b_out),
                               solo_run(gen, fnet, gp, fp, b_frames),
                               rtol=1e-5, atol=1e-6)


def test_multi_geometry_lifecycle(rng):
    """Bucket capacity is per geometry; ids are global; slots recycle."""
    cfg, _, _, gp, fp = make()
    srv = MultiGeometryServer(cfg, gp, fp, slots_per_geometry=1,
                              output="float32")
    assert srv.free_slots(H, W) == 1           # bucket not built yet
    srv.open("a", H, W)
    assert srv.free_slots(H, W) == 0
    assert srv.free_slots(8, 24) == 1          # other bucket unaffected
    srv.open("b", 8, 24)                       # fits: different bucket
    with pytest.raises(ValueError):
        srv.open("b", H, W)                    # ids are global
    with pytest.raises(RuntimeError):
        srv.open("c", H, W)                    # (H, W) bucket full
    with pytest.raises(KeyError):
        srv.step({"zzz": np.zeros((H, W, 3), np.float32)})
    srv.close("a")
    srv.open("c", H, W)                        # slot freed
    assert sorted(srv.open_streams) == ["b", "c"]
    assert srv.step({}) == {}


def test_lifecycle_errors(rng):
    cfg, _, _, gp, fp = make()
    srv = VSRServer(cfg, gp, fp, H, W, max_streams=1, output="float32")
    srv.open("a")
    with pytest.raises(ValueError):
        srv.open("a")
    with pytest.raises(RuntimeError):
        srv.open("b")
    with pytest.raises(KeyError):
        srv.step({"zzz": np.zeros((H, W, 3), np.float32)})
    with pytest.raises(ValueError):
        srv.step({"a": np.zeros((8, 8, 3), np.float32)})
    srv.close("a")
    srv.open("b")  # slot freed
    assert srv.open_streams == ("b",)


def test_step_fetch_false_matches_and_views_survive_ticks(rng):
    """fetch=False returns device views equal to the fetched arrays, and
    the views stay valid after later ticks (outputs are not donated) —
    the contract the writer-thread overlap in cli.serve relies on."""
    cfg, gen, fnet, gp, fp = make()
    frames = rng.rand(3, H, W, 3).astype(np.float32)
    s1 = VSRServer(cfg, gp, fp, H, W, max_streams=2, output="float32")
    s2 = VSRServer(cfg, gp, fp, H, W, max_streams=2, output="float32")
    s1.open("a")
    s2.open("a")
    fetched = [s1.step({"a": f})["a"] for f in frames]
    deferred = [s2.step({"a": f}, fetch=False)["a"] for f in frames]
    # Materialize ALL deferred views only after every tick ran.
    for want, got in zip(fetched, deferred):
        np.testing.assert_array_equal(want, np.asarray(got))


def test_cli_serve_matches_single_stream_inference(rng, tmp_path):
    """cli.serve over two unequal-length, unequal-GEOMETRY streams ==
    cli.main one-at-a-time (same weights via the same seed; reference
    main.py:253-270 loop). The mixed geometry exercises the
    MultiGeometryServer bucketing end-to-end."""
    import cv2

    from tecogan_tpu.cli import main as cli_main
    from tecogan_tpu.cli import serve as cli_serve

    lengths = {"scene_a": 8, "scene_b": 6}
    geos = {"scene_a": (H, W), "scene_b": (8, 24)}
    for name, t in lengths.items():
        d = tmp_path / "LR" / name
        d.mkdir(parents=True)
        gh, gw = geos[name]
        for i in range(t):
            cv2.imwrite(str(d / f"{i:04d}.png"),
                        (rng.rand(gh, gw, 3) * 255).astype(np.uint8))

    serve_out = tmp_path / "served"
    cli_serve.main([
        "--input_dirs", f"{tmp_path}/LR/scene_a,{tmp_path}/LR/scene_b",
        "--output_dir", str(serve_out), "--max_streams", "2",
        "--allow_random_weights", "--num_resblock", "2",
    ])
    for name, t in lengths.items():
        ref_out = tmp_path / "single" / name
        cli_main.main([
            "--mode", "inference",
            "--input_dir_LR", f"{tmp_path}/LR/{name}",
            "--output_dir", str(tmp_path / "single"), "--output_pre", name,
            "--allow_random_weights", "--num_resblock", "2",
        ])
        got = sorted(os.listdir(serve_out / name))
        want = sorted(os.listdir(ref_out))
        assert len(got) == t and got == want
        for f in got:
            a = cv2.imread(str(serve_out / name / f))
            b = cv2.imread(str(ref_out / f))
            # Same math, different batching (per-frame fnet vs chunk-batched)
            # -> identical up to the uint8 quantization boundary.
            assert np.max(np.abs(a.astype(int) - b.astype(int))) <= 1


def test_export_roundtrip(rng, tmp_path):
    """Serialized StableHLO artifact must reproduce the live step."""
    cfg, gen, fnet, gp, fp = make()
    exp = export_frame_step(cfg, gp, fp, batch=2, height=H, width=W,
                            output="float32", input_dtype=jnp.float32)
    path = str(tmp_path / "step.bin")
    save_frame_step(exp, path)
    step = load_frame_step(path)

    state = init_state(2, H, W)
    lr = jnp.asarray(rng.rand(2, H, W, 3), jnp.float32)
    new_state, hr = step(state, lr)

    frame_fn = build_frame_fn(cfg, gen.apply, fnet.apply, output="float32")
    ref_state, ref_hr = jax.jit(frame_fn)(gp, fp, state, lr)
    np.testing.assert_allclose(np.asarray(hr), np.asarray(ref_hr),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(new_state.prev_hr),
                               np.asarray(ref_state.prev_hr),
                               rtol=1e-5, atol=1e-6)
