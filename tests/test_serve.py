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


def test_auto_fold_mode_is_batch_invariant():
    """"auto" must select the SAME (bit-exact patchify) fold regardless of
    batch size — s2d_mode_for deliberately takes no batch argument: the
    stride-4 split conv is separately bf16-rounded on TPU, so a
    batch-dependent mode made B>1 serving pools drift from the B=1
    single-stream engine on identical inputs (caught on-chip by
    tools/validate_serve_hw.py, round 4)."""
    import inspect

    from tecogan_tpu.recurrent.inference import s2d_mode_for

    cfg = TecoConfig()
    assert s2d_mode_for(cfg) == "patchify"
    assert s2d_mode_for(cfg.replace(fold_input_s2d="on")) == "stride4"
    # Guard against batch-aware selection being reintroduced by accident.
    assert "batch" not in inspect.signature(s2d_mode_for).parameters


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


def test_multi_geometry_state_budget(rng):
    """state_budget_mb caps resident device state across geometry buckets:
    idle buckets are LRU-evicted to admit new geometries; when every bucket
    has open streams the open() is refused with the computed bytes (a
    many-geometry workload must not OOM the chip silently)."""
    cfg, gen, fnet, gp, fp = make()
    # Three distinct geometries with identical pixel counts -> equal bytes.
    g1, g2, g3 = (H, W), (8, 32), (32, 8)
    probe = MultiGeometryServer(cfg, gp, fp, slots_per_geometry=1,
                                output="float32", state_budget_mb=None)
    per = probe.bucket_bytes(*g1)
    assert per == probe.bucket_bytes(*g2) == probe.bucket_bytes(*g3)
    srv = MultiGeometryServer(cfg, gp, fp, slots_per_geometry=1,
                              output="float32",
                              state_budget_mb=2.5 * per / 2**20)

    srv.open("a", *g1)
    srv.open("b", *g2)
    assert srv.footprint_bytes == 2 * per
    # Third geometry over budget, every bucket busy -> refused, not OOMed.
    with pytest.raises(RuntimeError, match="open streams"):
        srv.open("c", *g3)
    # An idle bucket is evicted to make room (compiled step stays cached).
    srv.close("b")
    srv.open("c", *g3)
    assert set(srv.geometries) == {g1, g3}
    assert srv.footprint_bytes == 2 * per
    # Evicted-then-recreated buckets serve correctly, and the surviving
    # stream's recurrence is untouched by its neighbor's eviction.
    frames = rng.rand(3, H, W, 3).astype(np.float32)
    got = np.stack([srv.step({"a": f})["a"] for f in frames])
    np.testing.assert_allclose(got, solo_run(gen, fnet, gp, fp, frames),
                               rtol=1e-4, atol=1e-5)
    srv.close("a")
    srv.open("d", *g2)  # g1 idle now; g2's bucket is rebuilt under budget
    out = srv.step({"d": rng.rand(8, 32, 3).astype(np.float32)})["d"]
    assert out.shape == (32, 128, 3)

    # LRU order: with two idle buckets, the least recently used one goes.
    warm = MultiGeometryServer(cfg, gp, fp, slots_per_geometry=1,
                               output="float32",
                               state_budget_mb=2.5 * per / 2**20)
    warm.prewarm([g1, g2], frame_dtype=np.float32)
    warm.open("x", *g1)
    warm.close("x")  # touches g1: g2 is now the LRU idle bucket
    warm.open("y", *g3)
    assert set(warm.geometries) == {g1, g3}

    # A geometry that cannot fit even alone is refused up front.
    tiny = MultiGeometryServer(cfg, gp, fp, slots_per_geometry=1,
                               output="float32",
                               state_budget_mb=0.5 * per / 2**20)
    with pytest.raises(RuntimeError, match="alone needs"):
        tiny.open("z", *g1)


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


def test_prewarm_is_transparent_and_background_safe(rng):
    """prewarm (VERDICT r3 #3) compiles buckets ahead of the first tick
    without perturbing any stream's numbers: a prewarmed server must be
    bit-identical to a lazy one, buckets must be instantiated (not
    re-created) on open, and a background prewarm of a NEW geometry must
    not disturb a bucket that is actively serving."""
    cfg, gen, fnet, gp, fp = make()
    frames = rng.rand(3, H, W, 3).astype(np.float32)

    lazy = MultiGeometryServer(cfg, gp, fp, slots_per_geometry=2,
                               output="float32")
    lazy.open("a", H, W)
    want = np.stack([lazy.step({"a": f})["a"] for f in frames])

    warm = MultiGeometryServer(cfg, gp, fp, slots_per_geometry=2,
                               output="float32")
    assert warm.prewarm([(H, W)], frame_dtype=np.float32) is None
    assert (H, W) in warm.geometries
    bucket = warm._buckets[(H, W)]
    warm.open("a", H, W)
    assert warm._buckets[(H, W)] is bucket  # instantiated, not re-created
    got = np.stack([warm.step({"a": f})["a"] for f in frames])
    np.testing.assert_array_equal(got, want)

    # Background prewarm of a second geometry while "a" keeps serving.
    t = warm.prewarm([(H * 2, W * 2)], frame_dtype=np.float32,
                     background=True)
    more = np.stack([warm.step({"a": f})["a"] for f in frames])
    t.join(timeout=300)
    assert not t.is_alive()
    assert (H * 2, W * 2) in warm.geometries
    # The concurrent warm tick left serving numbers untouched: the second
    # window continues the recurrence exactly as the lazy server does.
    lazy2 = np.stack([lazy.step({"a": f})["a"] for f in frames])
    np.testing.assert_array_equal(more, lazy2)
    # And the warmed bucket serves immediately.
    warm.open("b", H * 2, W * 2)
    big = rng.rand(H * 2, W * 2, 3).astype(np.float32)
    out = warm.step({"b": big})["b"]
    assert out.shape == (H * 8, W * 8, 3)


def test_persistent_cache_wiring(tmp_path, monkeypatch):
    """enable_persistent_cache points jax at the dir and populates it on a
    compile; TECOGAN_NO_COMPILE_CACHE=1 disables."""
    from tecogan_tpu.utils.compilation_cache import enable_persistent_cache

    monkeypatch.setenv("TECOGAN_NO_COMPILE_CACHE", "1")
    assert enable_persistent_cache(str(tmp_path / "x")) is None

    monkeypatch.delenv("TECOGAN_NO_COMPILE_CACHE")
    cache = str(tmp_path / "xla")
    try:
        assert enable_persistent_cache(cache) == cache

        @jax.jit
        def f(x):
            return jnp.tanh(x) * 3.0 + jnp.sum(x)

        f(jnp.arange(64.0).reshape(8, 8)).block_until_ready()
        assert os.listdir(cache), "compile did not populate the cache dir"
    finally:
        jax.config.update("jax_compilation_cache_dir", None)


def test_frame_source_matches_bulk_load(rng, tmp_path):
    """FrameSource (incremental, bounded lookahead) must emit exactly the
    sequence load_inference_frames materializes — same reversed-[5..1]
    warm-up order, same uint8 bytes — just one frame at a time."""
    import time

    import cv2

    from tecogan_tpu.data.inference import load_inference_frames
    from tecogan_tpu.serve.sources import EOS, PENDING, FrameSource

    d = tmp_path / "LR"
    d.mkdir()
    for i in range(9):
        cv2.imwrite(str(d / f"{i:04d}.png"),
                    (rng.rand(10, 12, 3) * 255).astype(np.uint8))
    want = load_inference_frames(input_dir_lr=str(d), as_uint8=True).inputs

    src = FrameSource(str(d), lookahead=3)
    assert src.geometry(timeout=30) == (10, 12)
    got, deadline = [], time.time() + 60
    while time.time() < deadline:
        f = src.try_next()
        if f is EOS:
            break
        if f is PENDING:
            time.sleep(0.001)
            continue
        got.append(f)
    np.testing.assert_array_equal(np.stack(got), want)
    assert src.warmup == 5

    # warmup needs >= 6 frames: a short source fails loudly.
    short = tmp_path / "short"
    short.mkdir()
    for i in range(3):
        cv2.imwrite(str(short / f"{i}.png"), np.zeros((8, 8, 3), np.uint8))
    bad = FrameSource(str(short), lookahead=3)
    assert bad.geometry(timeout=30) == (8, 8)  # geometry IS known...
    with pytest.raises(ValueError, match="warm-up"):  # ...the feed fails
        deadline = time.time() + 60
        while time.time() < deadline:
            if bad.try_next() is PENDING:
                time.sleep(0.001)
    # ...and a no-warmup live source of the same length is fine.
    live = FrameSource(str(short), lookahead=3, warmup=False)
    assert live.geometry(timeout=30) == (8, 8)


def test_serve_ticks_proceed_while_decode_lags(rng, tmp_path, monkeypatch):
    """VERDICT r3 #5: a lagging source must not stall other streams — the
    tick loop serves whatever is decoded (the engine freezes an omitted
    stream's state). Instrumented: there must be ticks where the fast
    stream advanced WITHOUT the slow one, and the slow stream's own output
    must still be bit-correct afterwards."""
    import time

    import cv2

    import tecogan_tpu.serve as serve_pkg
    import tecogan_tpu.serve.sources as sources_mod
    from tecogan_tpu.cli import serve as cli_serve

    for name, t in (("fast", 10), ("slow", 8)):
        d = tmp_path / "LR" / name
        d.mkdir(parents=True)
        for i in range(t):
            cv2.imwrite(str(d / f"{i:04d}.png"),
                        (rng.rand(H, W, 3) * 255).astype(np.uint8))

    real_iter = sources_mod.FrameSource._iter_png_dir

    def lagging_iter(self):
        for f in real_iter(self):
            if "slow" in self.src:
                time.sleep(0.25)
            yield f

    monkeypatch.setattr(sources_mod.FrameSource, "_iter_png_dir",
                        lagging_iter)

    tick_log = []
    real_mgs = serve_pkg.MultiGeometryServer

    class Instrumented(real_mgs):
        def step(self, frames, fetch=True):
            tick_log.append(sorted(frames))
            return super().step(frames, fetch=fetch)

    monkeypatch.setattr(serve_pkg, "MultiGeometryServer", Instrumented)

    out = tmp_path / "served"
    cli_serve.main([
        "--input_dirs", f"{tmp_path}/LR/fast,{tmp_path}/LR/slow",
        "--output_dir", str(out), "--max_streams", "2", "--lookahead", "2",
        "--allow_random_weights", "--num_resblock", "2",
    ])
    assert ["fast"] in tick_log, (
        f"no fast-only tick: the loop waited on the slow decoder {tick_log}")
    assert len(os.listdir(out / "fast")) == 10
    assert len(os.listdir(out / "slow")) == 8

    # Bit-parity of the lagging stream vs an unthrottled single-stream run.
    monkeypatch.setattr(sources_mod.FrameSource, "_iter_png_dir", real_iter)
    solo = tmp_path / "solo"
    cli_serve.main([
        "--input_dirs", f"{tmp_path}/LR/slow",
        "--output_dir", str(solo), "--max_streams", "1",
        "--allow_random_weights", "--num_resblock", "2",
    ])
    for f in sorted(os.listdir(solo / "slow")):
        a = cv2.imread(str(out / "slow" / f))
        b = cv2.imread(str(solo / "slow" / f))
        np.testing.assert_array_equal(a, b)
