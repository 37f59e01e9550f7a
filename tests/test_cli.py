"""CLI, training driver, and summary-utility tests (CPU, tiny shapes)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from tecogan_tpu.cli.main import build_parser, config_from_args
from tecogan_tpu.config import TecoConfig
from tecogan_tpu.data.synthetic import write_synthetic_scenes
from tecogan_tpu.utils.logging import Tee, param_summary
from tecogan_tpu.utils.summaries import SummaryLogger, encode_gif


def test_config_from_args_presets_and_overrides():
    args = build_parser().parse_args(
        ["--mode", "train", "--output_dir", "/tmp/x", "--preset", "frvsr",
         "--num_resblock", "4", "--batch_size", "2"]
    )
    cfg = config_from_args(args)
    assert cfg.num_resblock == 4          # override wins
    assert cfg.batch_size == 2
    assert cfg.ratio < 0                  # FRVSR preset: no GAN
    assert cfg.learning_rate == 5e-5

    args = build_parser().parse_args(
        ["--mode", "train", "--output_dir", "/tmp/x", "--preset", "tecogan"]
    )
    cfg = config_from_args(args)
    assert cfg.gan and cfg.pingpong and cfg.num_resblock == 16


def test_param_summary_counts():
    params = {"layer": {"kernel": np.zeros((3, 3, 4, 8)), "bias": np.zeros(8)}}
    lines = []
    total = param_summary("gen", params, print_fn=lines.append)
    assert total == 3 * 3 * 4 * 8 + 8
    assert any("gen/layer/kernel" in l for l in lines)


def test_tee(tmp_path):
    p = tmp_path / "log.txt"
    tee = Tee(str(p))
    tee.write("hello\n")
    tee.flush()
    assert "hello" in p.read_text()
    tee.log.close()


def test_encode_gif_and_summary_logger(tmp_path):
    frames = (np.random.RandomState(0).rand(4, 16, 16, 3) * 255).astype(np.uint8)
    gif = tmp_path / "clip.gif"
    encode_gif(frames, str(gif), fps=4)
    assert gif.stat().st_size > 0

    log = SummaryLogger(str(tmp_path / "tb"))
    log.scalars(10, {"loss": 1.5}, prefix="val_")
    log.gif(10, "seq", frames[None].astype(np.float32) / 255.0)
    log.close()
    rows = [json.loads(l) for l in
            (tmp_path / "tb" / "scalars.jsonl").read_text().splitlines()]
    assert rows[0]["val_loss"] == 1.5
    assert any(f.endswith(".gif") for f in os.listdir(tmp_path / "tb"))


@pytest.fixture(scope="module")
def scene_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("scenes")
    write_synthetic_scenes(str(root), num_scenes=3, num_frames=24,
                           height=96, width=112, start_index=2000)
    return str(root)


def test_train_driver_end_to_end(scene_root, tmp_path):
    """train() runs steps, saves + resumes checkpoints (single CPU device)."""
    from tecogan_tpu.train.loop import train

    cfg = TecoConfig(
        num_resblock=2, crop_size=8, batch_size=2, rnn_n=3,
        ratio=-0.01, vgg_scaling=-0.002, remat_generator=False,
        input_video_dir=scene_root, str_dir=2000, end_dir=2001,
        end_dir_val=2002, max_frm=23, queue_thread=2,
        display_freq=2, summary_freq=4, save_freq=100,
    )
    out = str(tmp_path / "run")
    state = train(cfg, out, max_steps=5, use_mesh=False,
                  test_while_train=False)
    assert int(np.asarray(state.step)) == 5
    assert os.path.exists(os.path.join(out, "checkpoints"))
    assert os.path.exists(os.path.join(out, "log", "scalars.jsonl"))
    assert os.path.exists(os.path.join(out, "config.json"))

    # Resume continues from saved step.
    state = train(cfg, out, max_steps=7, use_mesh=False,
                  test_while_train=False)
    assert int(np.asarray(state.step)) == 7


def test_sigterm_preemption_saves_checkpoint(scene_root, tmp_path, monkeypatch):
    """SIGTERM mid-run (cloud preemption notice) finishes the in-flight
    step, saves a final checkpoint, and returns — and the run resumes from
    exactly that step (train/loop.py:_PreemptionGuard; no reference analog,
    the reference handles only Ctrl-C, main.py:423-429)."""
    import signal

    import tecogan_tpu.train.loop as loop_mod
    from tecogan_tpu.train.checkpoint import latest_step
    from tecogan_tpu.train.loop import train

    real_build = loop_mod.build_trainer

    def build(config, **kw):
        trainer = real_build(config, **kw)
        orig = trainer.train_step
        calls = {"n": 0}

        def wrapped(state, batch):
            calls["n"] += 1
            if calls["n"] == 2:  # deliver the signal during step 2
                os.kill(os.getpid(), signal.SIGTERM)
            return orig(state, batch)

        trainer.train_step = wrapped
        return trainer

    monkeypatch.setattr(loop_mod, "build_trainer", build)
    cfg = TecoConfig(
        num_resblock=2, crop_size=8, batch_size=2, rnn_n=3,
        ratio=-0.01, vgg_scaling=-0.002, remat_generator=False,
        input_video_dir=scene_root, str_dir=2000, end_dir=2001,
        end_dir_val=2002, max_frm=23, queue_thread=2,
        display_freq=100, summary_freq=100, save_freq=100,
    )
    out = str(tmp_path / "run")
    state = train(cfg, out, max_steps=50, use_mesh=False,
                  test_while_train=False)
    assert int(np.asarray(state.step)) == 2          # stopped, not ran to 50
    assert latest_step(os.path.join(out, "checkpoints")) == 2

    monkeypatch.setattr(loop_mod, "build_trainer", real_build)
    state = train(cfg, out, max_steps=4, use_mesh=False,
                  test_while_train=False)             # resumes at 2, runs to 4
    assert int(np.asarray(state.step)) == 4


def test_run_train_vgg_weight_resolution(monkeypatch, tmp_path):
    """vgg_scaling > 0: --vgg_npz loads, --allow_random_weights substitutes
    random VGG19 params (full case-3 shape, weight-independent FLOPs),
    neither -> actionable SystemExit."""
    import tecogan_tpu.train.loop as loop_mod
    from tecogan_tpu.cli.main import config_from_args, run_train

    captured = {}

    def fake_train(config, output_dir, **kw):
        captured["vgg_params"] = kw.get("vgg_params")
        return None

    monkeypatch.setattr(loop_mod, "train", fake_train)

    base = ["--mode", "train", "--preset", "tecogan",
            "--output_dir", str(tmp_path / "o"),
            "--input_video_dir", str(tmp_path)]
    args = build_parser().parse_args(base)
    with pytest.raises(SystemExit, match="vgg_npz"):
        run_train(args, config_from_args(args))

    args = build_parser().parse_args(base + ["--allow_random_weights"])
    run_train(args, config_from_args(args))
    assert captured["vgg_params"] is not None
    assert "conv1_1" in captured["vgg_params"]


def test_warm_start_from_checkpoint(scene_root, tmp_path):
    """A TecoGAN-mode state warm-starts G/F weights from an FRVSR run."""
    import jax

    from tecogan_tpu.train.checkpoint import save_checkpoint, warm_start
    from tecogan_tpu.train.trainer import Trainer

    frvsr_cfg = TecoConfig(num_resblock=2, crop_size=8, batch_size=2,
                           rnn_n=3, ratio=-0.01, vgg_scaling=-0.002,
                           remat_generator=False)
    t1 = Trainer(frvsr_cfg)
    s1 = t1.init_state(jax.random.PRNGKey(0))
    ckpt = str(tmp_path / "frvsr_ckpt")
    save_checkpoint(ckpt, s1, 1)

    gan_cfg = frvsr_cfg.replace(ratio=0.01, pingpong=True)
    t2 = Trainer(gan_cfg)
    s2 = t2.init_state(jax.random.PRNGKey(1))
    s3 = warm_start(s2, ckpt)
    # gen/fnet weights match the FRVSR checkpoint...
    a = jax.tree.leaves(s1.gen_params)[0]
    b = jax.tree.leaves(s3.gen_params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # ...while the discriminator stays freshly initialized.
    assert s3.d_params is not None
    assert int(np.asarray(s3.step)) == 0


def test_no_negative_stride_slices_in_device_code():
    """Negative-step slices SIGABRT the TPU compiler at batch > 1 (found the
    hard way); guard against reintroduction in device-side modules."""
    import re

    device_files = []
    base = os.path.join(os.path.dirname(__file__), "..", "tecogan_tpu")
    for sub in ("ops", "models", "recurrent", "kernels", "parallel"):
        d = os.path.join(base, sub)
        device_files += [os.path.join(d, f) for f in os.listdir(d)
                         if f.endswith(".py")]
    device_files += [os.path.join(base, "train", f)
                     for f in ("losses.py", "trainer.py")]
    # A subscript segment with TWO colons whose step is negative,
    # e.g. "x[5:0:-1]" or "x[:, ::-1]" — NOT "x[:, :-1]" (negative stop).
    pattern = re.compile(r"(^|[\[,])\s*[^,\[\]]*:[^,:\[\]]*:\s*-\s*\w")
    host_markers = ("np.", "cv2.", "list(", ".tobytes")
    bad = []
    for path in device_files:
        for i, line in enumerate(open(path), 1):
            code = line.split("#")[0]
            if pattern.search(code) and not any(m in code for m in host_markers):
                bad.append(f"{path}:{i}: {line.strip()}")
    assert not bad, "negative-stride slice in device code:\n" + "\n".join(bad)


def test_profiler_utils(tmp_path):
    from tecogan_tpu.utils.profiling import StepTimer, device_time, trace
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x * 2 + 1)
    secs = device_time(f, jnp.ones((8, 8)), iters=3, warmup=1)
    assert secs > 0
    t = StepTimer(items_per_step=4, total_steps=100)
    t.tick(10)
    assert t.rate() > 0 and t.eta_hours(10) is not None
    with trace(str(tmp_path / "tr")):
        float(f(jnp.ones(())).sum())
    assert any((tmp_path / "tr").rglob("*"))


def test_parity_gate_csv_roundtrip(tmp_path):
    """The parity gate must read FrameAvg_* out of a stacked-block
    metrics.csv (ours or the reference's identical layout) and apply the
    north-star tolerances (BASELINE.md: 0.1 dB PSNR / 2% tOF)."""
    from tecogan_tpu.cli.run import compare_parity, read_frameavg_csv
    import pandas as pd

    csv = tmp_path / "metrics.csv"
    # Stacked blocks exactly as eval/suite.py (and reference metrics.py)
    # write them: per-frame block, Avg_ block, FolderAvg_ block, FrameAvg_.
    pd.DataFrame({"PSNR_00": pd.Series([25.0, 26.0])}).to_csv(csv, mode="w")
    pd.DataFrame({"Avg_PSNR": pd.Series([25.5])}).to_csv(csv, mode="a")
    pd.DataFrame({"FolderAvg_PSNR": pd.Series([25.5]),
                  "FolderAvg_tOF": pd.Series([2.2])}).to_csv(csv, mode="a")
    pd.DataFrame({"FrameAvg_PSNR": pd.Series([25.5]),
                  "FrameAvg_tOF": pd.Series([2.2])}).to_csv(csv, mode="a")
    ref = read_frameavg_csv(str(csv))
    assert ref == {"FrameAvg_PSNR": 25.5, "FrameAvg_tOF": 2.2}

    ours_pass = {"FrameAvg_PSNR": 25.45, "FrameAvg_tOF": 2.23}
    ours_fail_psnr = {"FrameAvg_PSNR": 25.29, "FrameAvg_tOF": 2.2}
    ours_fail_tof = {"FrameAvg_PSNR": 25.5, "FrameAvg_tOF": 2.35}
    assert compare_parity(ours_pass, ref)
    assert not compare_parity(ours_fail_psnr, ref)
    assert not compare_parity(ours_fail_tof, ref)


def test_parity_gate_requires_model(tmp_path):
    from tecogan_tpu.cli.run import case_parity

    rc = case_parity(str(tmp_path), ["calendar"], [])
    assert rc == 2  # missing model/TecoGAN.npz -> instructions, no crash


def _write_random_vgg_npz(path):
    """Dump random VGG19 params in the TF-slim naming load_vgg19_npz expects
    (the format the case-0 conversion recipe produces from vgg_19.ckpt)."""
    from tecogan_tpu.models.vgg19 import random_vgg19_params

    flat = {}
    for name, d in random_vgg19_params(seed=3).items():  # e.g. "conv1_1"
        block = name[4]
        flat[f"vgg_19/conv{block}/{name}/weights"] = np.asarray(d["kernel"])
        flat[f"vgg_19/conv{block}/{name}/biases"] = np.asarray(d["bias"])
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez(path, **flat)


def test_case3_chain_wiring(tmp_path, capsys):
    """The canonical case-3 chain (reference runGan.py:107-244): VGG19 +
    FRVSR warm start are auto-wired when present and refused with printed
    instructions when not (VERDICT r3 #2)."""
    from tecogan_tpu.cli.run import _case3_chain_flags

    root = str(tmp_path)
    # Nothing present: refuse with the VGG fetch+conversion recipe.
    assert _case3_chain_flags(root, [], from_scratch=False) is None
    out = capsys.readouterr().out
    assert "vgg_19" in out and "np.savez" in out

    # VGG present, no FRVSR anywhere: refuse with the warm-start options.
    vgg = os.path.join(root, "model", "vgg_19.npz")
    os.makedirs(os.path.dirname(vgg))
    open(vgg, "wb").close()
    assert _case3_chain_flags(root, [], from_scratch=False) is None
    out = capsys.readouterr().out
    assert "FRVSR" in out and "--from_scratch" in out

    # --from_scratch skips the warm start; VGG still wired.
    assert _case3_chain_flags(root, [], from_scratch=True) == [
        "--vgg_npz", vgg]

    # Published converted model present: both auto-passed.
    frvsr = os.path.join(root, "model", "ourFRVSR.npz")
    open(frvsr, "wb").close()
    flags = _case3_chain_flags(root, [], from_scratch=False)
    assert flags == ["--vgg_npz", vgg, "--pre_trained_dir", frvsr]

    # Hand-passed flags are never overridden.
    assert _case3_chain_flags(
        root, ["--vgg_npz", "v", "--pre_trained_dir", "d"],
        from_scratch=False) == []
    # --allow_random_weights substitutes for the VGG npz (smoke runs).
    os.remove(vgg)
    assert _case3_chain_flags(
        root, ["--allow_random_weights"], from_scratch=True) == []


def test_case3_discovers_case4_checkpoints(tmp_path):
    """Without the published npz, case 3 warm-starts from the newest local
    case-4 run (reference runGan.py:126-127 'FRVSRModel = ex_FRVSR.../
    model-500000')."""
    import jax

    from tecogan_tpu.cli.run import _find_frvsr_weights
    from tecogan_tpu.train.checkpoint import save_checkpoint
    from tecogan_tpu.train.trainer import Trainer

    root = str(tmp_path)
    assert _find_frvsr_weights(root) is None
    # An ex_FRVSR dir without checkpoints is skipped.
    empty = os.path.join(root, "ex_FRVSR_old", "checkpoints")
    os.makedirs(empty)
    assert _find_frvsr_weights(root) is None

    cfg = TecoConfig(num_resblock=2, crop_size=8, batch_size=2, rnn_n=3,
                     ratio=-0.01, vgg_scaling=-0.002, remat_generator=False)
    state = Trainer(cfg).init_state(jax.random.PRNGKey(0))
    ck = os.path.join(root, "ex_FRVSRmm-dd-hh", "checkpoints")
    save_checkpoint(ck, state, 2)
    assert _find_frvsr_weights(root) == ck
    # The converted published model takes precedence when present.
    npz = os.path.join(root, "model", "ourFRVSR.npz")
    os.makedirs(os.path.dirname(npz))
    open(npz, "wb").close()
    assert _find_frvsr_weights(root) == npz


@pytest.mark.slow
def test_run_case4_then_case3_end_to_end(tmp_path, monkeypatch):
    """The published training recipe, end to end through the orchestration
    CLI on synthetic data: case 4 trains FRVSR and saves checkpoints; case 3
    then auto-discovers them + the converted VGG npz and warm-starts the
    adversarial run (reference runGan.py:107-244) — no hand-passed flags
    beyond the tiny-shape overrides. Case 3 runs one resblock DEEPER than
    case 4 (the reference grows 10 -> 16, runGan.py:161,269), exercising the
    rest_zero partial restore through the real orchestration path."""
    from tecogan_tpu.cli import run as run_mod

    root = str(tmp_path)
    write_synthetic_scenes(os.path.join(root, "TrainingDataPath"),
                           num_scenes=3, num_frames=12, height=96, width=112,
                           start_index=2000)
    _write_random_vgg_npz(os.path.join(root, "model", "vgg_19.npz"))

    # Subprocesses must land on CPU, not the TPU tunnel.
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    monkeypatch.setenv("PYTHONPATH", repo)

    tiny = ["--num_resblock", "2", "--crop_size", "8", "--batch_size", "2",
            "--rnn_n", "3", "--max_iter", "2", "--str_dir", "2000",
            "--end_dir", "2001", "--end_dir_val", "2002", "--max_frm", "11",
            "--queue_thread", "2", "--no_mesh", "--no_test_while_train"]

    with pytest.raises(SystemExit) as e:
        run_mod.main(["4", "--root", root] + tiny)
    assert e.value.code == 0
    from tecogan_tpu.train.checkpoint import latest_step
    ck = os.path.join(root, "ex_FRVSRmm-dd-hh", "checkpoints")
    assert latest_step(ck) == 2

    tiny3 = list(tiny)
    tiny3[tiny3.index("--num_resblock") + 1] = "3"
    with pytest.raises(SystemExit) as e:
        run_mod.main(["3", "--root", root] + tiny3)
    assert e.value.code == 0
    log = os.path.join(root, "ex_TecoGANmm-dd-hh", "log", "logfile.txt")
    text = open(log).read()
    assert "Warm-started weights from" in text
    # The 2-block FRVSR checkpoint grew into the 3-block TecoGAN via the
    # reference's rest_zero intersection restore (main.py:312-320).
    assert "partial gen_params restore" in text
    assert "zero-filled (identity)" in text
    assert latest_step(
        os.path.join(root, "ex_TecoGANmm-dd-hh", "checkpoints")) == 2
