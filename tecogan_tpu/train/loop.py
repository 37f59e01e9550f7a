"""The training driver loop (reference main.py:273-430).

Responsibilities, in reference order:
- source-provenance + config dump into the summary dir (main.py:274-277)
- restore logic: full resume from our own checkpoints, or partial warm start
  from a previous run (main.py:312-324,345-352)
- step loop with display/summary/save frequencies (main.py:377-421)
- validation losses every ``summary_freq`` on the held-out scene split
  (main.py:394-402)
- periodic checkpoint + detached test-while-train inference subprocess
  (main.py:151-174,418-421)
- KeyboardInterrupt saves a final checkpoint (main.py:423-429); SIGTERM
  (cloud/TPU preemption notice — no reference analog, the reference only
  handles Ctrl-C) finishes the in-flight step, saves, and exits cleanly

TPU deviations by design: the step is one jitted program (no fetch lists);
data-parallel over a mesh when more than one device is visible; throughput
is reported as images/sec * frame_len like the reference (main.py:404-411).
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time
from typing import Optional

import jax
import numpy as np

from tecogan_tpu.config import TecoConfig
from tecogan_tpu.data.loader import BatchLoader, SceneDataset
from tecogan_tpu.train.checkpoint import (
    latest_step,
    restore_checkpoint,
    save_checkpoint,
    warm_start,
)
from tecogan_tpu.train.trainer import Trainer
from tecogan_tpu.utils.logging import param_summary
from tecogan_tpu.utils.summaries import SummaryLogger


def build_trainer(config: TecoConfig, vgg_params=None, use_mesh: bool = True):
    """Trainer on one device, or DataParallelTrainer over all of them."""
    if use_mesh and len(jax.devices()) > 1:
        from tecogan_tpu.parallel import DataParallelTrainer, make_mesh

        mesh = make_mesh({config.dp_axis: -1})
        return DataParallelTrainer(config, mesh, vgg_params=vgg_params)
    return Trainer(config, vgg_params=vgg_params)


# Live test-while-train children; reaped (poll) on each new spawn and at
# train() exit so long runs never accumulate zombies.
_twt_procs: list = []


def _reap_test_while_train(final: bool = False) -> None:
    for proc, log_path in list(_twt_procs):
        rc = proc.poll()
        if rc is None:
            if final:  # exiting: orphans reparent to init, which reaps them
                print(f"test-while-train child pid={proc.pid} still running; "
                      f"log: {log_path}")
                _twt_procs.remove((proc, log_path))
            continue
        _twt_procs.remove((proc, log_path))
        if rc != 0:  # surface crashed children (their output is in the log)
            print(f"test-while-train child exited rc={rc}; log: {log_path}")


def _spawn_test_while_train(config: TecoConfig, output_dir: str,
                            ckpt_dir: str) -> Optional[subprocess.Popen]:
    """Fork a detached inference run on the fresh checkpoint
    (reference testWhileTrain main.py:151-174, detach main.py:148-149).

    Output goes to ``<output_dir>/train/test_while_train.log`` (the reference
    shows child output inline; a log keeps it visible without interleaving),
    and previously spawned children are reaped here."""
    _reap_test_while_train()
    test_dir = config.input_video_dir and os.path.join(
        os.path.dirname(config.input_video_dir), "LR", "calendar"
    )
    if not test_dir or not os.path.isdir(test_dir):
        return None
    twt_dir = os.path.join(output_dir, "train")
    os.makedirs(twt_dir, exist_ok=True)
    cmd = [
        sys.executable, "-m", "tecogan_tpu.cli.main",
        "--mode", "inference",
        "--input_dir_LR", test_dir,
        "--output_dir", twt_dir,
        "--checkpoint", ckpt_dir,
        "--num_resblock", str(config.num_resblock),
        "--output_name", "train_out",
        "--max_frames", "10",
    ]
    log_path = os.path.join(twt_dir, "test_while_train.log")
    with open(log_path, "ab") as log:
        proc = subprocess.Popen(
            cmd, preexec_fn=os.setpgrp,
            stdout=log, stderr=subprocess.STDOUT,
        )
    _twt_procs.append((proc, log_path))
    return proc


class _PreemptionGuard:
    """Graceful-shutdown flag for SIGTERM.

    Cloud TPU/GKE preemption delivers SIGTERM with a grace window before the
    hard kill; the reference saves only on Ctrl-C (main.py:423-429). The
    handler just sets a flag — the step loop finishes the in-flight jitted
    step (interrupting XLA mid-dispatch is not safe), saves a checkpoint,
    and returns, so a preempted run resumes exactly where it stopped.
    No-op outside the main thread (signal.signal raises ValueError there).
    """

    def __init__(self):
        self.fired = False
        self._prev = None
        self._installed = False

    def __enter__(self):
        def handler(signum, frame):
            self.fired = True
            print("SIGTERM: finishing current step, saving final checkpoint")

        try:
            self._prev = signal.signal(signal.SIGTERM, handler)
            self._installed = True
        except ValueError:
            pass
        return self

    def __exit__(self, *exc):
        if self._installed:
            # self._prev is None when the prior handler was installed outside
            # Python (embedded interpreters); signal.signal(SIGTERM, None)
            # raises TypeError — fall back to the default disposition.
            signal.signal(signal.SIGTERM,
                          self._prev if self._prev is not None
                          else signal.SIG_DFL)
        return False


def train(
    config: TecoConfig,
    output_dir: str,
    summary_dir: Optional[str] = None,
    vgg_params=None,
    pre_trained_dir: Optional[str] = None,
    max_steps: Optional[int] = None,
    use_mesh: bool = True,
    test_while_train: bool = True,
):
    """Run training to ``max_iter`` (or ``max_steps``); returns final state."""
    summary_dir = summary_dir or os.path.join(output_dir, "log")
    ckpt_dir = os.path.join(output_dir, "checkpoints")
    os.makedirs(output_dir, exist_ok=True)
    os.makedirs(summary_dir, exist_ok=True)

    # Config provenance (reference copies its .py sources, main.py:274-277;
    # a json dump is the config-file equivalent).
    with open(os.path.join(summary_dir, "config.json"), "w") as f:
        f.write(config.to_json())
    with open(os.path.join(output_dir, "config.json"), "w") as f:
        f.write(config.to_json())

    trainer = build_trainer(config, vgg_params=vgg_params, use_mesh=use_mesh)
    state = trainer.init_state(jax.random.PRNGKey(config.rand_seed))
    param_summary("generator", state.gen_params)
    param_summary("fnet", state.fnet_params)
    if config.gan:
        param_summary("tdiscriminator", state.d_params)

    # Restore: full resume beats warm start (reference main.py:345-352).
    resumed = latest_step(ckpt_dir)
    if resumed is not None:
        state = restore_checkpoint(ckpt_dir, state)
        print(f"Resumed from step {resumed}")
    elif pre_trained_dir:
        state = warm_start(state, pre_trained_dir)
        print(f"Warm-started weights from {pre_trained_dir}")

    # Per-host data sharding: each process loads a disjoint stride of the
    # example index space and its process-local slice of the global batch.
    shard_kw = dict(shard_id=jax.process_index(),
                    num_shards=jax.process_count())
    dataset = SceneDataset(config, validation=False)
    loader = BatchLoader(dataset, executor="auto", **shard_kw)
    try:
        val_loader = BatchLoader(SceneDataset(config, validation=True),
                                 seed=config.rand_seed + 1, executor="auto",
                                 **shard_kw)
    except FileNotFoundError:
        val_loader = None
    print(f"Dataset: {len(dataset.scenes)} scenes, {len(dataset)} windows, "
          f"steps/epoch {len(dataset) // config.batch_size}")

    logger = SummaryLogger(summary_dir)
    put = getattr(trainer, "put_batch", lambda b: b)
    total = max_steps if max_steps is not None else config.max_iter
    t_window, frames_window = time.perf_counter(), 0
    metrics = {}

    try:
        with _PreemptionGuard() as preempt, loader:
            start_step = int(jax.device_get(state.step))
            for it in range(start_step, total):
                if preempt.fired:
                    step = int(jax.device_get(state.step))
                    # Guard against StepAlreadyExistsError: SIGTERM can land
                    # right after a save_freq save (or before the first step
                    # after resume) — that step is already on disk.
                    if latest_step(ckpt_dir) != step:
                        save_checkpoint(ckpt_dir, state, step)
                    print(f"Preempted: saved final checkpoint at step {step}")
                    break
                batch = put(loader.next_batch())
                state, metrics = trainer.train_step(state, batch)
                frames_window += config.batch_size * config.unroll_frames

                step = it + 1
                if step % config.display_freq == 0:
                    m = {k: float(jax.device_get(v)) for k, v in metrics.items()}
                    dt = time.perf_counter() - t_window
                    ips = frames_window / dt if dt > 0 else 0.0
                    t_window, frames_window = time.perf_counter(), 0
                    msg = ", ".join(f"{k} {v:.4f}" for k, v in sorted(m.items()))
                    print(f"step {step}: image/sec*frames {ips:.1f} | {msg}")
                if step % config.summary_freq == 0:
                    emas = jax.device_get(state.ema_losses)
                    logger.scalars(step, emas)
                    logger.scalars(step, {
                        "learning_rate": float(jax.device_get(
                            metrics["learning_rate"]))})
                    if config.gan:
                        # D-health telemetry (reference Teco.py:451-452,
                        # 495-496): gate balance EMA + branch counters.
                        logger.scalars(step, {
                            "t_balance_EMA": float(jax.device_get(
                                state.ema_tbalance)),
                            "withD_counter": int(jax.device_get(
                                state.counter_with_d)),
                            "w_o_D_counter": int(jax.device_get(
                                state.counter_wo_d)),
                        })
                    if val_loader is not None:
                        vm = trainer.eval_step(state, put(val_loader.next_batch()))
                        logger.scalars(
                            step,
                            {k: float(jax.device_get(v)) for k, v in vm.items()},
                            prefix="val_",
                        )
                if step % config.save_freq == 0 or step == total:
                    save_checkpoint(ckpt_dir, state, step)
                    print(f"Saved checkpoint at step {step}")
                    # Animated sequence summaries (reference gif_summary of
                    # LR/HR/Generated, Teco.py:498-503).
                    try:
                        lr_s, hr_s, gen_s, warppre_s = trainer.generate(
                            state, batch)
                        for tag, seq in (("InputLR", lr_s),
                                         ("TargetHR", hr_s),
                                         ("GeneratedHR", gen_s),
                                         # reference Teco.py:503
                                         ("WarpPreGen", warppre_s)):
                            logger.gif(step, tag,
                                       np.asarray(jax.device_get(seq)),
                                       max_outputs=1)
                    except Exception as e:  # summaries must never kill training
                        print(f"gif summary failed: {e}")
                    if test_while_train:
                        _spawn_test_while_train(config, output_dir, ckpt_dir)
    except KeyboardInterrupt:
        # Final save on Ctrl-C (reference main.py:423-429); skip when this
        # exact step was just saved by the save_freq branch.
        step = int(jax.device_get(state.step))
        if latest_step(ckpt_dir) != step:
            save_checkpoint(ckpt_dir, state, step)
        print(f"KeyboardInterrupt: saved final checkpoint at step {step}")
    finally:
        if val_loader is not None:
            val_loader.stop()
        logger.close()
        _reap_test_while_train(final=True)
    return state
