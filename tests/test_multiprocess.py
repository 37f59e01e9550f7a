"""Two-process distributed CPU test.

Exercises the real multi-host entry path end-to-end — init_distributed (must
run before any backend-touching call), global mesh over two processes'
devices, and shard_batch's jax.make_array_from_process_local_data route —
which the in-process 8-device tests cannot reach (SURVEY.md §2.3 multi-host
plan; replaces reference horovod-free single-host assumption main.py:54,108).
"""

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_shard_batch():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()

    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "mp_worker.py"),
             str(port), str(i), "2"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, cwd=REPO,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=180)
        assert p.returncode == 0, f"rc={p.returncode}\n{out}\n{err[-3000:]}"
        outs.append(out)

    # Both processes must see the full global sum of arange(24).
    expect = "RESULT 276.0"
    for i, out in enumerate(outs):
        assert expect in out, (i, out)


def test_two_process_train_step():
    """A REAL distributed train step (VERDICT r2 #4): two processes, 4
    global devices, full TecoGAN adversarial step with GSPMD cross-process
    gradient all-reduce — loss-equal to a single-process run of the same
    configuration."""
    import re

    import jax
    import numpy as np

    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()

    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "mp_worker.py"),
             str(port), str(i), "2", "train"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, cwd=REPO,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=540)
        assert p.returncode == 0, f"rc={p.returncode}\n{out}\n{err[-3000:]}"
        outs.append(out)

    def losses(text):
        pat = re.compile(
            r"STEP (\d+) All_loss_Gen ([-\d.]+) t_discrim_loss ([-\d.]+)")
        return {int(m[0]): (float(m[1]), float(m[2]))
                for m in pat.findall(text)}

    got0, got1 = losses(outs[0]), losses(outs[1])
    assert set(got0) == set(got1) == {0, 1}, (outs[0], outs[1])
    # The two processes see identical replicated metrics.
    for step in (0, 1):
        np.testing.assert_allclose(got0[step], got1[step], rtol=1e-6)

    # Single-process reference: same config, same init rng, same batches.
    from tecogan_tpu.config import TecoConfig
    from tecogan_tpu.train import Trainer

    cfg = TecoConfig(
        num_resblock=2, crop_size=8, batch_size=4, rnn_n=3,
        pingpong=True, ratio=0.01, vgg_scaling=-0.002, remat_generator=True,
    )
    trainer = Trainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    tar = cfg.hr_load_size
    for step in (0, 1):
        batch = np.random.RandomState(step).rand(
            4, cfg.rnn_n, tar, tar, 3).astype(np.float32)
        state, metrics = trainer.train_step(state, batch)
        np.testing.assert_allclose(
            got0[step],
            (float(metrics["All_loss_Gen"]), float(metrics["t_discrim_loss"])),
            rtol=1e-4,
            err_msg=f"2-process train step {step} != single-process")
