"""Training-throughput benchmark (not driver-run; see bench.py for the
headline metric).

Measures steady-state train-step time at the reference's canonical
configuration (batch 4, crop 32, RNN_N 10 — reference runGan.py:147-163) for
FRVSR (case 4) and TecoGAN (case 3). ``tecogan --vgg`` is the full case-3
step including the VGG19 perceptual term at ``--vgg_scaling 0.2`` (reference
runGan.py:162-164, Teco.py:174-178) with RANDOM VGG weights — step cost is
weight-independent, so this is the true hardware cost even though the
pretrained vgg_19.ckpt is not distributable here. Reports
images/sec * frame_len like the reference console (main.py:404-411).

Usage: python bench_train.py [frvsr|tecogan] [--vgg]
       [--no_fold | --fold | --fold_patchify]   (train_fold_s2d A/B)
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from tecogan_tpu.config import TecoConfig
    from tecogan_tpu.train.trainer import Trainer
    from tecogan_tpu.utils.profiling import device_time

    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    mode = argv[0] if argv else "frvsr"
    use_vgg = "--vgg" in sys.argv
    # A/B: train-scan s2d fold mode (config.py train_fold_s2d; default is
    # the config default — "patchify" since round 4).
    if "--fold_patchify" in sys.argv:
        use_fold = "patchify"
    elif "--fold" in sys.argv:
        use_fold = True
    elif "--no_fold" in sys.argv:
        use_fold = False
    else:
        use_fold = None
    kw = {} if use_fold is None else {"train_fold_s2d": use_fold}
    cfg = TecoConfig(
        num_resblock=10 if mode == "frvsr" else 16,
        batch_size=4, crop_size=32, rnn_n=10,
        learning_rate=5e-5,
        ratio=-0.01 if mode == "frvsr" else 0.01,
        pingpong=mode != "frvsr",
        vgg_scaling=0.2 if use_vgg else -0.002,  # runGan.py:162-163
        compute_dtype="bfloat16",
        **kw,
    )
    vgg_params = None
    if use_vgg:
        from tecogan_tpu.models.vgg19 import random_vgg19_params

        vgg_params = random_vgg19_params()
    trainer = Trainer(cfg, vgg_params=vgg_params)
    state = trainer.init_state(jax.random.PRNGKey(0))
    tar = cfg.hr_load_size
    batch = jnp.asarray(
        np.random.RandomState(0).rand(cfg.batch_size, cfg.rnn_n, tar, tar, 3),
        jnp.float32,
    )

    holder = {"state": state}

    def step(b):
        holder["state"], metrics = trainer.train_step(holder["state"], b)
        return metrics["All_loss_Gen"]

    secs = device_time(step, batch, iters=10, warmup=3)
    ips = cfg.batch_size * cfg.unroll_frames / secs
    print(json.dumps({
        "metric": f"train_step_{mode}" + ("_vgg" if use_vgg else "")
                  + ("_fold_patchify" if use_fold == "patchify"
                     else "_fold" if use_fold is True
                     else "_no_fold" if use_fold is False else ""),
        "value": round(ips, 1),
        "unit": "images/sec*frames",
        "step_ms": round(secs * 1e3, 1),
        "config": f"b{cfg.batch_size} crop{cfg.crop_size} rnn{cfg.rnn_n} "
                  f"res{cfg.num_resblock} pingpong={cfg.pingpong}",
    }))


if __name__ == "__main__":
    main()
