"""Headline benchmark: streaming 4x VSR inference throughput, Vid4-calendar
protocol (reference main.py:253-270 timing semantics).

Workload: 41 frames + 5 warm-up at 144x180 LR -> 576x720 HR through the
flagship 16-resblock TecoGAN generator + FNet, timed after a one-chunk
compile warm-up. Prints ONE JSON line.

`vs_baseline` is frames/sec divided by REF_GPU_FPS, the TF1-GPU reference
throughput on this exact workload. The reference repo publishes no numbers
(BASELINE.md); REF_GPU_FPS is the driver's working estimate for the TF-1.x
single-GPU pipeline (double per-frame host<->device upload + two sess.run
round-trips per frame, reference main.py:256-260). North star: vs_baseline
>= 10 (BASELINE.json).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

REF_GPU_FPS = 10.0  # assumed TF1-GPU reference on Vid4 calendar (BASELINE.md)

FRAMES, H, W = 41, 144, 180
WARMUP = 5


def main() -> None:
    import jax
    import jax.numpy as jnp

    from tecogan_tpu.config import TecoConfig
    from tecogan_tpu.recurrent.inference import StreamingSR

    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")
    cfg = TecoConfig(num_resblock=16, compute_dtype=dtype, infer_chunk=16)

    from tecogan_tpu.models import FNet, Generator

    generator = Generator(num_resblock=cfg.num_resblock, channels=cfg.gen_channels,
                          dtype=jnp.dtype(dtype))
    fnet = FNet(channels=cfg.fnet_channels, up_channels=cfg.fnet_up_channels,
                max_velocity=cfg.flow_max_velocity, dtype=jnp.dtype(dtype))
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    gen_params = generator.init(k1, jnp.zeros((1, H, W, 51)))["params"]
    fnet_params = fnet.init(k2, jnp.zeros((1, H, W, 6)))["params"]

    rng = np.random.RandomState(0)
    frames = rng.rand(FRAMES + WARMUP, H, W, 3).astype(np.float32)

    sr = StreamingSR(cfg, gen_params, fnet_params)
    # Compile warm-up: run once, discard timing.
    sr.run(frames, warmup=WARMUP)

    best = None
    for _ in range(3):
        hr, secs = sr.run(frames, warmup=WARMUP)
        fps = (FRAMES + WARMUP) / secs  # warm-up frames are timed (main.py:262-269)
        best = fps if best is None else max(best, fps)
    assert hr.shape == (FRAMES, 4 * H, 4 * W, 3)

    print(json.dumps({
        "metric": "vid4_calendar_4x_inference",
        "value": round(best, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(best / REF_GPU_FPS, 3),
    }))


if __name__ == "__main__":
    main()
