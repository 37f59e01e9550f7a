"""Multi-stream 2160p aggregate throughput probe (VERDICT r4 #5).

One chip serving B concurrent 540p->2160p streams through the scan-batched
streaming engine (the same path bench.py's ``multi_stream_fps`` measures at
the calendar geometry). State fits HBM: per stream the resident recurrent
state is one 2160x3840x3 bf16 HR frame (~50 MB) + the LR window; B=2 is
~twice that plus the batched activations.

Usage: python tools/bench_2160p_multi.py [B] [frames] [chunk]
Prints one JSON line (median + spread over >=3 passes).
"""

from __future__ import annotations

import json
import sys

import numpy as np

import os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

H, W = 540, 960


def main() -> None:
    import jax
    import jax.numpy as jnp

    from tecogan_tpu.config import TecoConfig
    from tecogan_tpu.models import FNet, Generator
    from tecogan_tpu.recurrent.inference import StreamingSR

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    _ = int(sys.argv[2]) if len(sys.argv) > 2 else 48  # legacy arg slot (window is chunk-sized now)
    # The dominant HBM temp is FNet's legacy-bilinear decoder resize, which
    # scales with the fnet batch = B * window (NOT infer_chunk: the fps
    # sampler scans its whole input). B=2 x 48-frame window = batch 96 ->
    # 17.68G (OOM); chunk-sized windows keep it ~B*chunk/96 of that.
    chunk = int(sys.argv[3]) if len(sys.argv) > 3 else (12 if b == 1 else 6)

    cfg = TecoConfig(num_resblock=16, compute_dtype="bfloat16",
                     infer_chunk=chunk)
    generator = Generator(num_resblock=cfg.num_resblock,
                          channels=cfg.gen_channels, dtype=jnp.bfloat16)
    fnet = FNet(channels=cfg.fnet_channels, up_channels=cfg.fnet_up_channels,
                max_velocity=cfg.flow_max_velocity, dtype=jnp.bfloat16)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    gp = generator.init(k1, jnp.zeros((1, H, W, 51)))["params"]
    fp = fnet.init(k2, jnp.zeros((1, H, W, 6)))["params"]

    rng = np.random.RandomState(0)
    # Time a chunk-sized window with chained state (bench_long.py's
    # protocol): device_fps_* feeds its whole input as ONE scan, so the
    # window must be chunk-sized or the batched fnet temp explodes
    # (48-frame window at B=2 = fnet batch 96 -> 17.68G HBM, OOM).
    frames = rng.rand(chunk, H, W, 3).astype(np.float32)
    streams = np.stack([frames] * b)

    sr = StreamingSR(cfg, gp, fp, output="uint8")
    samples = sorted(sr.device_fps_batched_samples(streams, reps=2, passes=3))
    fps = float(np.median(samples))
    print(json.dumps({
        "metric": f"long_2160p_multi_stream_b{b}",
        "value": round(fps, 2),
        "unit": "frames/sec/chip aggregate",
        "per_stream_fps": round(fps / b, 2),
        "spread": {"passes": len(samples),
                   "min": round(samples[0], 2), "max": round(samples[-1], 2)},
        "config": f"{b}x 540x960->2160x3840, chunk-window {chunk}, bf16",
    }))


if __name__ == "__main__":
    main()
