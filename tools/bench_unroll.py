"""A/B the streaming-scan unroll factor on the headline workload.

Hypothesis (BASELINE.md round-5 B=1 structural accounting): 0.71 ms/frame
(17%) of the 144x180 headline step is scan-carry relu/add layout copies —
layout flips XLA inserts at the while-loop boundary between the convT-tail
output and the next iteration's warp input. `lax.scan(..., unroll=k)`
compiles k frame steps into one loop body, so those boundary copies are paid
once per k frames; intermediate frames hand the carry over inside one fused
body where XLA may keep the native layout.

Protocol: the exact bench.py workload (46 frames, 144x180, 16 resblocks,
bf16, chunk 23), `device_fps_samples` medians over >= 3 passes per arm,
unroll 1 (baseline) vs 2 / 4 / 8 — same process, back-to-back, so the
tunnel session is held constant (BASELINE.md spread protocol).

Prints one JSON line per arm.
"""

from __future__ import annotations

import json
import os as _os
import sys

import numpy as np

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

FRAMES, H, W = 41, 144, 180
WARMUP = 5


def main() -> None:
    import argparse

    import jax
    import jax.numpy as jnp

    from tecogan_tpu.config import TecoConfig
    from tecogan_tpu.models import FNet, Generator
    from tecogan_tpu.recurrent.inference import StreamingSR

    p = argparse.ArgumentParser()
    p.add_argument("--unrolls", default="1,2,4",
                   help="unroll=8's compile alone blows a 900 s budget; "
                        "opt in explicitly if you want it")
    p.add_argument("--passes", type=int, default=3)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--size", default=f"{H}x{W}",
                   help="LR geometry HxW (default the headline 144x180)")
    args = p.parse_args()
    h, w = (int(v) for v in args.size.split("x"))

    cfg = TecoConfig(num_resblock=16, compute_dtype="bfloat16",
                     infer_chunk=23)
    generator = Generator(num_resblock=cfg.num_resblock,
                          channels=cfg.gen_channels, dtype=jnp.bfloat16)
    fnet = FNet(channels=cfg.fnet_channels, up_channels=cfg.fnet_up_channels,
                max_velocity=cfg.flow_max_velocity, dtype=jnp.bfloat16)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    gen_params = generator.init(k1, jnp.zeros((1, h, w, 51)))["params"]
    fnet_params = fnet.init(k2, jnp.zeros((1, h, w, 6)))["params"]

    rng = np.random.RandomState(0)
    frames = rng.rand(FRAMES + WARMUP, h, w, 3).astype(np.float32)

    baseline = None
    for u in (int(v) for v in args.unrolls.split(",")):
        sr = StreamingSR(cfg, gen_params, fnet_params, output="uint8",
                         scan_unroll=u)
        samples = sorted(sr.device_fps_samples(
            frames, reps=args.reps, passes=args.passes))
        med = float(np.median(samples))
        if baseline is None:
            baseline = med
        print(json.dumps({
            "metric": "headline_scan_unroll_ab",
            "unroll": u,
            "fps": round(med, 1),
            "spread": {"passes": len(samples),
                       "min": round(samples[0], 1),
                       "max": round(samples[-1], 1)},
            "vs_unroll1": round(med / baseline, 4),
            "config": f"{h}x{w}->{4*h}x{4*w}, chunk 23, bf16, 16rb",
        }), flush=True)


if __name__ == "__main__":
    main()
