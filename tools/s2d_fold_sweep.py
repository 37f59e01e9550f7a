"""Crossover sweep for fold_input_s2d (s2d pack folded into a stride-4
input conv) across frame sizes — sets the "auto" threshold.

Round-3 headline ablation (tools/headline_ablate.py): ON = 228.7 fps vs
OFF = 194.2 at 144x180 (HR 414k px). Measured in the real chunk step.

Usage: python tools/s2d_fold_sweep.py
"""

from __future__ import annotations

import json
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tecogan_tpu.config import TecoConfig
from tecogan_tpu.models import FNet, Generator


def main() -> None:
    from tecogan_tpu.recurrent.inference import StreamingSR

    dtype = jnp.bfloat16
    results = {}
    for h, w in ((72, 90), (96, 120), (144, 180)):
        cfg0 = TecoConfig(num_resblock=16, compute_dtype="bfloat16",
                          infer_chunk=23)
        gen = Generator(num_resblock=16, channels=64, dtype=dtype)
        fnet = FNet(channels=cfg0.fnet_channels,
                    up_channels=cfg0.fnet_up_channels,
                    max_velocity=cfg0.flow_max_velocity, dtype=dtype)
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        gp = gen.init(k1, jnp.zeros((1, h, w, 51)))["params"]
        fp = fnet.init(k2, jnp.zeros((1, h, w, 6)))["params"]
        frames = np.random.RandomState(0).rand(46, h, w, 3).astype(np.float32)
        for mode in ("off", "on"):
            sr = StreamingSR(cfg0.replace(fold_input_s2d=mode), gp, fp,
                             output="uint8")
            fps = sr.device_fps(frames, reps=5)
            results[f"{h}x{w}:{mode}"] = round(fps, 1)
            print(f"{h}x{w} s2d={mode}: {fps:.1f} fps "
                  f"(HR px {16 * h * w})", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
