"""In-scan A/B of the flow-upsample implementation (XLA einsum vs Pallas
banded matmul, kernels/upsample4.py) in the real streaming step, plus an
output parity check. Isolated kernel benches mislead (CLAUDE.md) — this is
the decision measurement for ``TecoConfig.pallas_flow_upsample``.

Usage: python tools/upsample_ab.py [H W chunk]   (defaults 144 180 23 —
the measured-working geometry; at 540x960 the kernel's whole-plane blocks
exceed the 16 MB scoped VMEM limit and mode "on" fails to compile, see
BASELINE.md)
"""

from __future__ import annotations

import json
import sys

import numpy as np

import os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tecogan_tpu.config import TecoConfig
from tecogan_tpu.models import FNet, Generator
from tecogan_tpu.recurrent.inference import StreamingSR


def main() -> None:
    h = int(sys.argv[1]) if len(sys.argv) > 1 else 144
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 180
    chunk = int(sys.argv[3]) if len(sys.argv) > 3 else 23

    base = TecoConfig(num_resblock=16, compute_dtype="bfloat16",
                      infer_chunk=chunk)
    generator = Generator(num_resblock=16, channels=base.gen_channels,
                          dtype=jnp.bfloat16)
    fnet = FNet(channels=base.fnet_channels, up_channels=base.fnet_up_channels,
                max_velocity=base.flow_max_velocity, dtype=jnp.bfloat16)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    gp = generator.init(k1, jnp.zeros((1, h, w, 51)))["params"]
    fp = fnet.init(k2, jnp.zeros((1, h, w, 6)))["params"]

    # --no-parity: skip the full-HR download parity check (2160p HR chunks
    # are ~300 MB through this harness's tunnel; op-level parity is golden-
    # tested and the small-geometry A/B checks end-to-end parity).
    parity = "--no-parity" not in sys.argv
    frames = np.random.RandomState(0).rand(chunk, h, w, 3).astype(np.float32)
    out = {}
    hr = {}
    for mode in ("off", "on"):
        cfg = base.replace(pallas_flow_upsample=mode)
        sr = StreamingSR(cfg, gp, fp, output="uint8")
        samples = sorted(sr.device_fps_samples(frames, reps=2, passes=3))
        out[mode] = round(samples[len(samples) // 2], 2)
        out[f"{mode}_spread"] = [round(samples[0], 2), round(samples[-1], 2)]
        if parity:
            hr[mode], _ = sr.run(frames)
    if parity:
        diff = np.abs(hr["off"].astype(int) - hr["on"].astype(int))
        out["max_u8_diff"] = int(diff.max())
        out["frac_gt1"] = float(np.mean(diff > 1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
