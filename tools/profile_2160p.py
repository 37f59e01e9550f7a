"""Per-op breakdown of the 540p->2160p streaming step (VERDICT round-1 #7).

Times each stage of the recurrent frame step in isolation on the real chip
(dependent-scalar sync; block_until_ready is a no-op on the tunneled
backend), plus the full in-scan chunk step for the honest end-to-end number.
Isolated jits carry ~0.5-2 ms dispatch overhead each, so the stage columns
overestimate slightly relative to the fused scan — use them for *shares*,
the chunk row for throughput.

Usage: python tools/profile_2160p.py [H W chunk]
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root (run as a script)
from tecogan_tpu.config import TecoConfig
from tecogan_tpu.models import FNet, Generator
from tecogan_tpu.ops.warp import warp_space_to_depth
from tecogan_tpu.recurrent.inference import StreamingSR
from tecogan_tpu.recurrent.step import upscale_flow
from tecogan_tpu.utils.profiling import device_time


def main() -> None:
    h = int(sys.argv[1]) if len(sys.argv) > 1 else 540
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 960
    chunk = int(sys.argv[3]) if len(sys.argv) > 3 else 24
    dtype = jnp.bfloat16

    cfg = TecoConfig(num_resblock=16, compute_dtype="bfloat16",
                     infer_chunk=chunk)
    generator = Generator(num_resblock=cfg.num_resblock,
                          channels=cfg.gen_channels, dtype=dtype)
    fnet = FNet(channels=cfg.fnet_channels, up_channels=cfg.fnet_up_channels,
                max_velocity=cfg.flow_max_velocity, dtype=dtype)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    gen_params = generator.init(k1, jnp.zeros((1, h, w, 51)))["params"]
    fnet_params = fnet.init(k2, jnp.zeros((1, h, w, 6)))["params"]

    rng = np.random.RandomState(0)
    lr = jnp.asarray(rng.rand(1, h, w, 3), dtype)
    pair = jnp.asarray(rng.rand(1, h, w, 6), dtype)
    hr = jnp.asarray(rng.rand(1, 4 * h, 4 * w, 3), dtype)
    flow_lr = jnp.asarray(rng.rand(1, h, w, 2) * 8 - 4, dtype)
    flow_hr = jnp.asarray(rng.rand(1, 4 * h, 4 * w, 2) * 32 - 16, dtype)
    gin = jnp.asarray(rng.rand(1, h, w, 51), dtype)

    def t(name, fn, *args):
        sec = device_time(jax.jit(fn), *args, iters=10, warmup=2)
        print(f"{name:>14s}: {sec * 1e3:8.2f} ms")
        return sec

    print(f"--- per-stage (isolated jits, {h}x{w} -> {4*h}x{4*w}, bf16) ---")
    t("fnet", lambda p, x: fnet.apply({"params": p}, x), fnet_params, pair)
    t("flow upscale", lambda f: upscale_flow(f, h, w), flow_lr)
    t("warp+s2d", lambda im, fl: warp_space_to_depth(im, fl, 4), hr, flow_hr)
    t("generator", lambda p, x: generator.apply({"params": p}, x),
      gen_params, gin)
    t("uint8 quant",
      lambda x: jnp.clip(x.astype(jnp.float32) * 255.0, 0, 255).astype(jnp.uint8),
      hr)

    print(f"--- full chunk step (scan, chunk={chunk}) ---")
    frames = rng.rand(chunk, h, w, 3).astype(np.float32)
    sr = StreamingSR(cfg, gen_params, fnet_params, output="uint8")
    fps = sr.device_fps(frames, reps=3)
    print(f"  chunk fps: {fps:.2f} frames/sec/chip "
          f"({1e3 / fps:.1f} ms/frame in-scan)")


if __name__ == "__main__":
    main()
