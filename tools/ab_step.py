"""A/B the 2160p in-scan step across recent optimizations.

Toggles (by monkeypatching) the folded output conv and the per-tile s2d
fusion, measuring StreamingSR.device_fps for each combination.

Usage: python tools/ab_step.py
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root (run as a script)
import tecogan_tpu.models.layers as layers
import tecogan_tpu.ops.warp as W
from tecogan_tpu.config import TecoConfig
from tecogan_tpu.models import FNet, Generator
from tecogan_tpu.recurrent.inference import StreamingSR

H, Wd = 540, 960


def post_s2d_warp(image, flow, block=4, scale=1.0, shift=0.0,
                  row_block=240, col_block=512):
    b, h, w, c = image.shape
    out = W.dense_image_warp(image, flow, row_block=row_block,
                             col_block=col_block)
    dtype = image.dtype
    if scale != 1.0 or shift != 0.0:
        out = out * jnp.asarray(scale, dtype) + jnp.asarray(shift, dtype)
    return W._s2d_tile(out, block)


def main() -> None:
    cfg = TecoConfig(num_resblock=16, compute_dtype="bfloat16", infer_chunk=24)
    gen = Generator(num_resblock=16, channels=cfg.gen_channels,
                    dtype=jnp.bfloat16)
    fnet = FNet(channels=cfg.fnet_channels, up_channels=cfg.fnet_up_channels,
                max_velocity=cfg.flow_max_velocity, dtype=jnp.bfloat16)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    gp = gen.init(k1, jnp.zeros((1, H, Wd, 51)))["params"]
    fp = fnet.init(k2, jnp.zeros((1, H, Wd, 6)))["params"]
    frames = np.random.RandomState(0).rand(24, H, Wd, 3).astype(np.float32)

    import tecogan_tpu.recurrent.inference as inf

    fold_default = layers._FOLD_THRESHOLD_PIXELS
    tile_warp = inf.warp_space_to_depth

    for fold, tile in [(True, True), (True, False), (False, True),
                       (False, False)]:
        layers._FOLD_THRESHOLD_PIXELS = fold_default if fold else 10 ** 12
        inf.warp_space_to_depth = tile_warp if tile else post_s2d_warp
        sr = StreamingSR(cfg, gp, fp, output="uint8")
        fps = sr.device_fps(frames, reps=3)
        print(f"fold_outconv={fold!s:5s} tile_s2d={tile!s:5s}: {fps:6.2f} fps "
              f"({1e3/fps:6.2f} ms/frame)")


if __name__ == "__main__":
    main()
