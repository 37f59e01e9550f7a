"""Restructure the N=3 output conv at 2160p (VERDICT r1 #7).

The generator's output stage (3x3, 64->3) at 2160x3840 runs at ~2.3 TF/s:
with 3 output channels the MXU uses 3/128 lanes. Folding G adjacent output
COLUMNS into channels makes it a stride-(1,G) conv with a 3x(G+2) kernel and
3G output channels — identical math (each output pixel still sees exactly
its 3x3x64 window; the folded kernel is block-shifted copies of K), then a
free row-major reshape (W/G, 3G) -> (W, 3).

Usage: python tools/outconv_experiments.py
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root (run as a script)
from tecogan_tpu.utils.profiling import device_time

H, W = 2160, 3840


def fold_kernel(k: jnp.ndarray, g: int) -> jnp.ndarray:
    """(3, 3, I, O) -> (3, g+2, I, g*O) column-folded kernel."""
    _, _, i, o = k.shape
    kw = np.zeros((3, g + 2, i, g * o), k.dtype)
    k = np.asarray(k)
    for j in range(g):  # output column j of the group reads cols j..j+2
        kw[:, j : j + 3, :, j * o : (j + 1) * o] = k
    return jnp.asarray(kw)


def main() -> None:
    dtype = jnp.bfloat16
    rng = np.random.RandomState(0)
    y = jnp.asarray(rng.rand(1, H, W, 64) - 0.5, dtype)
    k = jnp.asarray(rng.rand(3, 3, 64, 3) * 0.05, dtype)
    skip = jnp.asarray(rng.rand(1, H, W, 3), dtype)

    def post(net):  # the real consumer chain: +skip, deprocess-ish, quant
        net = net + skip
        return jnp.clip(net.astype(jnp.float32) * 255.0, 0, 255).astype(jnp.uint8)

    @jax.jit
    def baseline(v, kk):
        out = jax.lax.conv_general_dilated(
            v, kk, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return post(out)

    def folded(g):
        kw = fold_kernel(k, g)

        @jax.jit
        def run(v, kkw):
            out = jax.lax.conv_general_dilated(
                v, kkw, (1, g), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            out = out.reshape(1, H, W, 3)
            return post(out)
        return run, kw

    sec = device_time(baseline, y, k, iters=8)
    print(f"baseline 64->3          : {sec*1e3:7.2f} ms")
    want = np.asarray(baseline(y, k))
    for g in (8, 16, 32, 64):
        run, kw = folded(g)
        sec = device_time(run, y, kw, iters=8)
        got = np.asarray(run(y, kw))
        diff = np.abs(got.astype(np.int32) - want.astype(np.int32)).max()
        print(f"folded g={g:<3d} (N={3*g:<3d})   : {sec*1e3:7.2f} ms   "
              f"max uint8 diff {diff}")


if __name__ == "__main__":
    main()
