"""Diagnose XLA conv efficiency at the 2160p generator scale (VERDICT r1 #7).

The generator trunk is 32 sequential 3x3 64ch convs at 540x960. Round-1
measurements (144x180) put XLA's conv at ~33 TF/s (~17% MFU). This script
measures, at (1, 540, 960, C) bf16:
  - the full XLA resblock chain (baseline),
  - one 3x3 conv at several channel widths (is N=64 the ceiling?),
  - NCHW vs NHWC layout,
  - a 9-shifted-tap dot_general conv (no im2col),
  - the conv_transpose x2 stages and the 51->64 input conv.

Usage: python tools/conv_experiments.py [H W]
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root (run as a script)
from tecogan_tpu.kernels.resblocks import resblock_chain_xla
from tecogan_tpu.utils.profiling import device_time


def gf_conv(h, w, cin, cout, k=3):
    return h * w * k * k * cin * cout * 2 / 1e9


def main() -> None:
    h = int(sys.argv[1]) if len(sys.argv) > 1 else 540
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 960
    dtype = jnp.bfloat16
    rng = np.random.RandomState(0)

    def report(name, sec, gflops):
        print(f"{name:34s}: {sec*1e3:8.2f} ms  {gflops/sec/1e3:7.1f} TF/s")

    # --- full trunk baseline
    x = jnp.asarray(rng.rand(1, h, w, 64) - 0.5, dtype)
    w1 = jnp.asarray(rng.rand(16, 3, 3, 64, 64) * 0.05, dtype)
    b1 = jnp.asarray(rng.rand(16, 64) * 0.01, dtype)
    w2 = jnp.asarray(rng.rand(16, 3, 3, 64, 64) * 0.05, dtype)
    b2 = jnp.asarray(rng.rand(16, 64) * 0.01, dtype)
    sec = device_time(jax.jit(resblock_chain_xla), x, w1, b1, w2, b2, iters=5)
    report("trunk: 16 resblocks XLA", sec, 32 * gf_conv(h, w, 64, 64))

    # --- one conv at several widths
    for cin, cout in [(64, 64), (64, 128), (128, 128), (51, 64), (64, 256)]:
        xi = jnp.asarray(rng.rand(1, h, w, cin) - 0.5, dtype)
        wi = jnp.asarray(rng.rand(3, 3, cin, cout) * 0.05, dtype)
        f = jax.jit(lambda a, ww: jax.lax.conv_general_dilated(
            a, ww, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")))
        sec = device_time(f, xi, wi, iters=10)
        report(f"conv3x3 {cin}->{cout} NHWC", sec, gf_conv(h, w, cin, cout))

    # --- NCHW layout
    xn = jnp.asarray(rng.rand(1, 64, h, w) - 0.5, dtype)
    wn = jnp.asarray(rng.rand(64, 64, 3, 3) * 0.05, dtype)
    f = jax.jit(lambda a, ww: jax.lax.conv_general_dilated(
        a, ww, (1, 1), "SAME", dimension_numbers=("NCHW", "OIHW", "NCHW")))
    sec = device_time(f, xn, wn, iters=10)
    report("conv3x3 64->64 NCHW", sec, gf_conv(h, w, 64, 64))

    # --- 9-shifted-tap dot_general (no im2col): y[p] += x_shift[p] @ W[tap]
    xt = jnp.asarray(rng.rand(1, h, w, 64) - 0.5, dtype)
    wt = jnp.asarray(rng.rand(9, 64, 64) * 0.05, dtype)

    @jax.jit
    def tap_conv(a, ww):
        ap = jnp.pad(a, ((0, 0), (1, 1), (1, 1), (0, 0)))
        acc = jnp.zeros((1, h, w, 64), jnp.float32)
        k = 0
        for dy in range(3):
            for dx in range(3):
                sl = jax.lax.dynamic_slice(ap, (0, dy, dx, 0), (1, h, w, 64))
                acc = acc + jnp.dot(
                    sl.reshape(h * w, 64), ww[k],
                    preferred_element_type=jnp.float32).reshape(1, h, w, 64)
                k += 1
        return acc.astype(a.dtype)

    sec = device_time(tap_conv, xt, wt, iters=10)
    report("conv3x3 64->64 9-tap dot", sec, gf_conv(h, w, 64, 64))

    # --- upsample stages
    xu = jnp.asarray(rng.rand(1, h, w, 64) - 0.5, dtype)
    wu = jnp.asarray(rng.rand(3, 3, 64, 64) * 0.05, dtype)
    f = jax.jit(lambda a, ww: jax.lax.conv_transpose(
        a, ww, (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")))
    sec = device_time(f, xu, wu, iters=10)
    report("convT3x3 s2 64->64 @540p", sec, gf_conv(2 * h, 2 * w, 64, 64) / 4 * 9 / 9)
    xu2 = jnp.asarray(rng.rand(1, 2 * h, 2 * w, 64) - 0.5, dtype)
    sec = device_time(f, xu2, wu, iters=10)
    report("convT3x3 s2 64->64 @1080p", sec, gf_conv(4 * h, 4 * w, 64, 64) / 4 * 9 / 9)

    xo = jnp.asarray(rng.rand(1, 4 * h, 4 * w, 64) - 0.5, dtype)
    wo = jnp.asarray(rng.rand(3, 3, 64, 3) * 0.05, dtype)
    f = jax.jit(lambda a, ww: jax.lax.conv_general_dilated(
        a, ww, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")))
    sec = device_time(f, xo, wo, iters=10)
    report("conv3x3 64->3 @2160p", sec, gf_conv(4 * h, 4 * w, 64, 3))

    # --- pure matmul ceiling for comparison
    a = jnp.asarray(rng.rand(h * w, 576) - 0.5, dtype)
    b = jnp.asarray(rng.rand(576, 64) * 0.05, dtype)
    f = jax.jit(lambda p, q: jnp.dot(p, q, preferred_element_type=jnp.float32))
    sec = device_time(f, a, b, iters=10)
    report("matmul (HW,576)@(576,64)", sec, h * w * 576 * 64 * 2 / 1e9)
    a = jnp.asarray(rng.rand(h * w, 128) - 0.5, dtype)
    b = jnp.asarray(rng.rand(128, 128) * 0.05, dtype)
    sec = device_time(f, a, b, iters=10)
    report("matmul (HW,128)@(128,128)", sec, h * w * 128 * 128 * 2 / 1e9)
    a = jnp.asarray(rng.rand(h * w, 512) - 0.5, dtype)
    b = jnp.asarray(rng.rand(512, 512) * 0.05, dtype)
    sec = device_time(f, a, b, iters=10)
    report("matmul (HW,512)@(512,512)", sec, h * w * 512 * 512 * 2 / 1e9)


if __name__ == "__main__":
    main()
