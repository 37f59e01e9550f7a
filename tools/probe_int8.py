"""Probe: does an int8 conv chain beat bf16 on this chip, in-scan?

Decides whether a quantized inference mode is worth building: times a
generator-shaped resblock conv chain (64ch 3x3 at LR 144x180, batch 1)
as bf16 vs int8xint8->int32 (v5e MXU lists 2x int8 peak), inside a
lax.scan like the real streaming step (isolated jits mislead; CLAUDE.md).

Usage: python tools/probe_int8.py [H W CH N_CONV]
"""

from __future__ import annotations

import json
import sys

import os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tecogan_tpu.utils.profiling import device_time


def chain(x, ks, acc_dtype):
    for k in ks:
        x = jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=acc_dtype)
        if acc_dtype == jnp.int32:
            # requantize: shift-scale back to int8 (what a real quantized
            # resblock would do; keeps the chain int8-in int8-out)
            x = jnp.clip(x >> 7, -128, 127).astype(jnp.int8)
        else:
            x = x.astype(jnp.bfloat16)
    return x


def bench(h, w, ch, n_conv, dtype, acc_dtype, steps=16):
    rng = np.random.RandomState(0)
    if dtype == jnp.int8:
        x = jnp.asarray(rng.randint(-128, 127, (1, h, w, ch)), jnp.int8)
        ks = [jnp.asarray(rng.randint(-16, 16, (3, 3, ch, ch)), jnp.int8)
              for _ in range(n_conv)]
    else:
        x = jnp.asarray(rng.rand(1, h, w, ch), dtype)
        ks = [jnp.asarray(rng.rand(3, 3, ch, ch) * 0.1, dtype)
              for _ in range(n_conv)]

    @jax.jit
    def run(x):
        def body(c, _):
            return chain(c, ks, acc_dtype), ()
        out, _ = jax.lax.scan(body, x, None, length=steps)
        return out

    secs = device_time(run, x, iters=5, warmup=2) / steps
    gflop = 2 * h * w * ch * ch * 9 * n_conv / 1e9
    return secs * 1e3, gflop / secs / 1e3


def main():
    h = int(sys.argv[1]) if len(sys.argv) > 1 else 144
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 180
    ch = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    n = int(sys.argv[4]) if len(sys.argv) > 4 else 16
    bf_ms, bf_tf = bench(h, w, ch, n, jnp.bfloat16, jnp.float32)
    i8_ms, i8_tf = bench(h, w, ch, n, jnp.int8, jnp.int32)
    print(json.dumps({
        "geometry": f"{h}x{w}x{ch} x{n}conv",
        "bf16_ms": round(bf_ms, 3), "bf16_tflops": round(bf_tf, 1),
        "int8_ms": round(i8_ms, 3), "int8_tops": round(i8_tf, 1),
        "speedup": round(bf_ms / i8_ms, 2),
    }))


if __name__ == "__main__":
    main()
