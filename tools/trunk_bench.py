"""Banded pair-packed trunk vs XLA conv chain at 540x960 (VERDICT r1 #7).

Usage: python tools/trunk_bench.py
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root (run as a script)
import tecogan_tpu.kernels.resblocks as R
from tecogan_tpu.utils.profiling import device_time


def main() -> None:
    h, w, c, n = 540, 960, 64, 16
    dtype = jnp.bfloat16
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, h, w, c) - 0.5, dtype)
    w1 = jnp.asarray(rng.rand(n, 3, 3, c, c) * 0.05, dtype)
    b1 = jnp.asarray(rng.rand(n, c) * 0.01, dtype)
    w2 = jnp.asarray(rng.rand(n, 3, 3, c, c) * 0.05, dtype)
    b2 = jnp.asarray(rng.rand(n, c) * 0.01, dtype)
    gf = 32 * h * w * 9 * c * c * 2 / 1e9

    sec = device_time(jax.jit(R.resblock_chain_xla), x, w1, b1, w2, b2, iters=6)
    base = np.asarray(R.resblock_chain_xla(x, w1, b1, w2, b2), np.float32)
    print(f"XLA chain              : {sec*1e3:7.2f} ms  {gf/sec/1e3:5.1f} TF/s")

    for name, kw in [
        ("banded v1 270/full", dict(band_rows=270, chunk=0)),
        ("banded v1 270/4", dict(band_rows=270, chunk=4)),
        ("banded v1 270/2", dict(band_rows=270, chunk=2)),
        ("banded v1 135/4", dict(band_rows=135, chunk=4)),
        ("banded v2 135/4", dict(band_rows=135, chunk=4, use_v2=True)),
        ("banded v2 108/2", dict(band_rows=108, chunk=2, use_v2=True)),
    ]:
        f = jax.jit(lambda *a, kw=kw: R.resblock_chain_paired_banded(*a, **kw))
        try:
            got = np.asarray(f(x, w1, b1, w2, b2), np.float32)
            sec = device_time(f, x, w1, b1, w2, b2, iters=6)
        except Exception as e:  # noqa: BLE001
            print(f"{name:23s}: FAILED {type(e).__name__}: {str(e)[:100]}")
            continue
        diff = np.abs(got - base).max()
        print(f"{name:23s}: {sec*1e3:7.2f} ms  {gf/sec/1e3:5.1f} TF/s  "
              f"maxdiff {diff:.4f}")


if __name__ == "__main__":
    main()
