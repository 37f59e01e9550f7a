"""Generator-internal ablation at 2160p scale + phase-convT A/B (r1 #7).

Times pure-pytree replicas of Generator.apply at (1, 540, 960, 51) bf16:
  - baseline (lax.conv_transpose upsample, as the flax module compiles),
  - phase-decomposed convT (ops/convtran.py),
  - stage shares (trunk-only, no-output-conv, no-upsample).

Usage: python tools/gen_ablate.py [H W]
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root (run as a script)
from tecogan_tpu.config import TecoConfig
from tecogan_tpu.models import Generator
from tecogan_tpu.ops.convtran import conv_transpose_s2_phase
from tecogan_tpu.ops.resize import bicubic_four
from tecogan_tpu.ops.image import preprocess
from tecogan_tpu.utils.profiling import device_time


def main() -> None:
    h = int(sys.argv[1]) if len(sys.argv) > 1 else 540
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 960
    dtype = jnp.bfloat16
    n_res = 16

    gen = Generator(num_resblock=n_res, channels=64, dtype=dtype)
    p = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, h, w, 51)))["params"]
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, h, w, 51), dtype)

    def conv(pp, name, v, stride=1):
        k = pp[name]["kernel"].astype(v.dtype)
        out = jax.lax.conv_general_dilated(
            v, k, (stride, stride), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return out + pp[name]["bias"].astype(v.dtype)

    def build(upsample="xla", trunk=True, out_conv=True, fold=0):
        def apply(pp, v):
            lr = v[..., :3]
            net = jax.nn.relu(conv(pp, "input_stage_conv", v))
            if trunk:
                for i in range(1, n_res + 1):
                    skip = net
                    net = jax.nn.relu(conv(pp, f"resblock_{i}_conv_1", net))
                    net = conv(pp, f"resblock_{i}_conv_2", net)
                    net = net + skip
            for name in ("conv_tran1", "conv_tran2"):
                if upsample == "xla":
                    k = pp[name]["kernel"].astype(net.dtype)
                    net = jax.lax.conv_transpose(
                        net, k, (2, 2), "SAME",
                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                        transpose_kernel=True) + pp[name]["bias"].astype(net.dtype)
                elif upsample == "phase":
                    net = conv_transpose_s2_phase(
                        net, pp[name]["kernel"], pp[name]["bias"])
                else:  # cheap stub for share attribution
                    b_, hh, ww, cc = net.shape
                    net = jnp.repeat(jnp.repeat(net, 2, 1), 2, 2)
                net = jax.nn.relu(net)
            if out_conv and fold:
                kk = pp["output_stage_conv"]["kernel"].astype(net.dtype)
                kw = jnp.zeros((3, fold + 2, 64, fold * 3), net.dtype)
                for j in range(fold):
                    kw = kw.at[:, j:j + 3, :, j * 3:(j + 1) * 3].set(kk)
                bb, hh, ww, _ = net.shape
                out = jax.lax.conv_general_dilated(
                    net, kw, (1, fold),
                    ((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                net = out.reshape(bb, hh, ww, 3) + \
                    pp["output_stage_conv"]["bias"].astype(net.dtype)
            elif out_conv:
                net = conv(pp, "output_stage_conv", net)
            else:
                net = net[..., :3] * 1.0001
            net = net + bicubic_four(lr)
            return preprocess(net)
        return jax.jit(apply)

    base = device_time(build(), p, x, iters=8)
    print(f"baseline (XLA convT)      : {base*1e3:7.2f} ms")
    a = build()(p, x)
    for g in (8, 16, 32):
        fg = device_time(build(fold=g), p, x, iters=8)
        b = build(fold=g)(p, x)
        d = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
        print(f"folded outconv g={g:<3d}      : {fg*1e3:7.2f} ms  "
              f"(saves {base*1e3-fg*1e3:6.2f})  maxdiff {d:.5f}")


if __name__ == "__main__":
    main()
