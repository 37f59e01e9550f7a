"""In-scan ablation of the 540p->2160p streaming step (VERDICT r1 #7).

Isolated per-op timings double-count work that XLA overlaps/fuses inside the
scan. This measures the *in-context* cost of each stage by timing chunk-scan
variants with one stage stubbed (data deps preserved so nothing dead-codes),
attributing cost as the delta vs the full step.

Usage: python tools/ablate_2160p.py [H W chunk]
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root (run as a script)
from tecogan_tpu.config import TecoConfig
from tecogan_tpu.models import FNet, Generator
from tecogan_tpu.ops import deprocess
from tecogan_tpu.ops.warp import warp_space_to_depth
from tecogan_tpu.recurrent.step import RecurrentState, init_state, upscale_flow


def main() -> None:
    h = int(sys.argv[1]) if len(sys.argv) > 1 else 540
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 960
    chunk = int(sys.argv[3]) if len(sys.argv) > 3 else 24
    dtype = jnp.bfloat16

    cfg = TecoConfig(num_resblock=16, compute_dtype="bfloat16")
    generator = Generator(num_resblock=cfg.num_resblock,
                          channels=cfg.gen_channels, dtype=dtype)
    fnet = FNet(channels=cfg.fnet_channels, up_channels=cfg.fnet_up_channels,
                max_velocity=cfg.flow_max_velocity, dtype=dtype)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    gen_params = generator.init(k1, jnp.zeros((1, h, w, 51)))["params"]
    fnet_params = fnet.init(k2, jnp.zeros((1, h, w, 6)))["params"]

    def build(no_fnet=False, no_flowup=False, no_warp=False, no_gen=False,
              no_quant=False):
        @jax.jit
        def run(gp, fp, state, lr_chunk):
            t, b, hh, ww, c = lr_chunk.shape
            prev = jnp.concatenate([state.prev_lr[None], lr_chunk[:-1]], 0)
            pairs = jnp.concatenate([prev, lr_chunk], -1)
            if no_fnet:
                # keep a data dep on the pairs without the conv stack
                flow_lr = jnp.mean(pairs, axis=-1, keepdims=True) * jnp.ones(
                    (1, 1, 1, 2), dtype)
                flow_lr = flow_lr.reshape(t * b, hh, ww, 2) * 0.05
            else:
                flow_lr = fnet.apply({"params": fp},
                                     pairs.reshape(t * b, hh, ww, 2 * c))
            if no_flowup:
                flow_hr = jnp.zeros((t, b, 4 * hh, 4 * ww, 2), dtype)
                flow_hr = flow_hr + jnp.mean(flow_lr).astype(dtype) * 0.1
            else:
                flow_hr = upscale_flow(flow_lr, hh, ww)
                flow_hr = flow_hr.reshape(t, b, 4 * hh, 4 * ww, 2)

            def body(st, xs):
                lr, flow = xs
                if no_warp:
                    hr4 = st.prev_hr
                    bsz, hr_h, hr_w, cc = hr4.shape
                    packed = (hr4 + jnp.mean(flow) * 0).reshape(
                        bsz, hr_h // 4, 4, hr_w // 4, 4, cc
                    ).transpose(0, 1, 3, 2, 4, 5).reshape(
                        bsz, hr_h // 4, hr_w // 4, 48)
                else:
                    packed = warp_space_to_depth(st.prev_hr, flow, 4)
                if no_gen:
                    gen_out = jnp.concatenate(
                        [packed[..., :3]] * 16, -1)[..., :3]
                    gen_out = jnp.repeat(jnp.repeat(
                        gen_out + jnp.mean(lr) * 0, 4, 1), 4, 2)
                else:
                    gen_out = generator.apply(
                        {"params": gp}, jnp.concatenate([lr, packed], -1))
                hr = deprocess(gen_out)
                st = RecurrentState(prev_lr=lr, prev_hr=hr)
                if no_quant:
                    out = hr
                else:
                    out = jnp.clip(hr.astype(jnp.float32) * 255.0,
                                   0, 255).astype(jnp.uint8)
                return st, jnp.sum(out.astype(jnp.float32))

            state, s = jax.lax.scan(body, state, (lr_chunk, flow_hr))
            return state, jnp.sum(s)
        return run

    rng = np.random.RandomState(0)
    lr = jnp.asarray(rng.rand(chunk, 1, h, w, 3), dtype)

    def timeit(runfn):
        state = init_state(1, h, w, dtype)
        c = runfn.lower(gen_params, fnet_params, state, lr).compile()
        for _ in range(2):
            state, s = c(gen_params, fnet_params, state, lr)
            float(jax.device_get(s))
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            state, s = c(gen_params, fnet_params, state, lr)
        float(jax.device_get(s))
        return (time.perf_counter() - t0) / reps / chunk * 1e3

    full = timeit(build())
    print(f"full step      : {full:7.2f} ms/frame")
    for name, kw in [("no warp", dict(no_warp=True)),
                     ("no generator", dict(no_gen=True)),
                     ("no fnet", dict(no_fnet=True)),
                     ("no flow-up", dict(no_flowup=True)),
                     ("no quant", dict(no_quant=True))]:
        ms = timeit(build(**kw))
        print(f"{name:15s}: {ms:7.2f} ms/frame  (stage in-scan ~{full - ms:6.2f} ms)")


if __name__ == "__main__":
    main()
