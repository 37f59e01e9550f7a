"""Serving-step benchmark: VSRServer's masked batched tick on real hardware.

Times the compiled server step (reset/active masks, uint8 in/out) with all
operands device-resident, at the Vid4-calendar geometry (144x180 -> 576x720,
16 resblocks) for B slots. This is the per-tick device cost a co-located
serving host pays; aggregate fps = B / tick. Compare with bench.py's
``multi_stream_fps`` (the scan-batched offline engine, which amortizes fnet
over the chunk — the serving tick runs fnet per frame, so it is the upper
bound on the gap live serving pays for per-frame dispatch).

Usage: python tools/bench_serve.py [B] [H W]   (defaults 4 144 180)
       python tools/bench_serve.py mixed       (two-geometry fan-out tick:
         4x 144x180 + 2x 270x480 slots, the MultiGeometryServer dispatch
         pattern — both bucket steps issued back-to-back, one sync)
Prints one JSON line.
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
from tecogan_tpu.serve import VSRServer
from tecogan_tpu.utils.profiling import device_time


def make_server(cfg, h, w, b):
    dtype = jnp.dtype(cfg.compute_dtype)
    generator = Generator(num_resblock=cfg.num_resblock,
                          channels=cfg.gen_channels, dtype=dtype)
    fnet = FNet(channels=cfg.fnet_channels, up_channels=cfg.fnet_up_channels,
                max_velocity=cfg.flow_max_velocity, dtype=dtype)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    gp = generator.init(k1, jnp.zeros((1, h, w, 51)))["params"]
    fp = fnet.init(k2, jnp.zeros((1, h, w, 6)))["params"]
    return VSRServer(cfg, gp, fp, h, w, max_streams=b, output="uint8")


def main_mixed() -> None:
    """Two geometry buckets ticked back-to-back (async dispatch, one sync):
    the per-tick device cost MultiGeometryServer pays when both buckets
    received frames. Reported aggregate counts every slot of both."""
    cfg = TecoConfig(num_resblock=16, compute_dtype="bfloat16")
    buckets = [(144, 180, 4), (270, 480, 2)]
    rng = np.random.RandomState(0)
    ticks = []
    for h, w, b in buckets:
        srv = make_server(cfg, h, w, b)
        lr = jnp.asarray((rng.rand(b, h, w, 3) * 255).astype(np.uint8))
        reset = jnp.zeros((b,), bool)
        active = jnp.ones((b,), bool)
        step = jax.jit(lambda st, s=srv, lr=lr, r=reset, a=active:
                       s._step.__wrapped__(s.gen_params, s.fnet_params,
                                           st, lr, r, a))
        ticks.append((step, srv._state))

    def fan_out(states):
        outs = []
        new_states = []
        for (step, _), st in zip(ticks, states):
            ns, out = step(st)
            new_states.append(ns)
            outs.append(jnp.sum(out.astype(jnp.int32)))
        return new_states, sum(outs)

    states = [st for _, st in ticks]
    secs = device_time(jax.jit(fan_out), states, iters=20, warmup=3)
    slots = sum(b for _, _, b in buckets)
    print(json.dumps({
        "metric": "serving_tick_mixed_geometry",
        "value": round(slots / secs, 1),
        "unit": "frames/sec/chip aggregate",
        "tick_ms": round(secs * 1e3, 2),
        "buckets": [f"{b}x {h}x{w}" for h, w, b in buckets],
    }))


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "mixed":
        main_mixed()
        return
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 144
    w = int(sys.argv[3]) if len(sys.argv) > 3 else 180

    cfg = TecoConfig(num_resblock=16, compute_dtype="bfloat16")
    srv = make_server(cfg, h, w, b)
    rng = np.random.RandomState(0)
    lr = jnp.asarray((rng.rand(b, h, w, 3) * 255).astype(np.uint8))
    reset = jnp.zeros((b,), bool)
    active = jnp.ones((b,), bool)

    state = srv._state

    def tick(state):
        new_state, out = srv._step.__wrapped__(
            srv.gen_params, srv.fnet_params, state, lr, reset, active)
        return new_state, out

    tick = jax.jit(tick)  # no donation: reuse the same state arg across iters
    secs = device_time(tick, state, iters=20, warmup=3)
    print(json.dumps({
        "metric": "serving_tick",
        "value": round(b / secs, 1),
        "unit": "frames/sec/chip aggregate",
        "tick_ms": round(secs * 1e3, 2),
        "slots": b,
        "geometry": f"{h}x{w}->{4*h}x{4*w}",
    }))


if __name__ == "__main__":
    main()
