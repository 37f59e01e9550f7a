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
       python tools/bench_serve.py coldstart [B H W]  (cold-attach-to-first-
         frame latency: lazy attach vs prewarm, across two processes sharing
         a fresh persistent compilation cache — run 2 shows the cache win)
Prints one JSON line (coldstart: one per process run).
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
from tecogan_tpu.utils.profiling import device_time_samples


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
    samples = sorted(device_time_samples(jax.jit(fan_out), states,
                                         iters=10, warmup=3, passes=3))
    secs = samples[len(samples) // 2]
    slots = sum(b for _, _, b in buckets)
    print(json.dumps({
        "metric": "serving_tick_mixed_geometry",
        "value": round(slots / secs, 1),
        "unit": "frames/sec/chip aggregate",
        "tick_ms": round(secs * 1e3, 2),
        "spread": {"passes": len(samples),
                   "tick_ms_min": round(samples[0] * 1e3, 2),
                   "tick_ms_max": round(samples[-1] * 1e3, 2)},
        "buckets": [f"{b}x {h}x{w}" for h, w, b in buckets],
    }))


def _coldstart_child(b: int, h: int, w: int) -> None:
    """One process's cold-attach measurement (VERDICT r3 #3).

    lazy_first_tick_s: MultiGeometryServer with NO prewarm — wall time of
    the first stream's first tick (XLA compile lands inside the tick).
    prewarm_s + warmed_first_tick_ms: a second, fresh server at the same
    geometry — the compile happens in prewarm(), off the serving path
    (within this process it may also hit the in-memory/persistent caches;
    the parent's second run shows the pure persistent-cache effect).
    """
    import time

    from tecogan_tpu.serve import MultiGeometryServer
    from tecogan_tpu.utils.compilation_cache import enable_persistent_cache

    enable_persistent_cache()
    cfg = TecoConfig(num_resblock=16, compute_dtype="bfloat16")
    dtype = jnp.dtype(cfg.compute_dtype)
    generator = Generator(num_resblock=cfg.num_resblock,
                          channels=cfg.gen_channels, dtype=dtype)
    fnet = FNet(channels=cfg.fnet_channels, up_channels=cfg.fnet_up_channels,
                max_velocity=cfg.flow_max_velocity, dtype=dtype)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    gp = generator.init(k1, jnp.zeros((1, h, w, 51)))["params"]
    fp = fnet.init(k2, jnp.zeros((1, h, w, 6)))["params"]
    frame = (np.random.RandomState(0).rand(h, w, 3) * 255).astype(np.uint8)

    lazy = MultiGeometryServer(cfg, gp, fp, slots_per_geometry=b)
    lazy.open("s0", h, w)
    t0 = time.perf_counter()
    lazy.step({"s0": frame}, fetch=True)
    lazy_first = time.perf_counter() - t0

    warm = MultiGeometryServer(cfg, gp, fp, slots_per_geometry=b)
    t0 = time.perf_counter()
    warm.prewarm([(h, w)])
    prewarm_s = time.perf_counter() - t0
    warm.open("s0", h, w)
    t0 = time.perf_counter()
    warm.step({"s0": frame}, fetch=True)
    warmed_first = time.perf_counter() - t0

    print(json.dumps({
        "metric": "serving_cold_attach",
        "value": round(lazy_first, 2),
        "unit": "s to first frame (lazy, compile in-tick)",
        "prewarm_s": round(prewarm_s, 2),
        "warmed_first_tick_ms": round(warmed_first * 1e3, 1),
        "slots": b, "geometry": f"{h}x{w}",
    }))


def main_coldstart(b: int, h: int, w: int) -> None:
    """Two child processes sharing a FRESH persistent compilation cache:
    run 1 pays the real XLA compiles (and writes the cache); run 2 is the
    restarted-server case — its 'compiles' deserialize from disk."""
    import subprocess
    import tempfile

    cache = tempfile.mkdtemp(prefix="teco_xla_cache_")
    env = dict(_os.environ, TECOGAN_COMPILE_CACHE_DIR=cache,
               TECO_COLDSTART_CHILD="1")
    for run in ("cold_cache", "warm_cache"):
        p = subprocess.run(
            [sys.executable, _os.path.abspath(__file__), "coldstart",
             str(b), str(h), str(w)],
            env=env, capture_output=True, text=True, timeout=1800)
        for line in p.stdout.splitlines():
            if '"serving_cold_attach"' in line:
                rec = json.loads(line)
                rec["run"] = run
                print(json.dumps(rec))
                break
        else:
            print(f"{run}: child failed rc={p.returncode}\n{p.stderr[-2000:]}")
            return


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "mixed":
        main_mixed()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "coldstart":
        b = int(sys.argv[2]) if len(sys.argv) > 2 else 4
        h = int(sys.argv[3]) if len(sys.argv) > 3 else 144
        w = int(sys.argv[4]) if len(sys.argv) > 4 else 180
        if _os.environ.get("TECO_COLDSTART_CHILD"):
            _coldstart_child(b, h, w)
        else:
            main_coldstart(b, h, w)
        return
    args = list(sys.argv[1:])
    fold = "auto"  # --fold on|patchify|off forces the s2d fold arm (A/B)
    if "--fold" in args:
        i = args.index("--fold")
        fold = args[i + 1]
        del args[i:i + 2]
    b = int(args[0]) if len(args) > 0 else 4
    h = int(args[1]) if len(args) > 1 else 144
    w = int(args[2]) if len(args) > 2 else 180

    cfg = TecoConfig(num_resblock=16, compute_dtype="bfloat16",
                     fold_input_s2d=fold)
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
    samples = sorted(device_time_samples(tick, state,
                                         iters=10, warmup=3, passes=3))
    secs = samples[len(samples) // 2]
    print(json.dumps({
        "metric": "serving_tick",
        "value": round(b / secs, 1),
        "unit": "frames/sec/chip aggregate",
        "tick_ms": round(secs * 1e3, 2),
        "spread": {"passes": len(samples),
                   "tick_ms_min": round(samples[0] * 1e3, 2),
                   "tick_ms_max": round(samples[-1] * 1e3, 2)},
        "slots": b,
        "geometry": f"{h}x{w}->{4*h}x{4*w}",
    }))


if __name__ == "__main__":
    main()
