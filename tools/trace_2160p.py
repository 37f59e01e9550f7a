"""Per-op device trace of the 2160p streaming chunk step (VERDICT r1 #7).

Runs the real StreamingSR chunk fn under jax.profiler and aggregates the
'XLA Ops' device timeline by op, printing the top costs per frame.

Usage: python tools/trace_2160p.py [H W chunk]
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root (run as a script)
from tecogan_tpu.config import TecoConfig
from tecogan_tpu.models import FNet, Generator
from tecogan_tpu.recurrent.inference import StreamingSR
from tecogan_tpu.recurrent.step import init_state


def main() -> None:
    h = int(sys.argv[1]) if len(sys.argv) > 1 else 540
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 960
    chunk = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    cfg = TecoConfig(num_resblock=16, compute_dtype="bfloat16",
                     infer_chunk=chunk)
    generator = Generator(num_resblock=cfg.num_resblock,
                          channels=cfg.gen_channels, dtype=jnp.bfloat16)
    fnet = FNet(channels=cfg.fnet_channels, up_channels=cfg.fnet_up_channels,
                max_velocity=cfg.flow_max_velocity, dtype=jnp.bfloat16)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    gp = generator.init(k1, jnp.zeros((1, h, w, 51)))["params"]
    fp = fnet.init(k2, jnp.zeros((1, h, w, 6)))["params"]
    sr = StreamingSR(cfg, gp, fp, output="uint8")
    fn = sr._build_chunk_fn()

    lr = jnp.asarray(np.random.RandomState(0).rand(chunk, 1, h, w, 3),
                     jnp.bfloat16)
    state = init_state(1, h, w, jnp.bfloat16)
    # Warm up (compile) outside the trace.
    state2, hr = fn(gp, fp, state, lr)
    float(jax.device_get(jnp.sum(hr.astype(jnp.float32))))

    jax.profiler.start_trace("/tmp/trace2160")
    state3, hr = fn(gp, fp, state2, lr)
    float(jax.device_get(jnp.sum(hr.astype(jnp.float32))))
    jax.profiler.stop_trace()

    path = sorted(glob.glob("/tmp/trace2160/plugins/profile/*/*.trace.json.gz"))[-1]
    with gzip.open(path) as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    # device pid: process named /device:TPU:*
    dev_pids = {e["pid"] for e in ev
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in str(e.get("args", {}).get("name", ""))}
    op_tids = {(e["pid"], e["tid"]) for e in ev
               if e.get("ph") == "M" and e.get("name") == "thread_name"
               and e.get("args", {}).get("name") == "XLA Ops"
               and e["pid"] in dev_pids}
    tot = collections.Counter()
    n = collections.Counter()
    for e in ev:
        if e.get("ph") == "X" and (e.get("pid"), e.get("tid")) in op_tids:
            # strip trailing .N indices to group repeated ops
            name = e["name"].rstrip("0123456789.")
            tot[name] += e.get("dur", 0)
            n[name] += 1
    total_us = sum(tot.values())
    print(f"device total: {total_us/1e3:.1f} ms for {chunk} frames "
          f"({total_us/1e3/chunk:.2f} ms/frame)")
    for name, us in tot.most_common(30):
        print(f"{us/1e3/chunk:8.3f} ms/frame  x{n[name]:<4d} {name[:100]}")


if __name__ == "__main__":
    main()
