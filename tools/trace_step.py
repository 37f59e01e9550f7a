"""Per-op device trace of any jitted step (streaming chunk or train step).

Aggregates the 'XLA Ops' device timeline by op name (excluding the outer
`while` wrappers, which double-count their children) and prints the top
costs with HLO metadata. This is the in-context ground truth — isolated
op benchmarks on this backend mislead badly (CLAUDE.md "Hard-won facts").

Usage:
  python tools/trace_step.py stream [H W chunk]   # StreamingSR chunk step
  python tools/trace_step.py train [frvsr|tecogan]
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


def _report(trace_dir: str, frames: int) -> None:
    path = sorted(glob.glob(
        f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))[-1]
    with gzip.open(path) as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    dev_pids = {e["pid"] for e in ev
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in str(e.get("args", {}).get("name", ""))}
    op_tids = {(e["pid"], e["tid"]) for e in ev
               if e.get("ph") == "M" and e.get("name") == "thread_name"
               and e.get("args", {}).get("name") == "XLA Ops"
               and e["pid"] in dev_pids}
    tot = collections.Counter()
    cnt = collections.Counter()
    meta = {}
    for e in ev:
        if e.get("ph") == "X" and (e.get("pid"), e.get("tid")) in op_tids:
            name = e["name"]
            if name.startswith("while"):
                continue
            tot[name] += e.get("dur", 0)
            cnt[name] += 1
            a = e.get("args", {})
            meta[name] = (a.get("tf_op") or a.get("long_name") or "")[:95]
    total_us = sum(tot.values())
    print(f"device total (excl. while wrappers): "
          f"{total_us / 1e3 / frames:.2f} ms/frame-or-step")
    # Per-stage shares (the structural-accounting view, BASELINE.md round 5).
    stages = collections.Counter()
    for name, us in tot.items():
        stages[_stage(name, meta[name])] += us
    print("per-stage:")
    for s, us in stages.most_common():
        print(f"{us / 1e3 / frames:8.3f} ms  {us / total_us * 100:5.1f}%  {s}")
    for name, us in tot.most_common(40):
        print(f"{us / 1e3 / frames:8.3f} x{cnt[name]:<4d} "
              f"{name[:42]:42s} {meta[name]}")


def _stage(name: str, op: str) -> str:
    """Classify an HLO op into a pipeline stage for share accounting.

    Handles both the flax-module scopes (``/Generator/...``, big-frame
    path) and the pytree fold fast path's bare scopes (``resblock_...``,
    ``patchify_s2d_conv``, ... — generator_apply_hr_input)."""
    if "/FNet/" in op:
        return "fnet"
    if "conv_tran" in op:
        return "gen_convT_tail"
    if "output_stage" in op:
        return "gen_output_stage"
    if "/Generator/" in op or "resblock_" in op or "input_stage" in op:
        return "gen_trunk"
    if "patchify_s2d_conv" in op or "fold_input" in op:
        return "s2d_fold"
    if ("while/body/closed_call/while/body" in op
            or "take_along_axis" in op):
        return "warp(gather)"
    if "custom-call" in name or "upsample" in op:
        return "flow_upsample(pallas)"
    return "other(quantize/carry/misc)"


def trace_stream(h: int, w: int, chunk: int) -> None:
    from tecogan_tpu.recurrent.inference import StreamingSR
    from tecogan_tpu.recurrent.step import init_state

    cfg = TecoConfig(num_resblock=16, compute_dtype="bfloat16",
                     infer_chunk=chunk)
    gen = Generator(num_resblock=16, channels=cfg.gen_channels,
                    dtype=jnp.bfloat16)
    fnet = FNet(channels=cfg.fnet_channels,
                up_channels=cfg.fnet_up_channels,
                max_velocity=cfg.flow_max_velocity, dtype=jnp.bfloat16)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    gp = gen.init(k1, jnp.zeros((1, h, w, 51)))["params"]
    fp = fnet.init(k2, jnp.zeros((1, h, w, 6)))["params"]
    sr = StreamingSR(cfg, gp, fp, output="uint8")
    fn = sr._build_chunk_fn()
    lr = jnp.asarray(np.random.RandomState(0).rand(chunk, 1, h, w, 3),
                     jnp.bfloat16)
    state = init_state(1, h, w, jnp.bfloat16)
    state, hr = fn(gp, fp, state, lr)
    float(jax.device_get(jnp.sum(hr.astype(jnp.float32))))
    jax.profiler.start_trace("/tmp/trace_step")
    state, hr = fn(gp, fp, state, lr)
    float(jax.device_get(jnp.sum(hr.astype(jnp.float32))))
    jax.profiler.stop_trace()
    _report("/tmp/trace_step", chunk)


def trace_train(mode: str, use_vgg: bool = False, use_fold=None) -> None:
    from tecogan_tpu.train.trainer import Trainer

    # use_fold=None traces the config default (train_fold_s2d="patchify").
    kw = {} if use_fold is None else {"train_fold_s2d": use_fold}
    cfg = TecoConfig(
        num_resblock=10 if mode == "frvsr" else 16,
        batch_size=4, crop_size=32, rnn_n=10, learning_rate=5e-5,
        ratio=-0.01 if mode == "frvsr" else 0.01,
        pingpong=mode != "frvsr",
        vgg_scaling=0.2 if use_vgg else -0.002,
        compute_dtype="bfloat16",
        **kw)
    vgg_params = None
    if use_vgg:  # random weights: identical FLOPs to the pretrained ones
        from tecogan_tpu.models.vgg19 import random_vgg19_params

        vgg_params = random_vgg19_params()
    trainer = Trainer(cfg, vgg_params=vgg_params)
    state = trainer.init_state(jax.random.PRNGKey(0))
    tar = cfg.hr_load_size
    batch = jnp.asarray(
        np.random.RandomState(0).rand(4, 10, tar, tar, 3), jnp.float32)
    state, m = trainer.train_step(state, batch)
    float(jax.device_get(list(m.values())[0]))
    jax.profiler.start_trace("/tmp/trace_step")
    state, m = trainer.train_step(state, batch)
    float(jax.device_get(list(m.values())[0]))
    jax.profiler.stop_trace()
    _report("/tmp/trace_step", 1)


if __name__ == "__main__":
    kind = sys.argv[1] if len(sys.argv) > 1 else "stream"
    if kind == "train":
        # Three traceable arms regardless of the config default (matches
        # bench_train.py's flag set): --fold = stride4 (known-negative),
        # --fold_patchify = patchify, --no_fold = packed s2d.
        trace_train(sys.argv[2] if len(sys.argv) > 2 else "tecogan",
                    use_vgg="--vgg" in sys.argv,
                    use_fold="patchify" if "--fold_patchify" in sys.argv
                    else True if "--fold" in sys.argv
                    else False if "--no_fold" in sys.argv else None)
    else:
        h = int(sys.argv[2]) if len(sys.argv) > 2 else 540
        w = int(sys.argv[3]) if len(sys.argv) > 3 else 960
        chunk = int(sys.argv[4]) if len(sys.argv) > 4 else 8
        trace_stream(h, w, chunk)
