"""In-scan A/B of headline-workload (144x180 -> 576x720) streaming variants.

Round-3 trace (`trace_step.py stream 144 180 23`): the 5.09 ms/frame step
is warp gather 0.77 + output conv 0.64 (N=3, 2.2 TF/s) + s2d transpose
0.49 + scan-xs squeeze copies 0.51 + trunk 0.93 + misc. Candidates:
fold the output conv columns (N=3 -> 3g), fold the s2d pack into a
stride-4 input conv, carry LR flow in the scan (16x smaller xs slices).

Isolated benches mislead on this backend (CLAUDE.md) — every variant here
is the REAL chunk step measured via StreamingSR.device_fps.

Usage: python tools/headline_ablate.py [reps] [--hw H W] [--chunk C] [variant ...]
(variant names filter the sweep; default = all. --hw re-targets the sweep
at another geometry, e.g. --hw 540 960 --chunk 12 for the 2160p config)
"""

from __future__ import annotations

import json
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tecogan_tpu.config import TecoConfig
from tecogan_tpu.models import FNet, Generator


def main() -> None:
    argv = _sys.argv[1:]
    reps = 5
    if argv and argv[0].isdigit():
        reps = int(argv[0])
        argv = argv[1:]
    from tecogan_tpu.models import layers
    from tecogan_tpu.recurrent.inference import StreamingSR

    h, w, frames_n, chunk = 144, 180, 46, 23
    if "--hw" in argv:
        i = argv.index("--hw")
        h, w = int(argv[i + 1]), int(argv[i + 2])
        del argv[i:i + 3]
    if "--chunk" in argv:
        i = argv.index("--chunk")
        chunk = int(argv[i + 1])
        del argv[i:i + 2]
        frames_n = 2 * chunk
    dtype = jnp.bfloat16
    base_cfg = TecoConfig(num_resblock=16, compute_dtype="bfloat16",
                          infer_chunk=chunk)
    gen = Generator(num_resblock=16, channels=64, dtype=dtype)
    fnet = FNet(channels=base_cfg.fnet_channels,
                up_channels=base_cfg.fnet_up_channels,
                max_velocity=base_cfg.flow_max_velocity, dtype=dtype)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    gp = gen.init(k1, jnp.zeros((1, h, w, 51)))["params"]
    fp = fnet.init(k2, jnp.zeros((1, h, w, 6)))["params"]
    frames = np.random.RandomState(0).rand(frames_n, h, w, 3).astype(np.float32)

    orig_thresh = layers._FOLD_THRESHOLD_PIXELS

    variants = {
        "base": dict(),
        "fold_out": dict(fold_thresh=0),
        "s2d_on": dict(fold_input_s2d="on"),
        "inline_flow": dict(inline_flow="on"),
        "fold_out+s2d": dict(fold_thresh=0, fold_input_s2d="on"),
        "fold_out+inline": dict(fold_thresh=0, inline_flow="on"),
        # Round-3b candidates: tap-packed small-frame output conv
        # (N=3 conv -> one K=64,N=27 matmul + 9 shifted adds) and the
        # patchify-conv s2d input stage (s2d on the MXU).
        "tappack_out": dict(outconv="tappack"),
        "patchify_in": dict(fold_input_s2d="patchify"),
        "tappack+patchify": dict(outconv="tappack",
                                 fold_input_s2d="patchify"),
        # Four-phase stride-2 convT (ops/convtran.py) for the upsample tail
        # (~0.45 ms/frame as lax.conv_transpose per trace_step).
        "phase_tran": dict(convtran="phase"),
        "tappack+phase": dict(outconv="tappack", convtran="phase"),
        # Pytree replica of the flax apply (generator_apply_plain) — the
        # carrier for the convT A/B on geometries where the folded-input
        # fast paths are off (2160p): the flax module pins
        # lax.conv_transpose, so "phase_tran" is a no-op there.
        "plain_tran": dict(gen_path="plain"),
        "plain+phase": dict(gen_path="plain", convtran="phase"),
    }
    unknown = [a for a in argv if a not in variants]
    if unknown:
        raise SystemExit(
            f"unknown variant(s) {unknown}; choose from {list(variants)}")
    if argv:
        variants = {k: variants[k] for k in argv}
    results = {}
    from tecogan_tpu.models import generator as gen_mod
    orig_outconv = layers._OUTCONV_SMALL_MODE
    orig_convtran = gen_mod._CONVTRAN_MODE
    for name, opts in variants.items():
        layers._FOLD_THRESHOLD_PIXELS = opts.pop("fold_thresh", orig_thresh)
        layers._OUTCONV_SMALL_MODE = opts.pop("outconv", orig_outconv)
        gen_mod._CONVTRAN_MODE = opts.pop("convtran", orig_convtran)
        gen_path = opts.pop("gen_path", "flax")
        cfg = base_cfg.replace(**opts) if opts else base_cfg
        try:
            sr = StreamingSR(cfg, gp, fp, output="uint8")
            if gen_path == "plain":
                def plain_apply(variables, xin):
                    return gen_mod.generator_apply_plain(
                        variables["params"], xin, num_resblock=16)
                sr._gen_apply = lambda: plain_apply
            fps = sr.device_fps(frames, reps=reps)
        except Exception as exc:  # keep sweeping
            fps = -1.0
            print(f"{name}: FAILED {exc}", flush=True)
        results[name] = round(fps, 1)
        print(f"{name}: {results[name]} fps", flush=True)
    layers._FOLD_THRESHOLD_PIXELS = orig_thresh
    layers._OUTCONV_SMALL_MODE = orig_outconv
    gen_mod._CONVTRAN_MODE = orig_convtran
    print(json.dumps(results))


if __name__ == "__main__":
    main()
