"""Headline benchmark: streaming 4x VSR throughput, Vid4-calendar protocol.

Workload: 46 LR frames (41 + 5 warm-up, reference dataloader.py:42-44) at
144x180 -> 576x720 HR through the flagship 16-resblock TecoGAN generator +
FNet — the reference's inference hot loop (main.py:253-270).

Headline metric: sustained **device streaming throughput** (frames/sec/chip)
of the recurrent per-frame step — fnet -> flow upscale -> dense warp ->
space-to-depth -> generator — with the recurrent state resident in HBM.
This is the hardware-comparable number: the reference's printed "total time"
(main.py:256-270) measures the same loop on a local GPU where PCIe transfer
is negligible, whereas this harness reaches its TPU through a low-bandwidth
tunnel, so an end-to-end wall figure here measures the tunnel, not the chip.
The end-to-end number (host float32 in -> uint8 PNG-ready out, transfers
included) is still reported as ``host_io_fps`` for transparency.

`vs_baseline` divides by REF_GPU_FPS, the working estimate for the TF1
single-GPU reference on this workload (the repo publishes no numbers,
BASELINE.md) — hence ``vs_baseline_estimated: true``. The hardware-absolute
numbers that need no estimate are also emitted: ``model_gflops_per_frame``
(XLA cost analysis of the per-frame step), ``achieved_tflops`` and ``mfu``
(vs the v5e bf16 peak). North star: vs_baseline >= 10 (BASELINE.json).

Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os

import numpy as np

REF_GPU_FPS = 10.0  # assumed TF1-GPU reference on Vid4 calendar (BASELINE.md)
V5E_PEAK_BF16_TFLOPS = 197.0  # per-chip bf16 systolic peak (public v5e spec)

FRAMES, H, W = 41, 144, 180
WARMUP = 5




def main() -> None:
    import jax
    import jax.numpy as jnp

    from tecogan_tpu.config import TecoConfig
    from tecogan_tpu.models import FNet, Generator
    from tecogan_tpu.recurrent.inference import StreamingSR

    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")
    cfg = TecoConfig(num_resblock=16, compute_dtype=dtype, infer_chunk=23)

    generator = Generator(num_resblock=cfg.num_resblock, channels=cfg.gen_channels,
                          dtype=jnp.dtype(dtype))
    fnet = FNet(channels=cfg.fnet_channels, up_channels=cfg.fnet_up_channels,
                max_velocity=cfg.flow_max_velocity, dtype=jnp.dtype(dtype))
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    gen_params = generator.init(k1, jnp.zeros((1, H, W, 51)))["params"]
    fnet_params = fnet.init(k2, jnp.zeros((1, H, W, 6)))["params"]

    rng = np.random.RandomState(0)
    frames = rng.rand(FRAMES + WARMUP, H, W, 3).astype(np.float32)

    sr = StreamingSR(cfg, gen_params, fnet_params, output="uint8")

    # Median of >= 3 synced passes + min/max spread (VERDICT r3 #6): the
    # tunnel adds run-to-run variance a single number cannot attribute.
    fps_samples = sorted(sr.device_fps_samples(frames, reps=3, passes=5))
    device_fps = float(np.median(fps_samples))

    # Hardware-absolute accounting: XLA's own FLOP count for one recurrent
    # frame step (fnet -> flow upscale -> warp -> generator), batch 1.
    try:
        from tecogan_tpu.recurrent.step import frame_step, init_state

        def one_frame(gp, fp, state, lr):
            return frame_step(generator.apply, fnet.apply, gp, fp, state, lr)

        st = init_state(1, H, W, jnp.dtype(dtype))
        lr1 = jnp.zeros((1, H, W, 3), jnp.dtype(dtype))
        cost = jax.jit(one_frame).lower(
            gen_params, fnet_params, st, lr1).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        gflops_per_frame = float(cost.get("flops", 0.0)) / 1e9
    except Exception:
        gflops_per_frame = -1.0
    achieved_tflops = device_fps * gflops_per_frame / 1e3 if gflops_per_frame > 0 else -1.0
    mfu = achieved_tflops / V5E_PEAK_BF16_TFLOPS if achieved_tflops > 0 else -1.0

    # Aggregate throughput over 4/8 concurrent streams (multi-stream serving;
    # no reference analog — the reference is strictly single-stream). The chip
    # saturates near single-stream throughput: warp is gather-index-rate-bound
    # (scales linearly with B) and the generator reaches its K=576/N=64 conv
    # ceiling by B=4 — see BASELINE.md "multi-stream saturation".
    # Secondary measurements must never sink the headline metric.
    try:
        streams = np.stack([frames] * 4)
        sr4 = StreamingSR(cfg, gen_params, fnet_params, output="uint8")
        multi_fps = float(np.median(
            sr4.device_fps_batched_samples(streams, reps=2, passes=3)))
    except Exception:
        multi_fps = -1.0
    try:
        streams8 = np.stack([frames] * 8)
        sr8 = StreamingSR(cfg, gen_params, fnet_params, output="uint8")
        multi_fps8 = float(np.median(
            sr8.device_fps_batched_samples(streams8, reps=2, passes=3)))
    except Exception:
        multi_fps8 = -1.0

    # End-to-end: host uint8 in (device-side normalize, the cli.main path)
    # -> device -> uint8 out, transfers included. NOTE on this harness the
    # number measures the TUNNEL, not the host or chip: 1.24 MB/frame of
    # uint8 HR downloads over the ~18 MB/s link caps it at ~14 fps
    # regardless of compute or PNG speed (BASELINE.md "host I/O").
    frames_u8 = (frames * 255).astype(np.uint8)
    try:
        sr.run(frames_u8, warmup=WARMUP)  # compile + backend warm-up
        host_fps = 0.0
        for _ in range(3):
            hr, secs = sr.run(frames_u8, warmup=WARMUP)
            host_fps = max(host_fps, (FRAMES + WARMUP) / secs)
        assert hr.shape == (FRAMES, 4 * H, 4 * W, 3) and hr.dtype == np.uint8
    except Exception:
        host_fps = -1.0

    # Host PNG I/O throughput alone (native libpng pool): decode the LR
    # sequence + encode the HR sequence, no device involved — the pure host
    # cost the pipeline overlaps with compute (data/inference.py). This is
    # the number that shows host I/O no longer binds on a co-located host.
    try:
        import shutil
        import tempfile
        import time as _time

        from tecogan_tpu.data.native_loader import NativeFrameIO

        io = None
        d = tempfile.mkdtemp()
        try:
            io = NativeFrameIO(8)
            lr_paths = [os.path.join(d, f"lr_{i:04d}.png")
                        for i in range(FRAMES + WARMUP)]
            io.encode_frames(lr_paths, frames_u8)
            hr_u8 = hr if isinstance(hr, np.ndarray) else np.zeros(
                (FRAMES, 4 * H, 4 * W, 3), np.uint8)
            hr_paths = [os.path.join(d, f"hr_{i:04d}.png")
                        for i in range(hr_u8.shape[0])]
            t0 = _time.perf_counter()
            io.decode_frames(lr_paths)
            io.encode_frames(hr_paths, hr_u8)
            png_secs = _time.perf_counter() - t0
            host_png_fps = FRAMES / png_secs
        finally:
            if io is not None:
                io.close()
            shutil.rmtree(d, ignore_errors=True)
    except Exception:
        host_png_fps = -1.0

    print(json.dumps({
        "metric": "vid4_calendar_4x_streaming",
        "value": round(device_fps, 1),
        "unit": "frames/sec/chip",
        "spread": {"passes": len(fps_samples),
                   "min": round(fps_samples[0], 1),
                   "max": round(fps_samples[-1], 1)},
        "vs_baseline": round(device_fps / REF_GPU_FPS, 2),
        "vs_baseline_estimated": True,  # REF_GPU_FPS is assumed (BASELINE.md)
        "model_gflops_per_frame": round(gflops_per_frame, 1),
        "achieved_tflops": round(achieved_tflops, 2),
        "mfu": round(mfu, 4),
        "host_io_fps": round(host_fps, 1),
        "host_png_fps": round(host_png_fps, 1),
        "multi_stream_fps": round(multi_fps, 1),
        "multi_stream_fps_b8": round(multi_fps8, 1),
        "dtype": dtype,
    }))


if __name__ == "__main__":
    main()
