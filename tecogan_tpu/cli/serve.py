"""Multi-stream serving CLI: N sequences through one batched server.

The reference's inference entry (main.py:253-270) and this repo's
``cli.main --mode inference`` each serve ONE sequence per process. This
driver runs several concurrently through
:class:`tecogan_tpu.serve.MultiGeometryServer` — one compiled masked step
per LR geometry bucket, streams admitted as slots free up (continuous
batching), per-stream PNG output via the background FrameWriter — and can
instead dump the AOT deployment artifact (serve/export.py).

Stream sources may be LR PNG directories OR video files (mp4/avi, decoded
via data/video_io.py), mixed freely and of DIFFERENT resolutions (each
geometry gets its own slot pool); ``--output_videos`` encodes each
stream's HR output as ``<name>.mp4`` instead of a PNG directory.

Usage:
  # serve: one output subdirectory (the input's basename) per stream
  python -m tecogan_tpu.cli.serve --input_dirs LR/calendar,clip.mp4 \\
      --output_dir results --tf_npz model/TecoGAN.npz --max_streams 4

  # export the serving step as a StableHLO artifact (params baked)
  python -m tecogan_tpu.cli.serve --export step.bin --batch 4 \\
      --height 144 --width 180 --tf_npz model/TecoGAN.npz
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

from tecogan_tpu.cli.main import load_inference_params
from tecogan_tpu.config import TecoConfig
from tecogan_tpu.data.inference import FrameWriter
from tecogan_tpu.recurrent.inference import WARMUP_FRAMES


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("tecogan_tpu.cli.serve")
    p.add_argument("--input_dirs", default=None,
                   help="comma-separated LR sources (PNG directory or video "
                        "file), one stream each")
    p.add_argument("--output_dir", default=None)
    p.add_argument("--output_name", default="output")
    p.add_argument("--output_videos", action="store_true",
                   help="encode each stream's HR output as <name>.mp4 "
                        "(source fps when known) instead of a PNG directory")
    p.add_argument("--max_streams", type=int, default=4,
                   help="slot-pool size PER GEOMETRY bucket: K distinct "
                        "input resolutions compile K programs and keep "
                        "K*max_streams resident state slots on the chip "
                        "(bounded by --state_budget_mb)")
    p.add_argument("--state_budget_mb", type=float, default=2048.0,
                   help="cap on total resident serving state across geometry "
                        "buckets; idle buckets are LRU-evicted to admit new "
                        "geometries and over-budget opens are refused with "
                        "the computed bytes instead of OOMing the chip "
                        "(<=0 disables)")
    p.add_argument("--max_frames", type=int, default=-1)
    p.add_argument("--lookahead", type=int, default=16,
                   help="per-stream decoded-frame buffer depth (host memory "
                        "is O(streams * lookahead); sources decode "
                        "incrementally on worker threads)")
    p.add_argument("--no_warmup", action="store_true",
                   help="skip the reversed-frame warm-up padding "
                        "(live-source semantics; reference dataloader.py:42-44 "
                        "pads offline sequences)")
    # weights (same sources as cli.main)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--tf_npz", default=None)
    p.add_argument("--params_npz", default=None)
    p.add_argument("--allow_random_weights", action="store_true")
    # model
    p.add_argument("--num_resblock", type=int, default=16)
    p.add_argument("--compute_dtype", default=None)
    p.add_argument("--rand_seed", type=int, default=1)
    # export mode
    p.add_argument("--export", default=None, metavar="PATH",
                   help="write the AOT StableHLO serving-step artifact and exit")
    p.add_argument("--batch", type=int, default=4, help="export batch size")
    p.add_argument("--height", type=int, default=144)
    p.add_argument("--width", type=int, default=180)
    return p


def config_from_args(args) -> TecoConfig:
    over = {"num_resblock": args.num_resblock, "rand_seed": args.rand_seed}
    if args.compute_dtype:
        over["compute_dtype"] = args.compute_dtype
    return TecoConfig().replace(**over)


def run_export(args, config) -> None:
    from tecogan_tpu.serve import export_frame_step, save_frame_step

    gen_params, fnet_params, config = load_inference_params(args, config)
    exp = export_frame_step(config, gen_params, fnet_params,
                            batch=args.batch, height=args.height,
                            width=args.width)
    save_frame_step(exp, args.export)
    size = os.path.getsize(args.export)
    print(f"Exported serving step ({args.batch}x{args.height}x{args.width}, "
          f"platforms {exp.platforms}) -> {args.export} ({size/1e6:.1f} MB)")


def run_serve(args, config) -> None:
    from tecogan_tpu.serve import MultiGeometryServer
    from tecogan_tpu.serve.sources import EOS, PENDING, FrameSource

    dirs = [d for d in args.input_dirs.split(",") if d]

    def stream_name(src: str) -> str:
        base = os.path.basename(os.path.normpath(src))
        return os.path.splitext(base)[0] if os.path.isfile(src) else base

    names = [stream_name(d) for d in dirs]
    if len(set(names)) != len(names):
        raise SystemExit("input_dirs basenames must be unique "
                         "(they name the output subdirectories)")
    warmup = 0 if args.no_warmup else WARMUP_FRAMES
    # Incremental decode (VERDICT r3 #5): each source feeds a bounded
    # lookahead queue from a worker thread — host memory stays
    # O(streams x lookahead) and serving starts on the first frame, not
    # after the slowest stream's full decode.
    sources = {
        name: FrameSource(d, lookahead=args.lookahead,
                          warmup=not args.no_warmup,
                          max_frames=args.max_frames)
        for d, name in zip(dirs, names)
    }

    gen_params, fnet_params, config = load_inference_params(args, config)
    # Streams of different LR geometries are served together: one slot pool
    # (one compiled step) per geometry, fanned out each tick.
    srv = MultiGeometryServer(config, gen_params, fnet_params,
                              slots_per_geometry=args.max_streams,
                              output="uint8",
                              state_budget_mb=(args.state_budget_mb
                                               if args.state_budget_mb > 0
                                               else None))

    pending = list(sources)     # admission queue (FIFO per geometry bucket)
    cursor = {n: 0 for n in sources}
    writers = {}
    warming = {}                # geometry -> background prewarm thread

    def close_all() -> dict:
        """Finalize every writer even if some fail (an unreleased cv2
        VideoWriter leaves the container without its index — ALL remaining
        streams would be unplayable, not just the failing one)."""
        done, errs = {}, []
        for n, wtr in writers.items():
            try:
                done[n] = wtr.close()
            except BaseException as exc:
                errs.append(exc)
        if errs:
            raise errs[0]
        return done

    t0 = time.perf_counter()
    ticks = frames_done = 0
    try:
        while pending or srv.open_streams:
            # Admit while slots are free (continuous batching): each
            # stream waits only on its own geometry's bucket, and a new
            # geometry compiles in the background (prewarm) while
            # already-warm buckets keep serving.
            for name in list(pending):
                src = sources[name]
                if not src.ready:
                    continue  # geometry unknown until the first frame
                h, w = src.geometry()
                geo = (h, w)
                th = warming.get(geo)
                if th is not None:
                    if th.is_alive():
                        continue
                    del warming[geo]
                    print(f"[serve] prewarmed {h}x{w} in "
                          f"{time.perf_counter() - th.t0:.1f}s")
                elif geo not in srv.geometries:
                    t_w = time.perf_counter()
                    warming[geo] = srv.prewarm([geo], background=True)
                    warming[geo].t0 = t_w
                    continue
                if srv.free_slots(h, w) <= 0:
                    continue
                pending.remove(name)
                srv.open(name, h, w)
                if args.output_videos:
                    from tecogan_tpu.data.video_io import VideoFrameWriter

                    writers[name] = VideoFrameWriter(
                        os.path.join(args.output_dir, f"{name}.mp4"),
                        fps=src.fps or 24.0, warmup=warmup)
                else:
                    writers[name] = FrameWriter(
                        os.path.join(args.output_dir, name),
                        name=args.output_name, warmup=warmup, num_threads=2)
                used = args.max_streams - srv.free_slots(h, w)
                print(f"[serve] +{name} ({h}x{w} bucket "
                      f"{used}/{args.max_streams} slots)")
            # Collect whatever each stream has decoded; a lagging source
            # just skips the tick (its slot state stays frozen).
            tick_frames = {}
            for name in srv.open_streams:
                f = sources[name].try_next()
                if f is PENDING:
                    continue
                if f is EOS:
                    srv.close(name)
                    print(f"[serve] -{name} done")
                    continue
                tick_frames[name] = f
            if not tick_frames:
                if pending or srv.open_streams:
                    time.sleep(0.002)  # decoders lagging; don't spin hot
                continue
            # fetch=False: HR downloads happen on the writer threads,
            # overlapped with the next tick's device compute.
            out = srv.step(tick_frames, fetch=False)
            ticks += 1
            for name, hr in out.items():
                idx = cursor[name]
                if idx >= warmup:  # drop warm-up (reference main.py:262-269)
                    writers[name].submit(hr[None], idx)
                    frames_done += 1
                cursor[name] += 1
    except BaseException:
        for src in sources.values():
            src.stop()
        for wtr in writers.values():  # finalize containers; original error wins
            try:
                wtr.close()
            except BaseException:
                pass
        raise
    secs = time.perf_counter() - t0
    written = close_all()
    print(f"total time {secs:.2f}, frame number {sum(written.values())}")
    print(f"{ticks} ticks, {frames_done/secs:.1f} frames/sec aggregate; "
          f"wrote {written}")


def main(argv=None) -> None:
    from tecogan_tpu.utils.compilation_cache import enable_persistent_cache

    enable_persistent_cache()
    args = build_parser().parse_args(argv)
    config = config_from_args(args)
    if args.export:
        run_export(args, config)
        return
    if not args.input_dirs or not args.output_dir:
        raise SystemExit("serving needs --input_dirs and --output_dir "
                         "(or use --export)")
    os.makedirs(args.output_dir, exist_ok=True)
    run_serve(args, config)


if __name__ == "__main__":
    main()
