"""Inference / training entry point (reference main.py).

Flag names keep the reference's spelling where behavior matches
(``--mode``, ``--input_dir_LR``, ``--output_dir``, ``--num_resblock``,
``--rand_seed`` — reference main.py:30-105) so existing run recipes port
1:1; everything else rides the typed :class:`TecoConfig`.

Weight sources for inference, in precedence order:
  --checkpoint   orbax TrainState checkpoint dir written by our trainer
  --tf_npz       a TF TecoGAN/FRVSR checkpoint dumped to npz
                 (see train/checkpoint.py:convert_tf_npz)
  --params_npz   our own npz interchange (train/checkpoint.py:params_to_npz)
"""

from __future__ import annotations

import argparse
import os
import random

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("tecogan_tpu.cli.main")
    p.add_argument("--mode", required=True, choices=["inference", "train"])
    p.add_argument("--output_dir", required=True)
    p.add_argument("--summary_dir", default=None)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--tf_npz", default=None)
    p.add_argument("--params_npz", default=None)
    p.add_argument("--pre_trained_dir", default=None,
                   help="warm-start weights from a previous run's checkpoints")
    p.add_argument("--allow_random_weights", action="store_true",
                   help="smoke mode without pretrained weights (random "
                        "G/F for inference; random VGG19 for training "
                        "when --vgg_npz is absent)")
    # inference
    p.add_argument("--input_dir_LR", default=None)
    p.add_argument("--input_dir_HR", default=None)
    p.add_argument("--input_video", default=None,
                   help="decode LR frames straight from a video file "
                        "(mp4/avi/...) instead of a PNG directory")
    p.add_argument("--output_video", default=None,
                   help="encode HR output to this video file (.mp4/.avi; "
                        "relative paths land under --output_dir) instead "
                        "of per-frame images")
    p.add_argument("--output_video_fps", type=float, default=0.0,
                   help="HR video frame rate (default: source fps, else 24)")
    p.add_argument("--output_pre", default="",
                   help="subfolder of output_dir for this scene")
    p.add_argument("--output_name", default="output")
    p.add_argument("--output_ext", default="png")
    p.add_argument("--max_frames", type=int, default=-1)
    # model / train
    p.add_argument("--num_resblock", type=int, default=16)
    p.add_argument("--rand_seed", type=int, default=1)
    p.add_argument("--preset", default=None,
                   choices=[None, "frvsr", "tecogan", "mini"])
    p.add_argument("--input_video_dir", default="")
    p.add_argument("--vgg_npz", default=None,
                   help="VGG19 weights npz for the perceptual loss")
    p.add_argument("--max_iter", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--crop_size", type=int, default=None)
    p.add_argument("--learning_rate", type=float, default=None)
    p.add_argument("--decay_step", type=int, default=None,
                   help="lr exponential-decay step (reference main.py:61)")
    p.add_argument("--decay_rate", type=float, default=None,
                   help="lr exponential-decay rate (reference main.py:62)")
    p.add_argument("--stair", action="store_true", default=None,
                   help="staircase decay (reference main.py:87; the "
                        "canonical cases pass it, runGan.py:156,264 — the "
                        "frvsr/tecogan presets default it True)")
    p.add_argument("--ratio", type=float, default=None)
    p.add_argument("--vgg_scaling", type=float, default=None)
    p.add_argument("--str_dir", type=int, default=None)
    p.add_argument("--end_dir", type=int, default=None)
    p.add_argument("--end_dir_val", type=int, default=None)
    p.add_argument("--max_frm", type=int, default=None)
    p.add_argument("--rnn_n", type=int, default=None,
                   help="training unroll length (reference RNN_N, "
                        "main.py:101)")
    p.add_argument("--queue_thread", type=int, default=None)
    p.add_argument("--save_freq", type=int, default=None,
                   help="checkpoint every N steps (reference main.py:58)")
    p.add_argument("--summary_freq", type=int, default=None)
    p.add_argument("--display_freq", type=int, default=None)
    p.add_argument("--infer_chunk", type=int, default=None)
    p.add_argument("--spatial_shards", type=int, default=1,
                   help="shard frame height over N devices at inference "
                        "(GSPMD halo exchanges; for 2160p-class frames)")
    p.add_argument("--pipeline", action="store_true",
                   help="pipeline the flow stage onto a second device "
                        "(parallel/pipeline.py; needs >= 2 devices)")
    p.add_argument("--compute_dtype", default=None)
    p.add_argument("--no_mesh", action="store_true",
                   help="force single-device training")
    p.add_argument("--no_test_while_train", action="store_true")
    return p


def config_from_args(args) -> "TecoConfig":
    from tecogan_tpu.config import (
        FRVSR_PRESET, MINI_PRESET, TECOGAN_PRESET, TecoConfig,
    )

    base = {
        "frvsr": FRVSR_PRESET, "tecogan": TECOGAN_PRESET, "mini": MINI_PRESET,
    }.get(args.preset, TecoConfig())
    overrides = {}
    for field in ("num_resblock", "rand_seed", "input_video_dir", "max_iter",
                  "batch_size", "crop_size", "learning_rate", "decay_step",
                  "decay_rate", "stair", "ratio",
                  "vgg_scaling", "str_dir", "end_dir", "end_dir_val",
                  "max_frm", "rnn_n", "queue_thread", "infer_chunk",
                  "save_freq", "summary_freq", "display_freq",
                  "compute_dtype"):
        v = getattr(args, field)
        if v is not None and not (isinstance(v, str) and v == ""):
            overrides[field] = v
    return base.replace(**overrides)


def load_inference_params(args, config):
    """Resolve generator/fnet params from the configured weight source.

    Returns ``(gen_params, fnet_params, config)`` — the config comes back
    with ``num_resblock`` reconciled to the checkpoint: flax silently ignores
    extra param subtrees, so running a 16-resblock checkpoint through a
    10-resblock Generator used to truncate the trunk without a word.
    """
    import jax
    import jax.numpy as jnp

    from tecogan_tpu.models import FNet, Generator

    if args.checkpoint:
        import orbax.checkpoint as ocp

        from tecogan_tpu.train.checkpoint import _manager, detect_num_resblock

        mgr = _manager(args.checkpoint)
        step = mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"No checkpoint under {args.checkpoint}")
        raw = mgr.restore(step, args=ocp.args.StandardRestore(None))
        mgr.close()
        print(f"Loaded checkpoint step {step} from {args.checkpoint}")
        n_rb = detect_num_resblock(raw["gen_params"])
        if n_rb != config.num_resblock:
            print(f"NOTE: checkpoint has {n_rb} resblocks; overriding "
                  f"--num_resblock {config.num_resblock} (the checkpoint "
                  "defines the model)")
            config = config.replace(num_resblock=n_rb)
        return raw["gen_params"], raw["fnet_params"], config
    if args.tf_npz:
        from tecogan_tpu.train.checkpoint import (
            convert_tf_npz, detect_num_resblock)

        # Depth comes from the npz's own variable names — same
        # checkpoint-defines-the-model rule as the orbax path above (a
        # 10-block FRVSR npz under the default --num_resblock 16 used to
        # KeyError on resblock_11).
        trees = convert_tf_npz(args.tf_npz, num_resblock=None)
        n_rb = detect_num_resblock(trees["generator"])
        if n_rb != config.num_resblock:
            print(f"NOTE: {args.tf_npz} has {n_rb} resblocks; overriding "
                  f"--num_resblock {config.num_resblock} (the checkpoint "
                  "defines the model)")
            config = config.replace(num_resblock=n_rb)
        return trees["generator"], trees["fnet"], config
    if args.params_npz:
        from tecogan_tpu.train.checkpoint import npz_to_params

        gen = Generator(num_resblock=config.num_resblock,
                        channels=config.gen_channels)
        fnet = FNet(channels=config.fnet_channels,
                    up_channels=config.fnet_up_channels,
                    max_velocity=config.flow_max_velocity)
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        tmpl = {
            "generator": gen.init(k1, jnp.zeros((1, 32, 32, 51)))["params"],
            "fnet": fnet.init(k2, jnp.zeros((1, 32, 32, 6)))["params"],
        }
        trees = npz_to_params(args.params_npz, tmpl)
        return trees["generator"], trees["fnet"], config
    if args.allow_random_weights:
        print("WARNING: random weights (smoke mode, not a trained model)")
        gen = Generator(num_resblock=config.num_resblock,
                        channels=config.gen_channels)
        fnet = FNet(channels=config.fnet_channels,
                    up_channels=config.fnet_up_channels,
                    max_velocity=config.flow_max_velocity)
        k1, k2 = jax.random.split(jax.random.PRNGKey(config.rand_seed))
        return (
            gen.init(k1, jnp.zeros((1, 32, 32, 51)))["params"],
            fnet.init(k2, jnp.zeros((1, 32, 32, 6)))["params"],
            config,
        )
    raise SystemExit(
        "inference needs --checkpoint, --tf_npz, --params_npz, "
        "or --allow_random_weights"
    )


def run_inference(args, config) -> None:
    """Streaming inference over a PNG directory (reference main.py:180-270).

    Host I/O rides the native libpng thread pool end-to-end: frames decode
    in parallel up front, upload as uint8 (device-side normalize), and HR
    chunks are PNG-encoded on a background thread while the device computes
    the next chunk — the reference does all three serially on the session
    thread (main.py:253-270)."""
    from tecogan_tpu.data.inference import FrameWriter, load_inference_frames
    from tecogan_tpu.recurrent.inference import WARMUP_FRAMES, StreamingSR

    if args.pipeline and args.spatial_shards > 1:
        # Before the (potentially minutes-long) sequence decode.
        raise SystemExit(
            "--pipeline and --spatial_shards are mutually exclusive "
            "parallelism strategies; pass exactly one"
        )
    data = load_inference_frames(
        input_dir_lr=args.input_dir_LR,
        input_dir_hr=args.input_dir_HR,
        input_video=args.input_video,
        max_frames=args.max_frames,
        as_uint8=not args.pipeline,  # pipeline path consumes f32
    )
    gen_params, fnet_params, config = load_inference_params(args, config)
    out_dir = os.path.join(args.output_dir, args.output_pre)

    def video_writer(warmup: int):
        from tecogan_tpu.data.video_io import VideoFrameWriter

        path = args.output_video
        if not os.path.isabs(path):
            path = os.path.join(out_dir, path)
        fps = args.output_video_fps or data.fps or 24.0
        return VideoFrameWriter(path, fps=fps, warmup=warmup)

    if args.pipeline:
        from tecogan_tpu.parallel import PipelinedStreamingSR
        import cv2

        sr = PipelinedStreamingSR(config, gen_params, fnet_params,
                                  output="uint8")
        # Construct before the run: the writer validates the output
        # extension in __init__, failing fast instead of after compute.
        vw = video_writer(warmup=0) if args.output_video else None
        # as_uint8=False above: every load path returns float32 here.
        inputs = data.inputs
        hr, secs = sr.run(inputs, warmup=WARMUP_FRAMES)
        n = inputs.shape[0]
        print(f"total time {secs:.2f}, frame number {n}")  # main.py:270 format
        os.makedirs(out_dir, exist_ok=True)
        if vw is not None:
            vw.submit(np.ascontiguousarray(hr), 0)
            written = vw.close()
            print(f"Wrote {written} frames to {vw.path}")
            return
        for i in range(hr.shape[0]):
            cv2.imwrite(os.path.join(
                out_dir, f"{args.output_name}_{i:04d}.{args.output_ext}"),
                hr[i][:, :, ::-1])
        print(f"Wrote {hr.shape[0]} frames to {out_dir}")
        return

    spatial_mesh = None
    if args.spatial_shards > 1:
        from tecogan_tpu.parallel import make_mesh

        spatial_mesh = make_mesh({config.sp_axis: args.spatial_shards})
    sr = StreamingSR(config, gen_params, fnet_params, output="uint8",
                     spatial_mesh=spatial_mesh)
    if args.output_video:
        writer = video_writer(warmup=WARMUP_FRAMES)
        dest = writer.path
    else:
        writer = FrameWriter(out_dir, name=args.output_name,
                             ext=args.output_ext, warmup=WARMUP_FRAMES,
                             num_threads=config.queue_thread)
        dest = out_dir
    try:
        _, secs = sr.run(data.inputs, warmup=WARMUP_FRAMES,
                         on_chunk=writer.submit)
    finally:
        written = writer.close()
    n = data.inputs.shape[0]
    print(f"total time {secs:.2f}, frame number {n}")  # main.py:270 format
    print(f"Wrote {written} frames to {dest}")


def run_train(args, config) -> None:
    from tecogan_tpu.train.loop import train

    vgg_params = None
    if config.vgg_scaling > 0:
        if args.vgg_npz:
            from tecogan_tpu.models.vgg19 import load_vgg19_npz

            vgg_params = load_vgg19_npz(args.vgg_npz)
        elif args.allow_random_weights:
            # Full case-3 step shape without the (non-distributable)
            # vgg_19.ckpt: FLOPs and pipeline are weight-independent, the
            # perceptual term just isn't a trained perceptual metric.
            from tecogan_tpu.models.vgg19 import random_vgg19_params

            print("WARNING: random VGG19 weights (smoke mode — the "
                  "perceptual term is untrained; pass --vgg_npz for the "
                  "reference vgg_19.ckpt conversion)")
            vgg_params = random_vgg19_params(seed=config.rand_seed)
        else:
            raise SystemExit("--vgg_npz (or --allow_random_weights) "
                             "required when vgg_scaling > 0")
    train(
        config,
        output_dir=args.output_dir,
        summary_dir=args.summary_dir,
        vgg_params=vgg_params,
        pre_trained_dir=args.pre_trained_dir,
        use_mesh=not args.no_mesh,
        test_while_train=not args.no_test_while_train,
    )


def main(argv=None) -> None:
    from tecogan_tpu.utils.compilation_cache import enable_persistent_cache

    enable_persistent_cache()
    args = build_parser().parse_args(argv)
    config = config_from_args(args)

    # Seed everything seedable (reference main.py:15-19,109-113).
    random.seed(config.rand_seed)
    np.random.seed(config.rand_seed)

    os.makedirs(args.output_dir, exist_ok=True)
    log_dir = args.summary_dir or args.output_dir
    os.makedirs(log_dir, exist_ok=True)
    from tecogan_tpu.utils.logging import Tee

    tee = Tee(os.path.join(log_dir, "logfile.txt")).install()
    try:
        print("[Configurations]:")
        for k, v in sorted(vars(args).items()):
            print(f"\t{k}: {v}")
        print("End of configuration")
        if args.mode == "inference":
            run_inference(args, config)
        else:
            run_train(args, config)
    finally:
        tee.uninstall()


if __name__ == "__main__":
    main()
