"""Hardware validation of the serving surfaces end-to-end (VERDICT r3 #7).

Drives the REAL CLI entry points as subprocesses against the attached
device (no ad-hoc harness short-cuts):

  1. fixtures: one LR PNG directory (144x180) + one LR mp4 video
     (128x192) — two geometry buckets, mixed source kinds;
  2. ``cli.serve`` over both concurrently (MultiGeometryServer:
     per-geometry slot pools, incremental threaded decode, prewarm);
  3. ``cli.main --mode inference`` per source — the single-stream engine
     (reference main.py:253-270 role);
  4. pixel comparison of 2 vs 3 (uint8 max abs diff per stream — the
     masked batched tick and the chunk-scan must agree to quantization);
  5. ``cli.serve --export`` -> ``load_frame_step`` -> ticks on the same
     device, compared against the in-process jitted frame step.

Prints one JSON line. Weights: --allow_random_weights with the default
seed — deterministic across the subprocesses, and serving cost/numerics
are weight-independent.

Usage: python tools/validate_serve_hw.py [workdir] [--small]
(default workdir /tmp/serve_hw_val; --small = 2 resblocks, for a CPU
smoke of the harness itself before spending device time)
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import numpy as np

_sys_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _sys_root)


def _make_fixtures(root: str):
    import cv2

    rng = np.random.RandomState(7)
    png_dir = os.path.join(root, "LR", "scene_png")
    os.makedirs(png_dir)
    # Smooth moving-gradient frames (pure noise is hostile to the video
    # codec; smooth content keeps the mp4 decode deterministic-enough and
    # is what the serving path actually sees in production).
    def frame(h, w, t):
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        img = np.stack([
            127 + 120 * np.sin(0.05 * (xx + 3 * t)),
            127 + 120 * np.cos(0.04 * (yy - 2 * t)),
            127 + 120 * np.sin(0.03 * (xx + yy + 5 * t)),
        ], axis=-1)
        img += rng.rand(h, w, 3) * 8.0
        return np.clip(img, 0, 255).astype(np.uint8)

    n_png, n_vid = 12, 10
    for i in range(n_png):
        cv2.imwrite(os.path.join(png_dir, f"{i:04d}.png"), frame(144, 180, i))
    vid_path = os.path.join(root, "scene_vid.mp4")
    vw = cv2.VideoWriter(vid_path, cv2.VideoWriter_fourcc(*"mp4v"),
                         12.0, (192, 128))
    assert vw.isOpened(), "cv2 mp4v writer unavailable"
    for i in range(n_vid):
        vw.write(frame(128, 192, i))
    vw.release()
    return png_dir, vid_path, {"scene_png": n_png, "scene_vid": n_vid}


def _run(cmd, log):
    with open(log, "ab") as f:
        f.write((" ".join(cmd) + "\n").encode())
        subprocess.run(cmd, check=True, stdout=f, stderr=subprocess.STDOUT,
                       cwd=_sys_root, timeout=1200)


def main() -> None:
    import cv2

    argv = [a for a in sys.argv[1:] if a != "--small"]
    small = "--small" in sys.argv
    res_args = ["--num_resblock", "2"] if small else []
    root = argv[0] if argv else "/tmp/serve_hw_val"
    if os.path.exists(root):
        shutil.rmtree(root)
    os.makedirs(root)
    log = os.path.join(root, "driver.log")
    png_dir, vid_path, lengths = _make_fixtures(root)

    py = sys.executable
    serve_out = os.path.join(root, "served")
    _run([py, "-m", "tecogan_tpu.cli.serve",
          "--input_dirs", f"{png_dir},{vid_path}",
          "--output_dir", serve_out, "--max_streams", "2",
          "--allow_random_weights"] + res_args, log)

    single_out = os.path.join(root, "single")
    for name, src in (("scene_png", png_dir), ("scene_vid", vid_path)):
        src_flag = "--input_video" if os.path.isfile(src) else "--input_dir_LR"
        _run([py, "-m", "tecogan_tpu.cli.main", "--mode", "inference",
              src_flag, src, "--output_dir", single_out,
              "--output_pre", name, "--allow_random_weights"] + res_args, log)

    result = {"metric": "serve_hw_validation", "streams": {}}
    worst = 0
    for name, t in lengths.items():
        got_dir = os.path.join(serve_out, name)
        want_dir = os.path.join(single_out, name)
        got = sorted(os.listdir(got_dir))
        want = sorted(os.listdir(want_dir))
        assert got == want and len(got) == t, (name, len(got), t, len(want))
        diff = 0
        for f in got:
            a = cv2.imread(os.path.join(got_dir, f)).astype(int)
            b = cv2.imread(os.path.join(want_dir, f)).astype(int)
            diff = max(diff, int(np.max(np.abs(a - b))))
        result["streams"][name] = {"frames": t, "max_u8_diff": diff}
        worst = max(worst, diff)

    # 5. AOT artifact: export through the CLI, load + run on this device.
    art = os.path.join(root, "step.bin")
    _run([py, "-m", "tecogan_tpu.cli.serve", "--export", art,
          "--batch", "2", "--height", "144", "--width", "180",
          "--allow_random_weights"] + res_args, log)

    import jax
    import jax.numpy as jnp

    from tecogan_tpu.cli.serve import build_parser, config_from_args
    from tecogan_tpu.cli.main import load_inference_params
    from tecogan_tpu.models import FNet, Generator
    from tecogan_tpu.recurrent.step import init_state
    from tecogan_tpu.serve import load_frame_step
    from tecogan_tpu.serve.engine import build_frame_fn

    args = build_parser().parse_args(["--allow_random_weights"] + res_args)
    cfg = config_from_args(args)
    gp, fp, cfg = load_inference_params(args, cfg)
    dtype = jnp.dtype(cfg.compute_dtype)
    gen = Generator(num_resblock=cfg.num_resblock, channels=cfg.gen_channels,
                    dtype=dtype)
    fnet = FNet(channels=cfg.fnet_channels, up_channels=cfg.fnet_up_channels,
                max_velocity=cfg.flow_max_velocity, dtype=dtype)
    step = load_frame_step(art)
    ref = jax.jit(build_frame_fn(cfg, gen.apply, fnet.apply, output="uint8"))

    rng = np.random.RandomState(11)
    state_a = init_state(2, 144, 180, dtype)
    state_b = init_state(2, 144, 180, dtype)
    art_diff = 0
    for t in range(4):
        lr = jnp.asarray((rng.rand(2, 144, 180, 3) * 255).astype(np.uint8))
        state_a, hr_a = step(state_a, lr)
        state_b, hr_b = ref(gp, fp, state_b, lr)
        d = int(np.max(np.abs(np.asarray(hr_a).astype(int)
                              - np.asarray(hr_b).astype(int))))
        art_diff = max(art_diff, d)
    result["artifact"] = {
        "ticks": 4, "max_u8_diff_vs_live": art_diff,
        "bytes": os.path.getsize(art),
        "platform": jax.devices()[0].platform,
    }
    result["ok"] = bool(worst <= 2 and art_diff == 0)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
