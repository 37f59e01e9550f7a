"""Run-case orchestration CLI (reference runGan.py).

    python -m tecogan_tpu.cli.run <case> [--root DIR] [options]

Cases mirror reference runGan.py:19-296:
  0  download pretrained models + Vid4/ToS test data (network-gated)
  1  inference on the test scenes with the pretrained model
  2  metric evaluation -> results/metric_log/metrics.csv
  3  full TecoGAN adversarial training
  4  FRVSR training

Training cases wrap the trainer in the same SIGINT-safe pattern as the
reference (runGan.py:237-244: Ctrl-C reaches the trainer, which saves a
final checkpoint) and prompt before reusing a non-empty output folder
(``folder_check``, runGan.py:25-39).
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

PRETRAINED_URLS = [
    # (url, unzip_dir) — reference runGan.py:41-65
    ("https://ge.in.tum.de/download/data/TecoGAN/model.zip", "model"),
    ("https://ge.in.tum.de/download/data/TecoGAN/vid3_LR.zip", "LR"),
    ("https://ge.in.tum.de/download/data/TecoGAN/tos_LR.zip", "LR"),
    ("https://ge.in.tum.de/download/data/TecoGAN/vid4_HR.zip", "HR"),
    ("https://ge.in.tum.de/download/data/TecoGAN/tos_HR.zip", "HR"),
]


def folder_check(path: str) -> str:
    """Prompt before writing into an existing non-empty folder
    (reference runGan.py:25-39)."""
    try_num = 1
    oripath = path.rstrip("/")
    while os.path.exists(path) and os.listdir(path):
        print(f"Delete {path} or Rename the folder")
        ans = input(f"Output folder {path} exists, keep using it? (y/n): ")
        if ans.lower().startswith("y"):
            return path
        path = f"{oripath}_{try_num}/"
        try_num += 1
    return path


def case0(root: str, allow_network: bool) -> None:
    """Download models + data; offline-safe (prints instructions instead)."""
    if not allow_network:
        print("Network downloads disabled (no egress in this environment).")
        print("To populate the data layout, fetch these into", root, ":")
        for url, d in PRETRAINED_URLS:
            print(f"  {url} -> unzip into {os.path.join(root, d)}/")
        print("Then convert the TF checkpoint for this framework:")
        print("  (with any TF install)")
        print("  reader = tf.train.load_checkpoint('model/TecoGAN')")
        print("  np.savez('model/TecoGAN.npz', **{n: reader.get_tensor(n)")
        print("      for n in reader.get_variable_to_shape_map()})")
        return
    for url, d in PRETRAINED_URLS:
        dest = os.path.join(root, d)
        os.makedirs(dest, exist_ok=True)
        zpath = os.path.join(dest, os.path.basename(url))
        subprocess.call(f"wget {url} -O {zpath}; unzip {zpath} -d {dest}; "
                        f"rm {zpath}", shell=True)


def case1(root: str, scenes, extra) -> None:
    dirstr = os.path.join(root, "results")
    os.makedirs(dirstr, exist_ok=True)
    model_npz = os.path.join(root, "model", "TecoGAN.npz")
    for scene in scenes:
        cmd = [
            sys.executable, "-m", "tecogan_tpu.cli.main",
            "--mode", "inference",
            "--output_dir", dirstr,
            "--summary_dir", os.path.join(dirstr, "log"),
            "--input_dir_LR", os.path.join(root, "LR", scene),
            "--output_pre", scene,
            "--output_name", "output",
            "--num_resblock", "16",
            "--output_ext", "png",
        ]
        if os.path.exists(model_npz):
            cmd += ["--tf_npz", model_npz]
        else:
            print(f"note: {model_npz} missing -> random-weight smoke run "
                  "(run case 0 for instructions)")
            cmd += ["--allow_random_weights"]
        cmd += extra
        subprocess.call(cmd)


def case2(root: str, scenes, extra) -> None:
    from tecogan_tpu.eval import default_lpips, evaluate_folders
    from tecogan_tpu.eval.suite import Tee

    dirstr = os.path.join(root, "results")
    out = os.path.join(dirstr, "metric_log")
    os.makedirs(out, exist_ok=True)
    sys.stdout = Tee(os.path.join(out, "metricsfile.txt"))
    evaluate_folders(
        [os.path.join(dirstr, s) for s in scenes],
        [os.path.join(root, "HR", s) for s in scenes],
        out,
        lpips_model=default_lpips(),
    )


def _train_case(root: str, preset: str, output_name: str, extra) -> None:
    train_dir = folder_check(os.path.join(root, output_name))
    cmd = [
        sys.executable, "-m", "tecogan_tpu.cli.main",
        "--mode", "train",
        "--preset", preset,
        "--output_dir", train_dir,
        "--summary_dir", os.path.join(train_dir, "log"),
        "--input_video_dir", os.path.join(root, "TrainingDataPath"),
    ] + extra
    try:
        subprocess.call(cmd)
    except KeyboardInterrupt:
        pass  # trainer saves its own final checkpoint (main.py:423-429)


def main(argv=None) -> None:
    p = argparse.ArgumentParser("tecogan_tpu.cli.run")
    p.add_argument("case", type=int, choices=[0, 1, 2, 3, 4])
    p.add_argument("--root", default=".", help="data/model/results root")
    p.add_argument("--scenes", default="calendar",
                   help="comma-separated test scene names")
    p.add_argument("--allow_network", action="store_true")
    args, extra = p.parse_known_args(argv)
    scenes = args.scenes.split(",")

    if args.case == 0:
        case0(args.root, args.allow_network)
    elif args.case == 1:
        case1(args.root, scenes, extra)
    elif args.case == 2:
        case2(args.root, scenes, extra)
    elif args.case == 3:
        _train_case(args.root, "tecogan", "ex_TecoGANmm-dd-hh", extra)
    elif args.case == 4:
        _train_case(args.root, "frvsr", "ex_FRVSRmm-dd-hh", extra)


if __name__ == "__main__":
    main()
