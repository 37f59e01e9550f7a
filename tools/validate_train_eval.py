"""Close the train->eval loop on hardware (VERDICT r4 #1).

The reference's entire purpose is producing a model that super-resolves
(reference runGan.py:247-296 trains, metrics.py:120-239 measures). This
harness proves the framework does the same end-to-end, with no network
access, via the REAL user-facing paths:

1. data:   `tecogan_tpu.data.prepare --synthetic` train scenes +
           held-out procedural eval scenes (different seeds).
2. train:  `tecogan_tpu.cli.run 4` (FRVSR, the canonical case-4 flow) to
           --train_iters, checkpointing every --save_freq.
3. infer:  `tecogan_tpu.cli.main --mode inference --input_dir_HR` (the
           reference's HR->LR Gaussian path, dataloader.py:34-36) for the
           trained checkpoint AND an untrained random init.
4. rows:   a bicubic_four baseline row rendered from the identical LR.
5. eval:   eval/suite.py PSNR/SSIM/tOF for all three rows -> one table.
6. gan:    `tecogan_tpu.cli.run 3` warm-started from the case-4 checkpoint
           for --gan_iters adversarial steps (TecoGAN-mini, random VGG
           weights: step dynamics are weight-independent) — the canonical
           chain (runGan.py:128-134,213-234).
7. ganinfer/ganeval: round-trip the case-3 checkpoint through the same
           inference path and merge a "gan" row into the report — proves
           a TecoGAN TrainState (gen+fnet+d+BN stats) serves like a
           case-4 one (reference main.py:221-245).

Usage:
    python tools/validate_train_eval.py --root /tmp/r5exp \
        --train_iters 10000 --gan_iters 300 [--phases data,train,...]

Writes <root>/train_eval_report.json and prints a markdown table for
BASELINE.md.
"""

import argparse
import glob
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TRAIN_SCENES = 12          # scene_2000..2011: 10 train + 2 validation
EVAL_SCENES = 3            # held-out, different seeds
EVAL_FRAMES = 40
H, W = 288, 352            # HR geometry (LR 72x88 after the /4 path)


def sh(cmd, log=None, env=None):
    print("+", " ".join(cmd), flush=True)
    e = dict(os.environ)
    if env:
        e.update(env)
    if log:
        with open(log, "a") as f:
            rc = subprocess.call(cmd, stdout=f, stderr=subprocess.STDOUT,
                                 env=e, cwd=REPO)
    else:
        rc = subprocess.call(cmd, env=e, cwd=REPO)
    if rc != 0:
        raise RuntimeError(f"rc={rc}: {' '.join(cmd)} (log: {log})")


def phase_data(root):
    train_dir = os.path.join(root, "TrainingDataPath")
    if not glob.glob(os.path.join(train_dir, "scene_*")):
        sh([sys.executable, "-m", "tecogan_tpu.data.prepare",
            "--synthetic", str(TRAIN_SCENES), "--output_dir", train_dir])
    # Held-out eval scenes: same generator, DISJOINT seeds (training scenes
    # use seed 0..TRAIN_SCENES-1; these use 500+).
    from tecogan_tpu.data.synthetic import write_synthetic_scenes

    hr = os.path.join(root, "HR")
    if not glob.glob(os.path.join(hr, "eval_*")):
        write_synthetic_scenes(hr, num_scenes=EVAL_SCENES,
                               num_frames=EVAL_FRAMES, height=H, width=W,
                               start_index=0, prefix="eval", seed=500)
    print("data ready:", train_dir, hr)


def phase_train(root, iters, save_freq, num_resblock, lr=2e-4,
                decay_step_frac=0.3):
    """Train FRVSR for ``iters`` steps with a budget-scaled lr schedule.

    The reference's canonical 5e-5-flat is tuned for a 500k-step run
    (runGan.py:255-266); at a 10k-step validation budget that schedule
    underfits (round-5a measured: plateaued ~0.35 content loss at the
    data floor). Scale it: start higher, exponential-decay (the same
    reference decay machinery, Teco.py:95-99) to ~lr/16 by the end.
    """
    flags = ["--max_iter", str(iters), "--str_dir", "2000",
             "--end_dir", "2010", "--end_dir_val", "2012",
             "--save_freq", str(save_freq), "--no_test_while_train",
             "--num_resblock", str(num_resblock),
             "--learning_rate", str(lr),
             "--decay_step", str(max(1, int(iters * decay_step_frac))),
             "--decay_rate", "0.5"]
    prior = sorted(glob.glob(os.path.join(root, "ex_FRVSR*")),
                   key=os.path.getmtime, reverse=True)
    if prior:
        # Resume path (e.g. after a tunnel hang): call the trainer directly
        # with the same output dir — the loop auto-resumes from the latest
        # checkpoint. cli.run's folder_check would prompt interactively.
        sh([sys.executable, "-m", "tecogan_tpu.cli.main", "--mode", "train",
            "--preset", "frvsr", "--output_dir", prior[0],
            "--summary_dir", os.path.join(prior[0], "log"),
            "--input_video_dir", os.path.join(root, "TrainingDataPath"),
            ] + flags, log=os.path.join(root, "train_case4.log"))
    else:
        sh([sys.executable, "-m", "tecogan_tpu.cli.run", "4",
            "--root", root] + flags,
           log=os.path.join(root, "train_case4.log"))


def ckpt_dir(root):
    cands = sorted(glob.glob(os.path.join(root, "ex_FRVSR*", "checkpoints")),
                   key=os.path.getmtime, reverse=True)
    if not cands:
        raise FileNotFoundError(f"no ex_FRVSR*/checkpoints under {root}")
    return cands[0]


def eval_scene_names(root):
    return sorted(os.path.basename(d)
                  for d in glob.glob(os.path.join(root, "HR", "eval_*")))


def phase_infer(root, num_resblock):
    # --num_resblock documents intent; cli.main now reconciles it against the
    # checkpoint tree (a 16-vs-10 mismatch once silently truncated the trunk
    # and scored the trained row 13 dB low).
    ck = ckpt_dir(root)
    for row, extra in (
        ("trained", ["--checkpoint", ck]),
        ("untrained", ["--allow_random_weights"]),
    ):
        out = os.path.join(root, f"results_{row}")
        for scene in eval_scene_names(root):
            done = os.path.join(out, scene)
            if os.path.isdir(done) and len(os.listdir(done)) >= EVAL_FRAMES:
                continue
            sh([sys.executable, "-m", "tecogan_tpu.cli.main",
                "--mode", "inference",
                "--input_dir_HR", os.path.join(root, "HR", scene),
                "--output_dir", out, "--output_pre", scene,
                "--num_resblock", str(num_resblock)] + extra,
               log=os.path.join(root, f"infer_{row}.log"))


def phase_bicubic(root):
    """The trivial baseline: bicubic_four (the generator's own skip
    upsampler, reference ops.py:166-212) on the SAME Gaussian-downsampled
    LR the model sees (reference dataloader.py:34-36)."""
    import cv2
    import numpy as np

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from tecogan_tpu.ops.resize import bicubic_four

    fn = jax.jit(lambda x: jnp.clip(bicubic_four(x), 0.0, 1.0))
    for scene in eval_scene_names(root):
        out = os.path.join(root, "results_bicubic", scene)
        os.makedirs(out, exist_ok=True)
        srcs = sorted(glob.glob(os.path.join(root, "HR", scene, "*.png")))
        if len(os.listdir(out)) >= len(srcs):
            continue
        for i, p in enumerate(srcs):
            im = cv2.imread(p, 3)[:, :, ::-1]
            lr = cv2.GaussianBlur(im.astype(np.float32), (0, 0),
                                  sigmaX=1.5)[::4, ::4, :] / 255.0
            hr = np.asarray(fn(lr[None]))[0]
            cv2.imwrite(os.path.join(out, f"output_{i:04d}.png"),
                        (hr[:, :, ::-1] * 255.0).round().astype(np.uint8))
    print("bicubic row rendered")


def phase_eval(root):
    from tecogan_tpu.eval.suite import evaluate_folders

    scenes = eval_scene_names(root)
    tars = [os.path.join(root, "HR", s) for s in scenes]
    report = {}
    for row in ("trained", "bicubic", "untrained"):
        res = [os.path.join(root, f"results_{row}", s) for s in scenes]
        out = os.path.join(root, f"metrics_{row}")
        report[row] = evaluate_folders(
            res, tars, out, keys=["PSNR", "SSIM", "tOF"], verbose=False)
        print(row, {k: round(v, 4) for k, v in report[row].items()})
    with open(os.path.join(root, "train_eval_report.json"), "w") as f:
        json.dump(report, f, indent=2)
    print("\n| row | PSNR (dB) | SSIM | tOF |")
    print("|---|---|---|---|")
    for row in ("trained", "bicubic", "untrained"):
        r = report[row]
        print(f"| {row} | {r['FrameAvg_PSNR']:.2f} | {r['FrameAvg_SSIM']:.4f}"
              f" | {r['FrameAvg_tOF']:.3f} |")
    margin = report["trained"]["FrameAvg_PSNR"] - report["bicubic"]["FrameAvg_PSNR"]
    print(f"\ntrained - bicubic PSNR margin: {margin:+.2f} dB")
    return report


def phase_gan(root, iters, num_resblock):
    """Warm-start TecoGAN-mini from the case-4 checkpoint (the canonical
    case-3 chain; --allow_random_weights supplies an untrained VGG — step
    dynamics and the D gate are weight-independent)."""
    flags = ["--allow_random_weights", "--max_iter", str(iters),
             "--num_resblock", str(num_resblock), "--str_dir", "2000",
             "--end_dir", "2010", "--end_dir_val", "2012",
             "--no_test_while_train"]
    prior = sorted(glob.glob(os.path.join(root, "ex_TecoGAN*")),
                   key=os.path.getmtime, reverse=True)
    if prior:
        # Resume after a hang: the trainer auto-resumes from the run's own
        # checkpoints; cli.run's folder_check would prompt interactively.
        sh([sys.executable, "-m", "tecogan_tpu.cli.main", "--mode", "train",
            "--preset", "tecogan", "--output_dir", prior[0],
            "--summary_dir", os.path.join(prior[0], "log"),
            "--input_video_dir", os.path.join(root, "TrainingDataPath"),
            ] + flags, log=os.path.join(root, "train_case3.log"))
    else:
        sh([sys.executable, "-m", "tecogan_tpu.cli.run", "3",
            "--root", root] + flags,
           log=os.path.join(root, "train_case3.log"))


def gan_ckpt_dir(root):
    cands = sorted(glob.glob(os.path.join(root, "ex_TecoGAN*", "checkpoints")),
                   key=os.path.getmtime, reverse=True)
    if not cands:
        raise FileNotFoundError(f"no ex_TecoGAN*/checkpoints under {root}")
    return cands[0]


def phase_ganinfer(root, num_resblock):
    """Round-trip the case-3 checkpoint through inference: proves a TecoGAN
    TrainState (gen+fnet+d+BN stats in the tree) restores through the same
    `cli.main --mode inference` path as a case-4 one (reference main.py:
    221-245 serves either checkpoint identically)."""
    ck = gan_ckpt_dir(root)
    out = os.path.join(root, "results_gan")
    for scene in eval_scene_names(root):
        done = os.path.join(out, scene)
        if os.path.isdir(done) and len(os.listdir(done)) >= EVAL_FRAMES:
            continue
        sh([sys.executable, "-m", "tecogan_tpu.cli.main",
            "--mode", "inference",
            "--input_dir_HR", os.path.join(root, "HR", scene),
            "--output_dir", out, "--output_pre", scene,
            "--num_resblock", str(num_resblock),
            "--checkpoint", ck],
           log=os.path.join(root, "infer_gan.log"))


def phase_ganeval(root):
    """Score the GAN-leg row and merge it into train_eval_report.json."""
    from tecogan_tpu.eval.suite import evaluate_folders

    scenes = eval_scene_names(root)
    tars = [os.path.join(root, "HR", s) for s in scenes]
    res = [os.path.join(root, "results_gan", s) for s in scenes]
    row = evaluate_folders(res, tars, os.path.join(root, "metrics_gan"),
                           keys=["PSNR", "SSIM", "tOF"], verbose=False)
    path = os.path.join(root, "train_eval_report.json")
    report = {}
    if os.path.exists(path):
        with open(path) as f:
            report = json.load(f)
    report["gan"] = row
    with open(path, "w") as f:
        json.dump(report, f, indent=2)
    print("\n| row | PSNR (dB) | SSIM | tOF |")
    print("|---|---|---|---|")
    for name in ("trained", "gan", "bicubic", "untrained"):
        if name not in report:
            continue
        r = report[name]
        print(f"| {name} | {r['FrameAvg_PSNR']:.2f} | {r['FrameAvg_SSIM']:.4f}"
              f" | {r['FrameAvg_tOF']:.3f} |")
    return report


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="/tmp/r5exp")
    p.add_argument("--train_iters", type=int, default=10000)
    p.add_argument("--gan_iters", type=int, default=300)
    p.add_argument("--save_freq", type=int, default=1000)
    p.add_argument("--num_resblock", type=int, default=10,
                   help="model depth for ALL phases (train/infer/gan must "
                        "agree; warm_start now errors on mismatch)")
    p.add_argument("--phases",
                   default="data,train,infer,bicubic,eval,gan,ganinfer,ganeval")
    args = p.parse_args()
    os.makedirs(args.root, exist_ok=True)
    phases = args.phases.split(",")
    if "data" in phases:
        phase_data(args.root)
    if "train" in phases:
        phase_train(args.root, args.train_iters, args.save_freq,
                    args.num_resblock)
    if "infer" in phases:
        phase_infer(args.root, args.num_resblock)
    if "bicubic" in phases:
        phase_bicubic(args.root)
    if "eval" in phases:
        phase_eval(args.root)
    if "gan" in phases:
        phase_gan(args.root, args.gan_iters, args.num_resblock)
    if "ganinfer" in phases:
        phase_ganinfer(args.root, args.num_resblock)
    if "ganeval" in phases:
        phase_ganeval(args.root)


if __name__ == "__main__":
    main()
