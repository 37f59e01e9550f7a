"""The metric-evaluation suite: PSNR / SSIM / LPIPS / tOF / tLP100 -> CSV.

Protocol- and format-exact with the reference harness (reference
metrics.py:109-240): per result/target folder pair, frames
``[cutfr, N-cutfr)`` are scored; per-frame series are written to
``metrics.csv`` as ``<KEY>_<folder_idx>`` columns, followed by three summary
blocks ``Avg_*`` (per-folder means), ``FolderAvg_*`` (mean of folder means)
and ``FrameAvg_*`` (mean over all frames).

Temporal metrics:
- tOF = mean L2 norm of (Farneback_flow(GT pair) - Farneback_flow(out pair)),
  flows center-cropped by :func:`crop_8x8` (reference metrics.py:143-168);
  OpenCV's C++ Farneback runs on host — eval parity requires it exactly
  (SURVEY.md §2.2).
- tLP100 = |LPIPS(GT_{t-1}, GT_t) - LPIPS(out_{t-1}, out_t)| * 100
  (reference metrics.py:194-200), on the JAX LPIPS.
"""

from __future__ import annotations

import os
import sys
from typing import Dict, List, Optional, Sequence

import numpy as np
import pandas as pd

from tecogan_tpu.eval.lpips import LPIPS
from tecogan_tpu.eval.quality import crop_8x8, psnr, ssim
from tecogan_tpu.ops.image import list_png_in_dir

CUTFR = 2  # boundary frames skipped (reference metrics.py:117,135)

FARNEBACK_ARGS = dict(  # reference metrics.py:147-148
    pyr_scale=0.5, levels=3, winsize=15, iterations=3,
    poly_n=5, poly_sigma=1.2, flags=0,
)


class Tee:
    """stdout tee to a logfile (reference metrics.py:94-105, main.py:126-136)."""

    def __init__(self, path: str):
        self.terminal = sys.stdout
        self.log = open(path, "a")

    def write(self, message):
        self.terminal.write(message)
        self.log.write(message)

    def flush(self):
        self.terminal.flush()
        self.log.flush()


def _farneback(prev_grey: np.ndarray, grey: np.ndarray) -> np.ndarray:
    import cv2

    return cv2.calcOpticalFlowFarneback(prev_grey, grey, None, **FARNEBACK_ARGS)


def _score_folder(
    res_dir: str,
    tar_dir: str,
    keys: Sequence[str],
    lpips_model: Optional[LPIPS],
    verbose: bool,
) -> Dict[str, np.ndarray]:
    """Score one result/target folder pair.

    Returns {key: float32 array of per-frame values} for frames
    [CUTFR, N-CUTFR); temporal keys (tOF, tLP100) have one fewer entry.
    The per-frame log line matches the reference's byte-for-byte
    (reference metrics.py:133-172 protocol).
    """
    import cv2

    result = list_png_in_dir(res_dir)
    target = list_png_in_dir(tar_dir)
    image_no = len(target)  # reference metrics.py:129
    if len(result) < len(target):
        print(f"[eval] {res_dir}: {len(result)} frames vs "
              f"{len(target)} targets; scoring the overlap")
        image_no = len(result)

    values: Dict[str, list] = {k: [] for k in keys}
    # Temporal carries between consecutive frames.
    prev_grey = None      # (out_grey, tar_grey) for tOF
    prev_tensors = None   # (tar_tensor, out_tensor) for tLP100

    for i in range(CUTFR, image_no - CUTFR):
        output_img = cv2.imread(result[i])[:, :, ::-1]
        target_img = cv2.imread(target[i])[:, :, ::-1]
        parts = [f"frame {i}", f"tar {target_img.shape}",
                 f"out {output_img.shape}"]
        if (target_img.shape[0] < output_img.shape[0]) or (
            target_img.shape[1] < output_img.shape[1]
        ):  # target not divisible by 4 (reference metrics.py:139-140)
            output_img = output_img[: target_img.shape[0], : target_img.shape[1]]

        if "tOF" in keys:
            greys = (
                cv2.cvtColor(output_img, cv2.COLOR_RGB2GRAY),
                cv2.cvtColor(target_img, cv2.COLOR_RGB2GRAY),
            )
            if prev_grey is not None:
                output_of = _farneback(prev_grey[0], greys[0])
                target_of = _farneback(prev_grey[1], greys[1])
                of_diff = crop_8x8(target_of)[0] - crop_8x8(output_of)[0]
                tof = np.sqrt(np.sum(np.square(of_diff), axis=-1)).mean()
                values["tOF"].append(tof)
                parts.append("tOF %02.2f" % tof)
            prev_grey = greys

        target_img, ofy, ofx = crop_8x8(target_img)
        output_img, ofy, ofx = crop_8x8(output_img)

        if "PSNR" in keys:
            values["PSNR"].append(psnr(target_img, output_img))
            parts.append("psnr %02.2f" % values["PSNR"][-1])
        if "SSIM" in keys:
            values["SSIM"].append(ssim(target_img, output_img))
            parts.append("ssim %02.2f" % values["SSIM"][-1])

        if "LPIPS" in keys or "tLP100" in keys:
            tensors = (LPIPS.im2tensor(target_img), LPIPS.im2tensor(output_img))
            if "LPIPS" in keys:
                d01 = lpips_model(*tensors)
                values["LPIPS"].append(float(d01[0]))
                parts.append("lpips %02.2f" % d01[0])
            if "tLP100" in keys and prev_tensors is not None:
                d_tar = lpips_model(prev_tensors[0], tensors[0])
                d_out = lpips_model(prev_tensors[1], tensors[1])
                tlp = np.absolute(d_tar - d_out) * 100.0
                values["tLP100"].append(float(tlp[0]))
                parts.append("tLPx100 %02.2f" % tlp[0])
            prev_tensors = tensors

        parts.append("crop (%d, %d)" % (ofy, ofx))
        if verbose:
            print(", ".join(parts))

    return {k: np.float32(v) for k, v in values.items()}


def evaluate_folders(
    result_dirs: Sequence[str],
    target_dirs: Sequence[str],
    output_dir: str,
    keys: Optional[List[str]] = None,
    lpips_model: Optional[LPIPS] = None,
    verbose: bool = True,
) -> Dict[str, float]:
    """Score each result folder against its target folder; write metrics.csv.

    The CSV layout and stdout lines are byte-compatible with the reference
    harness (reference metrics.py:109-240): one per-frame column block per
    folder (``<KEY>_<idx>``), then ``Avg_*`` / ``FolderAvg_*`` /
    ``FrameAvg_*`` summary blocks.

    Args:
      keys: subset of ["PSNR", "SSIM", "LPIPS", "tOF", "tLP100"]. LPIPS keys
        are dropped automatically when ``lpips_model`` is None.

    Returns:
      {"FrameAvg_<key>": value} overall averages (reference metrics.py:231-236).
    """
    keys = list(keys or ["PSNR", "SSIM", "LPIPS", "tOF", "tLP100"])
    if lpips_model is None:
        dropped = [k for k in keys if k in ("LPIPS", "tLP100")]
        if dropped and verbose:
            print(f"[eval] no LPIPS weights available; skipping {dropped}")
        keys = [k for k in keys if k not in ("LPIPS", "tLP100")]

    os.makedirs(output_dir, exist_ok=True)
    csv_path = os.path.join(output_dir, "metrics.csv")

    # Per-folder value arrays, in folder order; summaries derive from this.
    folder_values: List[Dict[str, np.ndarray]] = []
    for folder_i, (res_dir, tar_dir) in enumerate(zip(result_dirs, target_dirs)):
        vals = _score_folder(res_dir, tar_dir, keys, lpips_model, verbose)
        folder_values.append(vals)
        block = {}
        for key in keys:
            col = f"{key}_%02d" % folder_i
            cur = vals[key]
            block[col] = pd.Series(cur)
            if verbose:
                print("%s, max %02.4f, min %02.4f, avg %02.4f"
                      % (col, cur.max(), cur.min(), cur.sum() / cur.shape[0]))
        # First folder starts the file; later blocks append (each block
        # carries its own header + index, the reference's csv shape).
        pd.DataFrame(block).to_csv(csv_path, mode="w" if folder_i == 0 else "a")

    # Summary statistics. Accumulation mirrors the reference numerically:
    # everything stays float32 (python-float starts are weak under NEP 50),
    # left-to-right in folder order.
    folder_means = {
        k: [v[k].sum() / v[k].shape[0] for v in folder_values] for k in keys
    }
    total_frames = {k: sum(v[k].shape[0] for v in folder_values) for k in keys}
    frame_avg = {
        k: sum((v[k].sum() for v in folder_values), 0.0) / total_frames[k]
        for k in keys
    }
    folder_avg = {
        k: sum(folder_means[k], 0.0) / len(result_dirs) for k in keys
    }

    if verbose:
        for key in keys:
            print("%s, total frame %d, total avg %02.4f, folder avg %02.4f"
                  % (key, total_frames[key], frame_avg[key], folder_avg[key]))

    pd.DataFrame(
        {"Avg_" + k: pd.Series(np.float32(folder_means[k])) for k in keys}
    ).to_csv(csv_path, mode="a")
    pd.DataFrame(
        {"FolderAvg_" + k: pd.Series([folder_avg[k]]) for k in keys}
    ).to_csv(csv_path, mode="a")
    pd.DataFrame(
        {"FrameAvg_" + k: pd.Series([frame_avg[k]]) for k in keys}
    ).to_csv(csv_path, mode="a")
    if verbose:
        print("Finished.")
    return {"FrameAvg_" + k: float(frame_avg[k]) for k in keys}


def default_lpips(reference_root: str = "/root/reference",
                  backbone_path: Optional[str] = None) -> Optional[LPIPS]:
    """Build the LPIPS evaluator if weights are reachable, else None.

    The 6 kB learned lin weights ship with the reference checkout; the
    AlexNet backbone (torchvision ImageNet weights, ~230 MB) must be
    supplied via ``backbone_path`` (.pth or .npz) or the
    ``TECOGAN_LPIPS_BACKBONE`` env var.
    """
    from tecogan_tpu.eval.lpips import (
        load_alexnet_npz, load_alexnet_pth, load_lin_weights_pth,
    )

    lin_path = os.path.join(reference_root, "LPIPSmodels", "v0.1", "alex.pth")
    backbone_path = backbone_path or os.environ.get("TECOGAN_LPIPS_BACKBONE")
    if not (backbone_path and os.path.exists(backbone_path)
            and os.path.exists(lin_path)):
        return None
    lin = load_lin_weights_pth(lin_path)
    if backbone_path.endswith(".npz"):
        alex = load_alexnet_npz(backbone_path)
    else:
        alex = load_alexnet_pth(backbone_path)
    return LPIPS(alex, lin)
