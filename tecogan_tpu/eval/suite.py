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


def evaluate_folders(
    result_dirs: Sequence[str],
    target_dirs: Sequence[str],
    output_dir: str,
    keys: Optional[List[str]] = None,
    lpips_model: Optional[LPIPS] = None,
    verbose: bool = True,
) -> Dict[str, float]:
    """Score each result folder against its target folder; write metrics.csv.

    Args:
      keys: subset of ["PSNR", "SSIM", "LPIPS", "tOF", "tLP100"]. LPIPS keys
        are dropped automatically when ``lpips_model`` is None.

    Returns:
      {"FrameAvg_<key>": value} overall averages (reference metrics.py:231-236).
    """
    import cv2

    keys = list(keys or ["PSNR", "SSIM", "LPIPS", "tOF", "tLP100"])
    if lpips_model is None:
        dropped = [k for k in keys if k in ("LPIPS", "tLP100")]
        if dropped and verbose:
            print(f"[eval] no LPIPS weights available; skipping {dropped}")
        keys = [k for k in keys if k not in ("LPIPS", "tLP100")]

    os.makedirs(output_dir, exist_ok=True)
    csv_path = os.path.join(output_dir, "metrics.csv")

    sum_dict = {"FrameAvg_" + k: 0.0 for k in keys}
    len_dict = {k: 0 for k in keys}
    avg_dict: Dict[str, list] = {"Avg_" + k: [] for k in keys}
    folder_dict = {"FolderAvg_" + k: 0.0 for k in keys}

    for folder_i, (res_dir, tar_dir) in enumerate(zip(result_dirs, target_dirs)):
        result = list_png_in_dir(res_dir)
        target = list_png_in_dir(tar_dir)
        image_no = len(target)  # reference metrics.py:129
        if len(result) < len(target):
            print(f"[eval] {res_dir}: {len(result)} frames vs "
                  f"{len(target)} targets; scoring the overlap")
            image_no = len(result)
        list_dict: Dict[str, list] = {k: [] for k in keys}

        pre_out_grey = pre_tar_grey = None
        pre_img0 = pre_img1 = None
        for i in range(CUTFR, image_no - CUTFR):
            output_img = cv2.imread(result[i])[:, :, ::-1]
            target_img = cv2.imread(target[i])[:, :, ::-1]
            msg = f"frame {i}, tar {target_img.shape}, out {output_img.shape}, "
            if (target_img.shape[0] < output_img.shape[0]) or (
                target_img.shape[1] < output_img.shape[1]
            ):  # target not divisible by 4 (reference metrics.py:139-140)
                output_img = output_img[: target_img.shape[0], : target_img.shape[1]]

            if "tOF" in keys:
                output_grey = cv2.cvtColor(output_img, cv2.COLOR_RGB2GRAY)
                target_grey = cv2.cvtColor(target_img, cv2.COLOR_RGB2GRAY)
                if i > CUTFR:
                    target_of = _farneback(pre_tar_grey, target_grey)
                    output_of = _farneback(pre_out_grey, output_grey)
                    target_of, _, _ = crop_8x8(target_of)
                    output_of, _, _ = crop_8x8(output_of)
                    of_diff = np.absolute(target_of - output_of)
                    of_diff = np.sqrt(np.sum(of_diff * of_diff, axis=-1))
                    list_dict["tOF"].append(of_diff.mean())
                    msg += "tOF %02.2f, " % list_dict["tOF"][-1]
                pre_out_grey, pre_tar_grey = output_grey, target_grey

            target_img, ofy, ofx = crop_8x8(target_img)
            output_img, ofy, ofx = crop_8x8(output_img)

            if "PSNR" in keys:
                list_dict["PSNR"].append(psnr(target_img, output_img))
                msg += "psnr %02.2f" % list_dict["PSNR"][-1]
            if "SSIM" in keys:
                list_dict["SSIM"].append(ssim(target_img, output_img))
                msg += ", ssim %02.2f" % list_dict["SSIM"][-1]

            if "LPIPS" in keys or "tLP100" in keys:
                img0 = LPIPS.im2tensor(target_img)
                img1 = LPIPS.im2tensor(output_img)
                if "LPIPS" in keys:
                    d01 = lpips_model(img0, img1)
                    list_dict["LPIPS"].append(float(d01[0]))
                    msg += ", lpips %02.2f" % d01[0]
                if "tLP100" in keys and i > CUTFR:
                    d0t = lpips_model(pre_img0, img0)
                    d1t = lpips_model(pre_img1, img1)
                    d01t = np.absolute(d0t - d1t) * 100.0
                    list_dict["tLP100"].append(float(d01t[0]))
                    msg += ", tLPx100 %02.2f" % d01t[0]
                pre_img0, pre_img1 = img0, img1

            msg += ", crop (%d, %d)" % (ofy, ofx)
            if verbose:
                print(msg)

        mode = "w" if folder_i == 0 else "a"
        pd_dict = {}
        for key in keys:
            col = f"{key}_%02d" % folder_i
            cur = np.float32(list_dict[key])
            pd_dict[col] = pd.Series(cur)
            mean = cur.sum() / cur.shape[0]
            if verbose:
                print("%s, max %02.4f, min %02.4f, avg %02.4f"
                      % (col, cur.max(), cur.min(), mean))
            avg_dict["Avg_" + key].append(mean)
            sum_dict["FrameAvg_" + key] += cur.sum()
            len_dict[key] += cur.shape[0]
            folder_dict["FolderAvg_" + key] += mean
        pd.DataFrame(pd_dict).to_csv(csv_path, mode=mode)

    folder_n = len(result_dirs)
    overall = {}
    for key in keys:
        sum_dict["FrameAvg_" + key] = pd.Series(
            [sum_dict["FrameAvg_" + key] / len_dict[key]]
        )
        folder_dict["FolderAvg_" + key] = pd.Series(
            [folder_dict["FolderAvg_" + key] / folder_n]
        )
        avg_dict["Avg_" + key] = pd.Series(np.float32(avg_dict["Avg_" + key]))
        overall["FrameAvg_" + key] = float(sum_dict["FrameAvg_" + key][0])
        if verbose:
            print("%s, total frame %d, total avg %02.4f, folder avg %02.4f"
                  % (key, len_dict[key], sum_dict["FrameAvg_" + key][0],
                     folder_dict["FolderAvg_" + key][0]))
    pd.DataFrame(avg_dict).to_csv(csv_path, mode="a")
    pd.DataFrame(folder_dict).to_csv(csv_path, mode="a")
    pd.DataFrame(sum_dict).to_csv(csv_path, mode="a")
    if verbose:
        print("Finished.")
    return overall


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
