"""Inference-time frame loading (parity with reference dataloader.py:11-50).

- lists PNGs with numeric-aware sort
- optional HR->LR path: Gaussian blur (sigma 1.5) + 4x subsample when only an
  HR directory is given
- prepends reversed frames [5..1] as warm-up padding
"""

from __future__ import annotations

import os
from typing import List, NamedTuple, Optional

import numpy as np

from tecogan_tpu.ops.image import list_png_in_dir
from tecogan_tpu.recurrent.inference import prepend_warmup


class InferenceData(NamedTuple):
    paths_lr: List[str]
    inputs: np.ndarray  # (T, h, w, 3) float32 [0, 1], warm-up included


def load_inference_frames(
    input_dir_lr: Optional[str] = None,
    input_dir_hr: Optional[str] = None,
    max_frames: int = -1,
    warmup: bool = True,
) -> InferenceData:
    import cv2

    filedir, down_sp = input_dir_lr, False
    if filedir is None or not os.path.exists(filedir):
        if input_dir_hr is None or not os.path.exists(input_dir_hr):
            raise ValueError("Input directory not found")
        filedir, down_sp = input_dir_hr, True

    paths = list_png_in_dir(filedir, prefix_skip="\x00")  # no IB-skip here
    if max_frames > 0:
        paths = paths[:max_frames]

    def read(p):
        im = cv2.imread(p, 3).astype(np.float32)[:, :, ::-1]
        if down_sp:  # reference dataloader.py:34-36
            im = cv2.GaussianBlur(im, (0, 0), sigmaX=1.5)[::4, ::4, :]
        return im / 255.0

    frames = [read(p) for p in paths]
    if warmup:
        paths = prepend_warmup(paths)
        frames = prepend_warmup(frames)
    return InferenceData(paths_lr=paths, inputs=np.stack(frames))
