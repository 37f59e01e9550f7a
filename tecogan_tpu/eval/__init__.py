"""Evaluation suite: PSNR/SSIM/LPIPS/tOF/tLP100 with reference protocol
(reference metrics.py) and a JAX LPIPS (reference LPIPSmodels/)."""

from tecogan_tpu.eval.lpips import LPIPS, alexnet_features, lpips_distance
from tecogan_tpu.eval.quality import crop_8x8, psnr, rgb2ycbcr, ssim, ssim_y, to_uint8
from tecogan_tpu.eval.suite import Tee, default_lpips, evaluate_folders

__all__ = [
    "LPIPS", "alexnet_features", "lpips_distance",
    "crop_8x8", "psnr", "rgb2ycbcr", "ssim", "ssim_y", "to_uint8",
    "Tee", "default_lpips", "evaluate_folders",
]
