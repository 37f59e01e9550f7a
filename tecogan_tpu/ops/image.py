"""Value-range transforms and host-side image I/O helpers.

Mirrors reference lib/ops.py:13-32 (preprocess/deprocess) and :521-523
(save_img) plus the BT.601 luma transform used by the metric suite
(reference metrics.py:37-70).
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np


def preprocess(image):
    """[0, 1] -> [-1, 1] (reference lib/ops.py:13-16)."""
    return image * 2 - 1


def deprocess(image):
    """[-1, 1] -> [0, 1] (reference lib/ops.py:19-22)."""
    return (image + 1) / 2


# BT.601 RGB->YCbCr matrix used by the eval protocol (reference metrics.py:42-44).
_YCBCR_T = np.array(
    [
        [0.256788235294118, 0.504129411764706, 0.097905882352941],
        [-0.148223529411765, -0.290992156862745, 0.439215686274510],
        [0.439215686274510, -0.367788235294118, -0.071427450980392],
    ]
)
_YCBCR_O = np.array([16.0, 128.0, 128.0])


def rgb_to_ycbcr_bt601(img: np.ndarray) -> np.ndarray:
    """RGB (0-255) -> YCbCr, parity with reference metrics.py:37-56."""
    return img @ _YCBCR_T.T + _YCBCR_O


def rgb_to_y_bt601(img) -> np.ndarray:
    """Y channel only (for PSNR/SSIM on luma)."""
    if isinstance(img, jnp.ndarray):
        t = jnp.asarray(_YCBCR_T[0], dtype=img.dtype)
        return img @ t + _YCBCR_O[0]
    return img @ _YCBCR_T[0] + _YCBCR_O[0]


def save_img(out_path: str, img: np.ndarray) -> None:
    """Clip [0,1] float RGB to uint8 and write; reference lib/ops.py:521-523."""
    import cv2

    arr = np.clip(np.asarray(img) * 255.0, 0, 255).astype(np.uint8)
    cv2.imwrite(out_path, arr[:, :, ::-1])  # RGB -> BGR for OpenCV


def load_img(path: str) -> np.ndarray:
    """Read a PNG/JPG as float32 RGB in [0, 1] (reference dataloader.py:31-38)."""
    import cv2

    im = cv2.imread(path, 3)
    if im is None:
        raise FileNotFoundError(path)
    return (im.astype(np.float32)[:, :, ::-1]) / 255.0


def list_png_in_dir(dirpath: str, prefix_skip: str = "IB"):
    """Numeric-aware sorted PNG listing (reference dataloader.py:21-28,
    metrics.py:28-35)."""
    files = [f for f in os.listdir(dirpath) if f.endswith(".png")]
    files = [f for f in files if not f.startswith(prefix_skip)]
    files = sorted(files)
    files.sort(key=lambda f: int("".join(filter(str.isdigit, f)) or -1))
    return [os.path.join(dirpath, f) for f in files]


def compute_psnr(ref, target):
    """In-graph PSNR over [0, 1] images (reference lib/ops.py:259-269)."""
    import jax.numpy as jnp

    ref = ref.astype(jnp.float32)
    target = target.astype(jnp.float32)
    diff = target - ref
    sqr = jnp.mean(diff**2)
    v = jnp.where(sqr > 0, -10.0 * jnp.log(sqr) / jnp.log(10.0), jnp.inf)
    return v
