"""Core image ops for TecoGAN-TPU.

Pure-jnp, XLA-fusable implementations of the reference's hand-rolled TF ops
(reference lib/ops.py) plus the native kernels it reached through TF
(``tf.contrib.image.dense_image_warp``, ``tf.space_to_depth``).
"""

from tecogan_tpu.ops.resize import upscale_bilinear, upscale_four, bicubic_four
from tecogan_tpu.ops.space_to_depth import space_to_depth, depth_to_space
from tecogan_tpu.ops.gauss import gaussian_kernel_2d, gauss_down_by4
from tecogan_tpu.ops.warp import (
    dense_image_warp,
    dense_image_warp_box,
    dense_image_warp_reference,
    warp_space_to_depth,
)
from tecogan_tpu.ops.image import preprocess, deprocess, rgb_to_y_bt601

__all__ = [
    "upscale_bilinear",
    "upscale_four",
    "bicubic_four",
    "space_to_depth",
    "depth_to_space",
    "gaussian_kernel_2d",
    "gauss_down_by4",
    "dense_image_warp",
    "dense_image_warp_box",
    "dense_image_warp_reference",
    "warp_space_to_depth",
    "preprocess",
    "deprocess",
    "rgb_to_y_bt601",
]
