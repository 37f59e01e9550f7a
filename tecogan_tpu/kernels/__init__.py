"""Pallas TPU kernels for the hot per-frame ops.

Kernels are drop-in exact replacements for their XLA counterparts in
:mod:`tecogan_tpu.ops` (which remain the parity oracles and the fallback on
non-TPU backends)."""

from tecogan_tpu.kernels.resblocks import (
    resblock_chain,
    resblock_chain_xla,
)
from tecogan_tpu.kernels.upsample4 import (
    bicubic_four_pallas,
    upscale_bilinear_pallas,
    upsample4_auto,
)

__all__ = [
    "resblock_chain",
    "resblock_chain_xla",
    "bicubic_four_pallas",
    "upscale_bilinear_pallas",
    "upsample4_auto",
]
