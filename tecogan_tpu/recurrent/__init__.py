"""Temporal recurrence: per-frame step, training unroll, streaming inference.

The reference unrolls the recurrent generator as a Python loop in the TF
graph (training, lib/Teco.py:125-164) and streams frames through persistent
TF Variables (inference, main.py:194-216). Here both collapse into
``lax.scan`` over a device-resident carry (the previous LR frame and HR
output live in HBM for the whole sequence) — O(1) memory in sequence length,
zero host round-trips inside a chunk.
"""

from tecogan_tpu.recurrent.step import (
    RecurrentState,
    extend_pingpong,
    flows_for_sequence,
    frame_step,
    init_state,
    unroll_generator,
)
from tecogan_tpu.recurrent.inference import StreamingSR

__all__ = [
    "RecurrentState",
    "frame_step",
    "init_state",
    "flows_for_sequence",
    "unroll_generator",
    "extend_pingpong",
    "StreamingSR",
]
