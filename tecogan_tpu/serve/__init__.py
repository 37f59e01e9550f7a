"""TPU-native serving layer: multi-stream batching + AOT export."""

from tecogan_tpu.serve.engine import (
    MultiGeometryServer,
    VSRServer,
    build_frame_fn,
)
from tecogan_tpu.serve.export import (
    export_frame_step,
    load_frame_step,
    save_frame_step,
)
from tecogan_tpu.serve.sources import EOS, PENDING, FrameSource

__all__ = [
    "MultiGeometryServer",
    "VSRServer",
    "build_frame_fn",
    "FrameSource",
    "PENDING",
    "EOS",
    "export_frame_step",
    "save_frame_step",
    "load_frame_step",
]
