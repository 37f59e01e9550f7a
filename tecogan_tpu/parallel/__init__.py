"""Parallelism over TPU meshes.

The reference is strictly single-GPU (SURVEY.md §2.3: every graph chunk pins
``/gpu:0``; no NCCL/MPI anywhere). Here scaling is first-class and purely
XLA-native:

- **data parallel** training: batch sharded over a 1-D ``data`` mesh axis;
  parameters replicated; gradient all-reduce emitted by GSPMD from the
  sharding annotations — no hand-written collectives.
- **spatial sharding** for huge-frame streaming inference (the "context
  parallelism" analog for video SR): frame height sharded over a ``space``
  axis; XLA spatial partitioning inserts the conv halo exchanges.
- **pipeline parallel** streaming: the frame-parallel flow stage (fnet +
  flow upsample) on one device feeding the sequential warp+generator scan
  on another (parallel/pipeline.py; the module docstring derives why
  classic layer pipelining cannot overlap a strict frame recurrence).
"""

from tecogan_tpu.parallel.mesh import (
    init_distributed,
    make_mesh,
    batch_sharding,
    replicated,
    shard_batch,
)
from tecogan_tpu.parallel.dp import DataParallelTrainer
from tecogan_tpu.parallel.pipeline import PipelinedStreamingSR
from tecogan_tpu.parallel.spatial import spatial_streaming_fn

__all__ = [
    "init_distributed",
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "DataParallelTrainer",
    "PipelinedStreamingSR",
    "spatial_streaming_fn",
]
