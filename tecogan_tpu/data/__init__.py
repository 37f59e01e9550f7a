"""Host data pipeline: scene discovery, decode, augment, prefetch.

Replaces the reference's TF queue-runner input pipeline
(lib/dataloader.py:53-348) with a plain-numpy threaded loader feeding
double-buffered ``jax.device_put``: PNG decode and the per-sequence
augmentations (random crop, flip, movingFirstFrame camera-pan synthesis)
happen on host threads; Gaussian down-4 and value-range prep happen on
device inside the jitted train step (:func:`tecogan_tpu.train.prepare_batch`).
"""

from tecogan_tpu.data.loader import SceneDataset, BatchLoader
from tecogan_tpu.data.inference import load_inference_frames
from tecogan_tpu.data.synthetic import synthetic_clip, write_synthetic_scenes

__all__ = [
    "SceneDataset",
    "BatchLoader",
    "load_inference_frames",
    "synthetic_clip",
    "write_synthetic_scenes",
]
