"""VGG19 convolutional feature extractor for the perceptual loss.

Parity with reference lib/ops.py:287-334 (slim vgg_19, classifier removed)
and the ``VGG19_slim`` wrapper (reference lib/Teco.py:5-24): inputs in
[-1, 1] are mapped to 0-255 RGB minus the VGG mean, features are taken
post-ReLU at conv2_2 / conv3_4 / conv4_4 / conv5_4 and channel-L2
normalized.

Weights: the reference downloads the TF-slim ``vgg_19.ckpt`` (~500MB,
reference runGan.py:113-121). Here weights load from an ``.npz`` whose keys
are the TF variable names (``vgg_19/conv1/conv1_1/weights`` etc.) — see
:func:`load_vgg19_npz`. Training with ``vgg_scaling > 0`` requires this file;
everything else runs without it.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tecogan_tpu.models.layers import maxpool_2x2, xavier_init
from tecogan_tpu.ops.image import deprocess

VGG_MEAN = (123.68, 116.78, 103.94)  # reference Teco.py:3

# (block, number of convs, channels)
_VGG_CFG = ((1, 2, 64), (2, 2, 128), (3, 4, 256), (4, 4, 512), (5, 4, 512))

#: Feature keys used by the TecoGAN perceptual loss (reference Teco.py:176).
DEFAULT_FEATURE_KEYS = ("conv2_2", "conv3_4", "conv4_4", "conv5_4")


class VGG19Features(nn.Module):
    """Returns a dict of post-ReLU endpoints ``conv{b}_{i}``."""

    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        endpoints = {}
        for block, n_convs, ch in _VGG_CFG:
            for i in range(1, n_convs + 1):
                x = nn.Conv(
                    features=ch,
                    kernel_size=(3, 3),
                    padding="SAME",
                    kernel_init=xavier_init,
                    name=f"conv{block}_{i}",
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                )(x)
                x = jax.nn.relu(x)
                endpoints[f"conv{block}_{i}"] = x
            x = maxpool_2x2(x)
        return endpoints


def vgg19_normalized_features(
    apply_fn,
    params,
    images_pm1: jnp.ndarray,
    keys: Sequence[str] = DEFAULT_FEATURE_KEYS,
) -> Dict[str, jnp.ndarray]:
    """VGG19_slim parity (reference Teco.py:5-24).

    Args:
      apply_fn: bound ``VGG19Features().apply``.
      params: VGG19 params (frozen; never trained, reference main.py:322-324).
      images_pm1: (B, H, W, 3) in [-1, 1].
      keys: endpoints to return.

    Returns:
      dict of channel-L2-normalized feature maps.
    """
    img = deprocess(images_pm1) * 255.0 - jnp.asarray(
        VGG_MEAN, dtype=images_pm1.dtype
    )
    feats = apply_fn({"params": params}, img)
    out = {}
    for k in keys:
        f = feats[k]
        norm = jnp.sqrt(jnp.sum(jnp.square(f), axis=3, keepdims=True) + 1e-12)
        out[k] = f / norm
    return out


def random_vgg19_params(seed: int = 0) -> Dict:
    """Xavier-random VGG19 params, for cost benchmarking and fixture tests.

    Step time and FLOPs are weight-independent, so the full case-3 TecoGAN
    training cost (reference runGan.py:147-163, ``--vgg_scaling 0.2``) is
    measurable without the non-distributable ``vgg_19.ckpt``; metrics
    computed against these weights are NOT the published perceptual loss.
    """
    mod = VGG19Features()
    return mod.init(jax.random.PRNGKey(seed), jnp.zeros((1, 32, 32, 3)))[
        "params"
    ]


def load_vgg19_npz(path: str) -> Dict:
    """Load TF-slim vgg_19 weights from an .npz into the flax param tree.

    The npz must map TF names (``vgg_19/conv1/conv1_1/weights`` /
    ``.../biases``) to arrays. Convert the reference's vgg_19.ckpt with any
    TF installation via:
    ``np.savez(out, **{v.name: reader.get_tensor(v.name) for ...})``.
    """
    data = np.load(path)
    params: Dict[str, Dict[str, np.ndarray]] = {}
    for block, n_convs, _ in _VGG_CFG:
        for i in range(1, n_convs + 1):
            tf_base = f"vgg_19/conv{block}/conv{block}_{i}"
            params[f"conv{block}_{i}"] = {
                "kernel": data[f"{tf_base}/weights"],
                "bias": data[f"{tf_base}/biases"],
            }
    return jax.tree.map(jnp.asarray, params)
