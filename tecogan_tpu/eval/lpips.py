"""LPIPS (net-lin, AlexNet) reimplemented in JAX.

Replaces the reference's vendored PyTorch PerceptualSimilarity stack
(reference LPIPSmodels/: ``DistModel`` facade dist_model.py:24-159,
``PNetLin`` networks_basic.py:95-177, AlexNet slices
pretrained_networks.py:57-95) with a pure-JAX functional model:

  d(x0, x1) = sum_l  mean_hw( lin_l . (unit_norm(F_l(x0)) - unit_norm(F_l(x1)))^2 )

where F_l are AlexNet features after each of the five ReLUs, unit_norm is a
channel-wise L2 normalization (util.normalize_tensor), and lin_l are the
learned non-negative 1x1 convolutions from LPIPS v0.1.

Weights:
- the five ``lin`` layers load from the 6 kB ``v0.1/alex.pth`` vendored in
  the reference checkout (:func:`load_lin_weights_pth`);
- the AlexNet backbone is torchvision's ImageNet ``alexnet``; it is NOT
  vendored anywhere in the reference repo (torchvision downloads it at
  runtime), so it must be supplied as a ``.pth``/``.npz`` file
  (:func:`load_alexnet_pth` / :func:`load_alexnet_npz`). Without it, the
  metrics suite skips LPIPS/tLP100 — same effective behavior as the
  reference on a machine that cannot download the weights.

Inputs follow ``util.im2tensor`` semantics: RGB scaled to [-1, 1]
(reference LPIPSmodels/util.py:142-146), then the fixed shift/scale
normalization (networks_basic.py:30-31).
"""

from __future__ import annotations

import functools
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

# networks_basic.py:30-31 ScalingLayer constants.
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# torchvision AlexNet ``features`` conv stack: (out_ch, kernel, stride, pad).
_ALEX_CONVS = [
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
]
# Max-pool (3x3 stride 2) sits after ReLU 1 and ReLU 2.
_POOL_AFTER = {0, 1}

ALEX_CHANNELS = [64, 192, 384, 256, 256]


def _conv(x, w, b, stride, pad):
    y = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + b


def _maxpool3s2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
    )


def alexnet_features(params: Dict, x: jnp.ndarray) -> List[jnp.ndarray]:
    """Five post-ReLU AlexNet feature maps (pretrained_networks.py:57-95).

    Args:
      params: {"conv{i}": {"w": (kh, kw, in, out), "b": (out,)}} for i in 0..4.
      x: (B, H, W, 3), already shift/scale-normalized.
    """
    feats = []
    for i, (_, _, stride, pad) in enumerate(_ALEX_CONVS):
        p = params[f"conv{i}"]
        x = jax.nn.relu(_conv(x, p["w"], p["b"], stride, pad))
        feats.append(x)
        if i in _POOL_AFTER:
            x = _maxpool3s2(x)
    return feats


def _unit_normalize(f: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    """Channel-wise L2 normalization (LPIPSmodels/util.py normalize_tensor)."""
    norm = jnp.sqrt(jnp.sum(f**2, axis=-1, keepdims=True))
    return f / (norm + eps)


def lpips_distance(
    alex_params: Dict, lin_weights: List[jnp.ndarray],
    img0: jnp.ndarray, img1: jnp.ndarray,
) -> jnp.ndarray:
    """LPIPS distance per batch element.

    Args:
      img0, img1: (B, H, W, 3) RGB in [-1, 1] (im2tensor convention).

    Returns:
      (B,) distances.
    """
    shift = _SHIFT.reshape(1, 1, 1, 3)
    scale = _SCALE.reshape(1, 1, 1, 3)
    x0 = (img0 - shift) / scale  # networks_basic.py:50-51
    x1 = (img1 - shift) / scale
    f0 = alexnet_features(alex_params, x0)
    f1 = alexnet_features(alex_params, x1)
    val = 0.0
    for l, (a, b) in enumerate(zip(f0, f1)):
        diff = (_unit_normalize(a) - _unit_normalize(b)) ** 2
        # lin_l: (C,) non-negative weights of the 1x1 conv (no bias).
        per_pixel = jnp.einsum("bhwc,c->bhw", diff, lin_weights[l])
        val = val + jnp.mean(per_pixel, axis=(1, 2))  # networks_basic.py:162-165
    return val


# ------------------------------------------------------------------ weights
def load_lin_weights_pth(path: str) -> List[np.ndarray]:
    """Load the five learned 1x1 weights from LPIPS ``v0.1/alex.pth``."""
    import torch

    sd = torch.load(path, map_location="cpu")
    out = []
    for i in range(5):
        w = sd[f"lin{i}.model.1.weight"].numpy()  # (1, C, 1, 1)
        out.append(np.ascontiguousarray(w[0, :, 0, 0]).astype(np.float32))
    return out


def load_alexnet_pth(path: str) -> Dict:
    """Load a torchvision AlexNet state_dict (.pth) into our layout."""
    import torch

    sd = torch.load(path, map_location="cpu")
    # torchvision names: features.{0,3,6,8,10}.{weight,bias}
    idxs = [0, 3, 6, 8, 10]
    params = {}
    for i, j in enumerate(idxs):
        w = sd[f"features.{j}.weight"].numpy()  # (out, in, kh, kw)
        b = sd[f"features.{j}.bias"].numpy()
        params[f"conv{i}"] = {
            "w": np.ascontiguousarray(w.transpose(2, 3, 1, 0)).astype(np.float32),
            "b": b.astype(np.float32),
        }
    return params


def load_alexnet_npz(path: str) -> Dict:
    """Load AlexNet weights from an .npz with keys conv{i}_w / conv{i}_b."""
    z = np.load(path)
    return {
        f"conv{i}": {"w": z[f"conv{i}_w"], "b": z[f"conv{i}_b"]}
        for i in range(5)
    }


def random_alexnet_params(rng: jax.Array) -> Dict:
    """He-init backbone for tests / structure checks (NOT LPIPS parity)."""
    params = {}
    in_ch = 3
    for i, (out_ch, k, _, _) in enumerate(_ALEX_CONVS):
        rng, kw = jax.random.split(rng)
        fan_in = k * k * in_ch
        w = jax.random.normal(kw, (k, k, in_ch, out_ch)) * np.sqrt(2.0 / fan_in)
        params[f"conv{i}"] = {"w": w, "b": jnp.zeros((out_ch,))}
        in_ch = out_ch
    return params


class LPIPS:
    """Jitted LPIPS evaluator (DistModel facade parity, dist_model.py:24-159)."""

    def __init__(self, alex_params: Dict, lin_weights: List[np.ndarray]):
        self.alex_params = jax.tree.map(jnp.asarray, alex_params)
        self.lin_weights = [jnp.asarray(w) for w in lin_weights]
        self._fn = jax.jit(
            functools.partial(lpips_distance, self.alex_params, self.lin_weights)
        )

    def __call__(self, img0: np.ndarray, img1: np.ndarray) -> np.ndarray:
        """img0/img1: (B, H, W, 3) RGB in [-1, 1] -> (B,) distances."""
        return np.asarray(self._fn(jnp.asarray(img0), jnp.asarray(img1)))

    @staticmethod
    def im2tensor(img_uint8_rgb: np.ndarray) -> np.ndarray:
        """uint8-range RGB (H, W, 3) -> (1, H, W, 3) in [-1, 1]
        (LPIPSmodels/util.py:142-146)."""
        return (img_uint8_rgb.astype(np.float32) / (255.0 / 2.0) - 1.0)[None]
