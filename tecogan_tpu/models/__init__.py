"""Model family: flow estimator, recurrent generator, spatio-temporal
discriminator, VGG19 feature extractor, LPIPS metric network."""

from tecogan_tpu.models.fnet import FNet
from tecogan_tpu.models.generator import Generator
from tecogan_tpu.models.discriminator import Discriminator
from tecogan_tpu.models.vgg19 import VGG19Features, vgg19_normalized_features

__all__ = [
    "FNet",
    "Generator",
    "Discriminator",
    "VGG19Features",
    "vgg19_normalized_features",
]
