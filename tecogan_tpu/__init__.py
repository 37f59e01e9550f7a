"""TecoGAN-TPU: a TPU-native (JAX/XLA/Pallas) video super-resolution framework.

Reimplements the full capability surface of thunil/TecoGAN (TEmporally COherent
GAN for 4x video super resolution, ACM TOG 2020) with a TPU-first design:

- streaming recurrent 4x VSR inference (``tecogan_tpu.recurrent``)
- FRVSR training (generator + flow net, L2 losses)
- TecoGAN adversarial training (spatio-temporal discriminator, VGG19
  perceptual loss, ping-pong loss, adaptive discriminator balancing)
- metric evaluation: PSNR / SSIM / LPIPS / tOF / tLP100 (``tecogan_tpu.eval``)
- dataset preparation and host data pipeline (``tecogan_tpu.data``)
- production serving: multi-stream continuous batching + AOT StableHLO
  export of the frame step (``tecogan_tpu.serve``)

Unlike the reference (a single-GPU TF1 graph), the compute path here is pure
functional JAX compiled by XLA for the MXU, with a Pallas kernel for the hot
dense-image-warp op, ``lax.scan`` for the temporal recurrence, and
``jax.sharding`` meshes for data-parallel scaling over ICI.
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("TECOGAN_PLATFORM"):
    # Some TPU plugins register themselves regardless of JAX_PLATFORMS; the
    # config knob is the only override they honor. Lets CLI subprocesses be
    # pinned to CPU for smokes/debugging (tests/conftest.py does the same).
    import jax as _jax

    try:
        from jax._src import xla_bridge as _xb

        _already = _xb.backends_are_initialized()
    except Exception:  # private API may move between jax versions
        _already = False
    if _already:
        import warnings as _warnings

        _warnings.warn(
            "TECOGAN_PLATFORM=%r set, but JAX backends were already "
            "initialized before tecogan_tpu was imported — the platform pin "
            "is a no-op. Set JAX_PLATFORMS or import tecogan_tpu first."
            % _os.environ["TECOGAN_PLATFORM"],
            RuntimeWarning,
            stacklevel=2,
        )
    else:
        _jax.config.update("jax_platforms", _os.environ["TECOGAN_PLATFORM"])

from tecogan_tpu.config import TecoConfig, FRVSR_PRESET, TECOGAN_PRESET, MINI_PRESET

__all__ = [
    "TecoConfig",
    "FRVSR_PRESET",
    "TECOGAN_PRESET",
    "MINI_PRESET",
]
