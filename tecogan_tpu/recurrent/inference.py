"""Streaming 4x VSR inference.

Replaces the reference per-frame ``sess.run`` loop (main.py:253-270), which
uploads every frame twice and round-trips host<->device per frame. Here the
sequence is processed in device-resident chunks: a jitted ``lax.scan`` over
``infer_chunk`` frames with the recurrent state donated between chunks, so
the only host traffic is one LR upload and one HR download per chunk.

Handles the reference's warm-up protocol: the first 5 outputs correspond to
reversed frames [5..1] prepended as padding and are discarded
(reference dataloader.py:42-44, main.py:262-269).
"""

from __future__ import annotations

import functools
import time
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tecogan_tpu.config import TecoConfig
from tecogan_tpu.models import FNet, Generator
from tecogan_tpu.recurrent.step import RecurrentState, frame_step, init_state

WARMUP_FRAMES = 5  # reference dataloader.py:42-44


def prepend_warmup(frames: List) -> List:
    """Prepend reversed frames [5..1] (reference dataloader.py:42-44)."""
    return list(frames[5:0:-1]) + list(frames)


class StreamingSR:
    """Chunked streaming super-resolver around a jitted scan step."""

    def __init__(self, config: TecoConfig, gen_params, fnet_params):
        self.config = config
        dtype = jnp.dtype(config.compute_dtype)
        self.dtype = dtype
        self.generator = Generator(
            num_resblock=config.num_resblock,
            channels=config.gen_channels,
            dtype=dtype,
        )
        self.fnet = FNet(
            channels=config.fnet_channels,
            up_channels=config.fnet_up_channels,
            max_velocity=config.flow_max_velocity,
            dtype=dtype,
        )
        self.gen_params = gen_params
        self.fnet_params = fnet_params
        self._chunk_fn = None
        self._chunk_shape = None

    # ------------------------------------------------------------- chunk fn
    def _build_chunk_fn(self):
        gen_apply = self.generator.apply
        fnet_apply = self.fnet.apply

        @functools.partial(jax.jit, donate_argnums=(2,))
        def run_chunk(gen_params, fnet_params, state, lr_chunk):
            # lr_chunk: (T, B, h, w, 3)
            def body(st, lr):
                return frame_step(
                    gen_apply, fnet_apply, gen_params, fnet_params, st, lr
                )

            state, hr = jax.lax.scan(body, state, lr_chunk)
            return state, hr

        return run_chunk

    # ------------------------------------------------------------- public
    def run(
        self,
        frames: np.ndarray,
        warmup: int = 0,
        chunk: Optional[int] = None,
    ) -> Tuple[np.ndarray, float]:
        """Super-resolve a sequence.

        Args:
          frames: (T, h, w, 3) float32 LR frames in [0, 1] (warm-up padding
            already applied by the caller if desired).
          warmup: number of leading outputs to drop from the result.
          chunk: frames per device chunk (default config.infer_chunk).

        Returns:
          (T - warmup, 4h, 4w, 3) float32 HR frames in [0, 1], and the
          device wall-clock seconds spent (excludes host PNG I/O, includes
          host<->device transfers — same accounting as reference
          main.py:256-260).
        """
        chunk = chunk or self.config.infer_chunk
        t, h, w, _ = frames.shape
        if self._chunk_fn is None:
            self._chunk_fn = self._build_chunk_fn()

        state = init_state(1, h, w, self.dtype)
        outs = []
        elapsed = 0.0
        for s in range(0, t, chunk):
            piece = frames[s : s + chunk]
            n = piece.shape[0]
            if n < chunk:  # pad to static shape; extra outputs discarded
                piece = np.concatenate(
                    [piece, np.repeat(piece[-1:], chunk - n, axis=0)], axis=0
                )
            lr = jnp.asarray(piece[:, None], self.dtype)  # (T, 1, h, w, 3)
            t0 = time.perf_counter()
            state, hr = self._chunk_fn(self.gen_params, self.fnet_params, state, lr)
            hr_np = np.asarray(jax.device_get(hr))  # blocks until done
            elapsed += time.perf_counter() - t0
            outs.append(hr_np[:n, 0])
        hrs = np.concatenate(outs, axis=0).astype(np.float32)
        return hrs[warmup:], elapsed
