"""Two-stage pipeline-parallel streaming inference.

The reference has no pipeline parallelism (SURVEY.md §2.3: single GPU).
For the recurrent VSR stream the classic layer-pipelining transform is
structurally useless: frame t+1's FIRST op (the warp) consumes frame t's
LAST op's output (the generator's HR frame), so a k-stage layer pipeline
serializes completely — every microbatch (frame) drains the whole pipe
before the next can enter, adding k-1 bubbles per frame and inter-stage
transfers of full HR activations (~66 MB/frame per boundary at 2160p)
for zero overlap. Spatial H-sharding (parallel/spatial.py) is the scaling
axis for a single stream; data parallelism (parallel/dp.py) for many.

What CAN overlap is the frame-parallel prefix of the step: FNet and the
4x flow upsample depend only on the input LR frames, not on the recurrent
state. This module pipelines exactly that seam across two devices:

  stage F (device 0): fnet over the chunk's frame pairs + flow upscale
  stage R (device 1): the sequential warp + generator scan

While device 1 runs chunk k's recurrent scan, device 0 computes chunk
k+1's flows; the (T, B, 4h, 4w, 2) flow tensor rides the interconnect
once per chunk. JAX's async dispatch provides the overlap — the host
enqueues both stages and the devices run concurrently. At the 2160p
measured split (~9 ms/frame of flow work vs ~71 ms/frame of recurrent
work, BASELINE.md) a second chip buys ~1.1x — which is exactly why
spatial sharding, not pipelining, is the primary multi-chip axis; this
module exists to make that trade measurable and to serve deployments
where a small flow-stage chip feeds a big recurrent-stage chip.

Semantics are identical to ``StreamingSR`` (same batched-fnet chunk
prologue, same scan body); outputs are bit-equal on the same backend
(tests/test_pipeline.py).
"""

from __future__ import annotations

import time
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tecogan_tpu.config import TecoConfig
from tecogan_tpu.models import FNet, Generator
from tecogan_tpu.ops import deprocess
from tecogan_tpu.ops.warp import warp_space_to_depth
from tecogan_tpu.recurrent.inference import _MAX_IN_FLIGHT
from tecogan_tpu.recurrent.step import RecurrentState, init_state, upscale_flow


class PipelinedStreamingSR:
    """Streaming 4x VSR with the flow stage pipelined onto a second device.

    Args:
      config: model/runtime configuration (``infer_chunk`` sets the pipeline
        granularity).
      gen_params / fnet_params: parameter pytrees.
      flow_device / recurrent_device: the two pipeline stages' devices
        (default: ``jax.devices()[0]`` and ``[1]``).
      output: "float32" or "uint8" (device-quantized), as in StreamingSR.
    """

    def __init__(self, config: TecoConfig, gen_params, fnet_params,
                 output: str = "float32",
                 flow_device=None, recurrent_device=None):
        devs = jax.devices()
        if flow_device is None or recurrent_device is None:
            if len(devs) < 2:
                raise ValueError(
                    "PipelinedStreamingSR needs two devices; "
                    f"have {len(devs)}")
            flow_device, recurrent_device = devs[0], devs[1]
        self.config = config
        self.dtype = jnp.dtype(config.compute_dtype)
        if output not in ("float32", "uint8"):
            raise ValueError(f"output must be float32|uint8, got {output}")
        self.output = output
        self.flow_device = flow_device
        self.recurrent_device = recurrent_device
        self.generator = Generator(
            num_resblock=config.num_resblock, channels=config.gen_channels,
            dtype=self.dtype)
        self.fnet = FNet(
            channels=config.fnet_channels, up_channels=config.fnet_up_channels,
            max_velocity=config.flow_max_velocity, dtype=self.dtype)
        # Stage-local parameter copies (tiny: a few MB).
        self.fnet_params = jax.device_put(fnet_params, flow_device)
        self.gen_params = jax.device_put(gen_params, recurrent_device)
        self._flow_fn = None
        self._recur_fn = None

    # ------------------------------------------------------------- stages
    def _build(self):
        fnet_apply = self.fnet.apply
        gen_apply = self.generator.apply
        as_uint8 = self.output == "uint8"
        max_disp = 4.0 * self.config.flow_max_velocity

        def flow_chunk(fnet_params, prev_last, lr_chunk):
            """(T, B, h, w, 3) + carried previous frame -> (T, B, 4h, 4w, 2).

            Identical math to StreamingSR._build_chunk_fn's prologue:
            all T adjacent pairs ride one batched fnet call.
            """
            t, b, h, w, c = lr_chunk.shape
            prev = jnp.concatenate([prev_last[None], lr_chunk[:-1]], axis=0)
            pairs = jnp.concatenate([prev, lr_chunk], axis=-1)
            flow_lr = fnet_apply(
                {"params": fnet_params}, pairs.reshape(t * b, h, w, 2 * c))
            flow_hr = upscale_flow(flow_lr, h, w)
            return flow_hr.reshape(t, b, 4 * h, 4 * w, 2), lr_chunk[-1]

        def recur_chunk(gen_params, state, lr_chunk, flow_hr):
            """The sequential stage: warp + generator scan (StreamingSR's
            scan body verbatim, with the flows precomputed upstream)."""

            def body(st, xs):
                lr, flow = xs
                packed = warp_space_to_depth(st.prev_hr, flow, 4,
                                             max_displacement=max_disp)
                gen_out = gen_apply(
                    {"params": gen_params},
                    jnp.concatenate([lr, packed], axis=-1))
                hr = deprocess(gen_out)
                st = RecurrentState(prev_lr=lr, prev_hr=hr)
                if as_uint8:  # reference ops.py:520-523 quantization
                    out = jnp.clip(
                        hr.astype(jnp.float32) * 255.0, 0.0, 255.0
                    ).astype(jnp.uint8)
                else:
                    out = hr.astype(jnp.float32)
                return st, out

            return jax.lax.scan(body, state, (lr_chunk, flow_hr))

        self._flow_fn = jax.jit(flow_chunk)
        self._recur_fn = jax.jit(recur_chunk, donate_argnums=(1,))

    # ------------------------------------------------------------- public
    def run(
        self,
        frames: np.ndarray,
        warmup: int = 0,
        chunk: Optional[int] = None,
    ) -> Tuple[np.ndarray, float]:
        """Super-resolve a (T, h, w, 3) float32 sequence; same contract as
        ``StreamingSR.run``. Stage F for chunk k+1 is enqueued on the flow
        device before stage R's output for chunk k is fetched, so the two
        stages overlap whenever two devices are present."""
        chunk = chunk or self.config.infer_chunk
        t, h, w, _ = frames.shape
        if self._flow_fn is None:
            self._build()

        prev_last = jax.device_put(
            jnp.zeros((1, h, w, 3), self.dtype), self.flow_device)
        state = jax.device_put(
            init_state(1, h, w, self.dtype), self.recurrent_device)

        t0 = time.perf_counter()
        pending: List = []
        outs = []
        for s in range(0, t, chunk):
            piece = frames[s : s + chunk]
            n = piece.shape[0]
            if n < chunk:  # pad to static shape; extra outputs discarded
                piece = np.concatenate(
                    [piece, np.repeat(piece[-1:], chunk - n, axis=0)], axis=0)
            lr_f = jax.device_put(
                jnp.asarray(piece[:, None], self.dtype), self.flow_device)
            flow_hr, prev_last = self._flow_fn(self.fnet_params, prev_last, lr_f)
            # Inter-stage transfer (flows + the LR frames the scan consumes).
            flow_r = jax.device_put(flow_hr, self.recurrent_device)
            lr_r = jax.device_put(lr_f, self.recurrent_device)
            state, hr = self._recur_fn(self.gen_params, state, lr_r, flow_r)
            pending.append((hr, n))
            if len(pending) >= _MAX_IN_FLIGHT:
                ph, pn = pending.pop(0)
                outs.append(np.asarray(jax.device_get(ph))[:pn, 0])
        outs.extend(np.asarray(jax.device_get(hr))[:n, 0] for hr, n in pending)
        elapsed = time.perf_counter() - t0
        hrs = np.concatenate(outs, axis=0)
        return hrs[warmup:], elapsed
