"""Streaming 4x VSR inference.

Replaces the reference per-frame ``sess.run`` loop (main.py:253-270), which
uploads every frame twice and round-trips host<->device per frame. Here the
sequence is processed in device-resident chunks: a jitted ``lax.scan`` over
``infer_chunk`` frames with the recurrent state donated between chunks.

Host-IO design (TPU-first):
- LR frames upload once per chunk; HR frames can be quantized to uint8
  **on device** (exactly ``np.clip(img*255, 0, 255).astype(uint8)``,
  reference ops.py:520-523) before download — 4x less PCIe/ICI traffic than
  the reference's float fetches, with zero precision change to saved PNGs.
- Chunks are pipelined: chunk k+1 is dispatched before chunk k's output is
  fetched, so host transfers overlap device compute (JAX async dispatch).

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
from tecogan_tpu.models.generator import (
    generator_apply_fused,
    generator_apply_hr_input,
)
from tecogan_tpu.models.fnet import pad_flow_to
from tecogan_tpu.ops import deprocess
from tecogan_tpu.ops.warp import (
    _BLOCK_THRESHOLD_PIXELS,
    dense_image_warp,
    warp_space_to_depth,
    warp_space_to_depth_flowlr,
    warp_space_to_depth_halo,
)
from tecogan_tpu.recurrent.step import (
    RecurrentState,
    init_state,
    upscale_flow,
)

WARMUP_FRAMES = 5  # reference dataloader.py:42-44

# Max chunks whose HR outputs may be simultaneously resident in HBM during
# streaming (chunk k fetches while chunk k+1 computes). 2 = full
# compute/transfer overlap with O(chunk) device memory.
_MAX_IN_FLIGHT = 2

# LR pixels above which the fused Pallas trunk beats XLA's conv chain in
# the streaming step (v5e: loses at 144x180, wins at 540x960).
_FUSED_TRUNK_MIN_PIXELS = 250_000

# HR pixel band in which fold_input_s2d="auto" folds the space-to-depth
# pack into the generator's HR input conv. In-scan A/B (round 3,
# tools/headline_ablate.py + s2d_fold_sweep.py): stride-4 fold +18% at
# 576x720 HR (194 -> 228 fps), +20% at 384x480, +7% at 288x360; NEGATIVE
# at 2160p (the stride-4 im2col outweighs the removed s2d transpose
# there). Round 4: the "patchify" s2d mode (the 4x4-stride-4 0/1-
# selection conv, MXU im2col instead of the VPU lane-interleave) beats
# the stride-4 fold everywhere in the band — 221.0 -> 235.8 fps at
# 576x720, 515.6 -> 586.3 at 384x480, 887.0 -> 929.8 at 288x360 — and
# stays ahead of no-fold at 1080x1920 (39.7 -> 40.1), so "auto" now
# selects patchify and the band cap includes 1080p. Below ~100k px the
# op mix is dispatch-bound and the tested default path stays.
_FOLD_S2D_MIN_HR_PIXELS = 100_000
_FOLD_S2D_MAX_HR_PIXELS = 2_100_000


def prepend_warmup(frames: List) -> List:
    """Prepend reversed frames [5..1] (reference dataloader.py:42-44)."""
    return list(frames[5:0:-1]) + list(frames)


def fold_s2d_active(config: TecoConfig, h: int, w: int) -> bool:
    """Whether the streaming step folds the post-warp space-to-depth into
    the generator's stride-4 HR input conv for an (h, w) LR frame — the
    compile-time branch shared by StreamingSR and the serving engine
    (measured bands above; models/generator.py:generator_apply_hr_input)."""
    if config.gen_channels != 64 or config.fold_input_s2d == "off":
        return False
    if config.fold_input_s2d in ("on", "patchify"):
        return True
    hr_px = 16 * h * w
    return _FOLD_S2D_MIN_HR_PIXELS < hr_px <= _FOLD_S2D_MAX_HR_PIXELS


def s2d_mode_for(config: TecoConfig) -> str:
    """The ``generator_apply_hr_input`` s2d mode a config selects (shared
    by the streaming and serving engines; only meaningful where
    :func:`fold_s2d_active` is True). Deliberately NOT batch-dependent —
    "auto" selects patchify at every batch size: it is BIT-exact with the
    unfolded flax path (the 0/1
    selection conv adds no rounding), whereas stride4 splits the input
    conv into two separately-bf16-rounded convs — on TPU hardware that
    per-layer half-ulp noise compounds through the resblock chain and the
    recurrence, so a B>1 serving pool would disagree with the B=1
    single-stream engine on identical inputs (measured one-frame: max
    0.27 output diff at 16 resblocks/random weights on-chip vs 0.0 for
    patchify; tools/validate_serve_hw.py caught it end-to-end).
    stride4's batched-throughput edge is ~1.7% (B=4 at 144x180: 286.9 vs
    282.1 fps aggregate) — not worth non-reproducible outputs. "on"
    forces stride4 for A/B; "patchify" forces patchify."""
    mode = config.fold_input_s2d
    if mode == "on":
        return "stride4"
    return "patchify"


class StreamingSR:
    """Chunked streaming super-resolver around a jitted scan step.

    Args:
      config: model/runtime configuration.
      gen_params / fnet_params: parameter pytrees.
      output: "float32" (HR in [0, 1]) or "uint8" (device-quantized, the
        format PNGs are written in — preferred for throughput).
    """

    def __init__(self, config: TecoConfig, gen_params, fnet_params,
                 output: str = "float32", spatial_mesh=None,
                 scan_unroll: int = 1):
        """``spatial_mesh``: optional Mesh with a ``config.sp_axis`` axis —
        frames and recurrent state are H-sharded across it and GSPMD inserts
        the conv/warp halo exchanges over ICI (SURVEY.md §2.3: the
        context-parallel analog for this workload).

        ``scan_unroll``: unroll factor for the per-frame ``lax.scan``.
        **Measured NEGATIVE on the headline workload** — the hypothesis was
        that k > 1 would amortize the 0.71 ms/frame of scan-carry layout
        copies (BASELINE.md round-5 B=1 accounting) across k frames, but on
        the chip unroll 2 = -2.5% fps and unroll 4 = -3.3% (spread-separated;
        `tools/bench_unroll.py`), i.e. those copies live inside the frame
        body, not at the loop boundary, and the bigger body only hurts
        scheduling. Default 1; the knob + tool stay so the result is
        reproducible and nobody re-learns it."""
        self.config = config
        dtype = jnp.dtype(config.compute_dtype)
        self.dtype = dtype
        if output not in ("float32", "uint8"):
            raise ValueError(f"output must be float32|uint8, got {output}")
        self.output = output
        self.spatial_mesh = spatial_mesh
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
        if not (isinstance(scan_unroll, int) and scan_unroll >= 1):
            raise ValueError(f"scan_unroll must be an int >= 1, got "
                             f"{scan_unroll!r}")
        self.scan_unroll = scan_unroll
        self._chunk_fn = None

    # ------------------------------------------------------------- chunk fn
    def _gen_apply(self):
        """Generator apply for the streaming path: routes large frames
        through the fused Pallas trunk (``config.fused_trunk``) — it beats
        XLA's conv chain only once the frame is big enough to amortize the
        pair pack/unpack (kernels/resblocks.py module docstring). Shapes
        are static at trace time, so this is a compile-time branch. Not
        used on a spatial mesh (a Pallas call would block GSPMD's
        partitioning of the generator)."""
        mode = self.config.fused_trunk
        flax_apply = self.generator.apply
        if (mode == "off" or self.spatial_mesh is not None
                or self.config.gen_channels != 64):
            return flax_apply
        num_rb = self.config.num_resblock
        min_px = 0 if mode == "on" else _FUSED_TRUNK_MIN_PIXELS

        def apply(variables, xin):
            if xin.shape[1] * xin.shape[2] >= min_px:
                return generator_apply_fused(
                    variables["params"], xin, num_resblock=num_rb)
            return flax_apply(variables, xin)

        return apply

    def _build_chunk_fn(self):
        """Offline-optimal chunk step, semantically identical to the live
        per-frame step: fnet and the flow upsample run once as a (T*B)
        batch (better MXU utilization than T serial 1-batch calls), then a
        scan carries only the truly recurrent warp+generator."""
        gen_apply = self._gen_apply()
        fnet_apply = self.fnet.apply
        as_uint8 = self.output == "uint8"
        spatial_mesh = self.spatial_mesh
        sp_axis = self.config.sp_axis
        max_disp = 4.0 * self.config.flow_max_velocity
        num_rb = self.config.num_resblock
        scan_unroll = self.scan_unroll

        s2d_ok = spatial_mesh is None

        def use_hr_input(lr):
            # Compile-time branch (shapes static at trace time).
            return s2d_ok and fold_s2d_active(
                self.config, lr.shape[1], lr.shape[2])

        up_mode = self.config.pallas_flow_upsample

        def use_pallas_up(h, w):
            # Compile-time branch (shapes static at trace time). "auto" =
            # TPU + LR frames >= 400k px, where the H-banded kernel is a
            # measured in-scan win (12.54 -> 12.65 fps at 540x960 chunk 24,
            # spread-separated; neutral at 144x180 — BASELINE.md round 4).
            if spatial_mesh is not None or up_mode == "off":
                return False
            if up_mode == "on":
                return True
            from tecogan_tpu.kernels.upsample4 import _on_tpu
            return h * w >= 400_000 and _on_tpu()
        s2d_mode_cfg = self.config
        flow_mode = self.config.inline_flow

        def use_inline_flow(h, w):
            # Per-tile flow upsample only pays on blocked-warp frames;
            # dense_image_warp_flowlr falls back internally regardless.
            if spatial_mesh is not None or flow_mode == "off":
                return False
            return flow_mode == "on" or 16 * h * w > _BLOCK_THRESHOLD_PIXELS

        def warp(prev_hr, flow):
            # On a spatial mesh, use the explicit shard_map halo-exchange
            # warp whenever shard geometry allows (GSPMD all-gathers the
            # full packed operand otherwise — tools/audit_spatial_hlo.py);
            # shapes are static at trace time so this is a compile-time
            # branch, and the tiny-frame fallback keeps identical semantics.
            if spatial_mesh is not None:
                n = spatial_mesh.shape[sp_axis]
                hs = prev_hr.shape[1] // n
                if hs > int(max_disp) + 1 and prev_hr.shape[1] % (4 * n) == 0:
                    return warp_space_to_depth_halo(
                        prev_hr, flow, spatial_mesh, sp_axis, 4,
                        max_displacement=max_disp)
            return warp_space_to_depth(prev_hr, flow, 4,
                                       max_displacement=max_disp)

        compute_dtype = self.dtype

        @functools.partial(jax.jit, donate_argnums=(2,))
        def run_chunk(gen_params, fnet_params, state, lr_chunk):
            if lr_chunk.dtype == jnp.uint8:
                # uint8 uploads: 4x less host->device traffic than f32. The
                # on-device /255 matches the host normalization it replaces
                # (reference dataloader.py:32-36) to 1 ulp — XLA lowers the
                # constant division to a reciprocal multiply — which flips
                # ~1e-5 of output uint8 pixels by +-1 (tests pin this bound).
                lr_chunk = (lr_chunk.astype(jnp.float32) / 255.0).astype(
                    compute_dtype)
            t, b, h, w, c = lr_chunk.shape
            inline = use_inline_flow(h, w)
            s2d_mode = s2d_mode_for(s2d_mode_cfg)
            # Adjacent pairs incl. the carried previous frame.
            prev = jnp.concatenate([state.prev_lr[None], lr_chunk[:-1]], axis=0)
            pairs = jnp.concatenate([prev, lr_chunk], axis=-1)
            flow_lr = fnet_apply(
                {"params": fnet_params}, pairs.reshape(t * b, h, w, 2 * c)
            )
            if inline:
                # Scan carries the LR flow (16x smaller); the warp upsamples
                # per tile (ops/warp.py:dense_image_warp_flowlr).
                flow_x = pad_flow_to(flow_lr, h, w).reshape(t, b, h, w, 2)
            elif use_pallas_up(h, w):
                from tecogan_tpu.kernels.upsample4 import (
                    upscale_bilinear_pallas,
                )

                flow_x = upscale_bilinear_pallas(
                    pad_flow_to(flow_lr, h, w) * 4.0
                ).reshape(t, b, 4 * h, 4 * w, 2)
            else:
                flow_x = upscale_flow(flow_lr, h, w).reshape(
                    t, b, 4 * h, 4 * w, 2)

            def body(st, xs):
                lr, flow = xs
                if use_hr_input(lr) and not inline:
                    # Raw warp; the s2d pack is folded into the generator's
                    # stride-4 HR input conv (models/generator.py).
                    warped = dense_image_warp(st.prev_hr, flow,
                                              max_displacement=max_disp)
                    gen_out = generator_apply_hr_input(
                        gen_params, lr, warped, num_resblock=num_rb,
                        s2d_mode=s2d_mode)
                else:
                    if inline:
                        packed = warp_space_to_depth_flowlr(
                            st.prev_hr, flow, 4, max_displacement=max_disp)
                    else:
                        packed = warp(st.prev_hr, flow)
                    gen_out = gen_apply(
                        {"params": gen_params},
                        jnp.concatenate([lr, packed], axis=-1),
                    )
                hr = deprocess(gen_out)
                st = RecurrentState(prev_lr=lr, prev_hr=hr)
                if as_uint8:  # reference ops.py:520-523 quantization, on device
                    out = jnp.clip(
                        hr.astype(jnp.float32) * 255.0, 0.0, 255.0
                    ).astype(jnp.uint8)
                else:
                    out = hr.astype(jnp.float32)
                return st, out

            state, hr = jax.lax.scan(body, state, (lr_chunk, flow_x),
                                     unroll=scan_unroll)
            return state, hr

        if self.spatial_mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            mesh = self.spatial_mesh
            axis = self.config.sp_axis
            repl = NamedSharding(mesh, P())
            st_sh = RecurrentState(
                prev_lr=NamedSharding(mesh, P(None, axis)),
                prev_hr=NamedSharding(mesh, P(None, axis)),
            )
            chunk_sh = NamedSharding(mesh, P(None, None, axis))
            return jax.jit(
                run_chunk.__wrapped__,  # re-jit with shardings
                donate_argnums=(2,),
                in_shardings=(repl, repl, st_sh, chunk_sh),
                out_shardings=(st_sh, chunk_sh),
            )
        return run_chunk

    # ------------------------------------------------------------- public
    def run(
        self,
        frames: np.ndarray,
        warmup: int = 0,
        chunk: Optional[int] = None,
        on_chunk=None,
    ) -> Tuple[Optional[np.ndarray], float]:
        """Super-resolve a sequence.

        Args:
          frames: (T, h, w, 3) LR frames — float32 in [0, 1], or uint8
            (normalized on device; 4x less upload traffic) — warm-up padding
            already applied by the caller if desired.
          warmup: number of leading outputs to drop from the result.
          chunk: frames per device chunk (default config.infer_chunk).
          on_chunk: optional ``fn(hr_frames, start_index)`` called with each
            fetched chunk ((n, 4h, 4w, 3), global output index of its first
            frame) as soon as it lands — lets the caller overlap PNG
            encoding with device compute instead of serializing after the
            full run (reference main.py:262-269 writes per frame inline).
            ``start_index`` counts from 0 INCLUDING warm-up frames; frames
            before ``warmup`` are not delivered. When set, the full output
            array is not accumulated and the first return value is None.

        Returns:
          ((T - warmup, 4h, 4w, 3) HR frames (float32 in [0, 1] or uint8 per
          ``output``) or None with ``on_chunk``, and wall-clock seconds spent
          (includes host<->device transfers — same accounting as reference
          main.py:256-260).
        """
        chunk = chunk or self.config.infer_chunk
        t, h, w, _ = frames.shape
        if self._chunk_fn is None:
            self._chunk_fn = self._build_chunk_fn()

        state = init_state(1, h, w, self.dtype)
        t0 = time.perf_counter()
        # Pipelined with bounded depth: keep at most _MAX_IN_FLIGHT chunks'
        # HR outputs resident in HBM (fetch chunk k while k+1 computes).
        # Dispatching the whole sequence first would hold O(T) HR frames on
        # device — ~12 GB for 120 frames of 2160p float32, an OOM at the
        # advertised long-sequence scale.
        outs = []

        def deliver(hr, n, start):
            got = np.asarray(jax.device_get(hr))[:n, 0]
            if on_chunk is not None:
                if start + n > warmup:  # drop warm-up prefix
                    keep = got[max(warmup - start, 0):]
                    on_chunk(keep, max(start, warmup))
            else:
                outs.append(got)

        pending: List = []
        for s in range(0, t, chunk):
            piece = frames[s : s + chunk]
            n = piece.shape[0]
            if n < chunk:  # pad to static shape; extra outputs discarded
                piece = np.concatenate(
                    [piece, np.repeat(piece[-1:], chunk - n, axis=0)], axis=0
                )
            if piece.dtype == np.uint8:
                lr = jnp.asarray(piece[:, None])  # device-side normalize
            else:
                lr = jnp.asarray(piece[:, None], self.dtype)  # (T, 1, h, w, 3)
            state, hr = self._chunk_fn(self.gen_params, self.fnet_params, state, lr)
            pending.append((hr, n, s))
            if len(pending) >= _MAX_IN_FLIGHT:
                deliver(*pending.pop(0))
        for item in pending:
            deliver(*item)
        elapsed = time.perf_counter() - t0
        if on_chunk is not None:
            return None, elapsed
        hrs = np.concatenate(outs, axis=0)
        return hrs[warmup:], elapsed

    def run_streams(
        self,
        frames: np.ndarray,
        warmup: int = 0,
        chunk: Optional[int] = None,
    ) -> Tuple[np.ndarray, float]:
        """Super-resolve B independent streams concurrently.

        Multi-stream serving is where the TPU's MXU utilization scales:
        batch>1 amortizes per-op overhead across streams (no reference
        analog — the reference is strictly single-stream, main.py:180-270).

        Args:
          frames: (B, T, h, w, 3) float32 LR streams in [0, 1].

        Returns:
          ((B, T - warmup, 4h, 4w, 3) HR streams, wall seconds).
        """
        chunk = chunk or self.config.infer_chunk
        bsz, t, h, w, _ = frames.shape
        if self._chunk_fn is None:
            self._chunk_fn = self._build_chunk_fn()
        state = init_state(bsz, h, w, self.dtype)
        t0 = time.perf_counter()
        # Bounded pipeline depth — same rationale as :meth:`run`.
        pending: List = []
        outs = []

        def fetch(item):
            hr, n = item
            return np.asarray(jax.device_get(hr))[:n].transpose(1, 0, 2, 3, 4)

        for s in range(0, t, chunk):
            piece = frames[:, s : s + chunk]
            n = piece.shape[1]
            if n < chunk:
                piece = np.concatenate(
                    [piece, np.repeat(piece[:, -1:], chunk - n, axis=1)], axis=1
                )
            lr = jnp.asarray(piece.transpose(1, 0, 2, 3, 4), self.dtype)
            state, hr = self._chunk_fn(self.gen_params, self.fnet_params, state, lr)
            pending.append((hr, n))
            if len(pending) >= _MAX_IN_FLIGHT:
                outs.append(fetch(pending.pop(0)))
        outs.extend(fetch(item) for item in pending)
        elapsed = time.perf_counter() - t0
        hrs = np.concatenate(outs, axis=1)
        return hrs[:, warmup:], elapsed

    # -------------------------------------------------------------- bench
    def _fps_samples(self, lr, bsz: int, frames_per_pass: int,
                     h: int, w: int, reps: int, passes: int):
        """Shared timing core: ``passes`` synced measurements of ``reps``
        chained chunk executions each; returns one fps sample per pass
        (median/min/max across passes is the run-to-run spread a single
        number hides — VERDICT r3 #6). Syncs via a dependent scalar fetch
        (reliable even where ``block_until_ready`` is a no-op, e.g.
        tunneled backends)."""
        if self._chunk_fn is None:
            self._chunk_fn = self._build_chunk_fn()
        chunk_fn = self._chunk_fn

        @jax.jit
        def step(gen_params, fnet_params, state, lr_chunk):
            state, hr = chunk_fn(gen_params, fnet_params, state, lr_chunk)
            return state, jnp.sum(hr.astype(jnp.float32))

        state = init_state(bsz, h, w, self.dtype)
        compiled = step.lower(
            self.gen_params, self.fnet_params, state, lr).compile()
        # Warm up twice: first execution pays one-off backend initialization.
        for _ in range(2):
            state, s = compiled(self.gen_params, self.fnet_params, state, lr)
            float(jax.device_get(s))
        samples = []
        for _ in range(max(1, passes)):
            t0 = time.perf_counter()
            for _ in range(reps):
                state, s = compiled(self.gen_params, self.fnet_params,
                                    state, lr)
            float(jax.device_get(s))  # chained state serializes the reps
            dt = (time.perf_counter() - t0) / reps
            samples.append(frames_per_pass / dt)
        return samples

    def device_fps_batched_samples(self, streams: np.ndarray, reps: int = 3,
                                   passes: int = 1):
        """Aggregate device throughput over B concurrent streams
        ((B, T, h, w, 3) input); counts B*T frames per rep. Returns one fps
        sample per pass."""
        bsz, t, h, w, _ = streams.shape
        lr = jnp.asarray(streams.transpose(1, 0, 2, 3, 4), self.dtype)
        return self._fps_samples(lr, bsz, bsz * t, h, w, reps, passes)

    def device_fps_batched(self, streams: np.ndarray, reps: int = 3) -> float:
        return self.device_fps_batched_samples(streams, reps=reps)[0]

    def device_fps_samples(self, frames: np.ndarray, reps: int = 5,
                           passes: int = 1):
        """Sustained device throughput (frames/sec) of the streaming engine
        (the same chunk fn :meth:`run` uses); the LR sequence uploads once,
        the recurrent state chains between reps. One fps sample per pass."""
        t, h, w, _ = frames.shape
        lr = jnp.asarray(frames[:, None], self.dtype)
        return self._fps_samples(lr, 1, t, h, w, reps, passes)

    def device_fps(self, frames: np.ndarray, reps: int = 5) -> float:
        return self.device_fps_samples(frames, reps=reps)[0]
