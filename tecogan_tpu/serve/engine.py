"""Multi-stream VSR serving engine (continuous batching).

The reference serves exactly one video per process: a Python loop feeding
one frame at a time through ``sess.run`` (reference main.py:253-270). A TPU
chip at that batch size leaves most of the MXU idle (BASELINE.md
"multi-stream saturation": B=1 runs the generator at ~18 TF/s vs its ~31
TF/s B>=4 ceiling), so production serving wants N independent streams
batched into ONE recurrent step.

:class:`VSRServer` does that with static shapes (XLA compiles the step
once): a fixed pool of ``max_streams`` slots, each holding one stream's
recurrent state (``prev_lr``/``prev_hr``) resident in HBM. Streams attach
and detach at any time; every tick runs one batched frame step and three
masks reconcile the dynamic reality with the static batch:

- ``reset``: slots whose stream delivered its first frame restart from the
  zero state (the reference's first-frame convention, main.py:197-199).
- ``active``: slots with no frame this tick keep their state bit-for-bit
  (the step computes on their stale inputs — constant cost — and the
  result is masked out; per-slot dynamic shapes would force a recompile
  per activity pattern and serialize the batch).
- absent/closed slots simply hold zeros.

The per-frame math is identical to the streaming engine's scan body
(recurrent/inference.py:run_chunk): fused warp + space-to-depth, or the
mid-band s2d fold into the stride-4 HR input conv when the frame geometry
is in the measured win band (fold_s2d_active), and device-side uint8
quantization of outputs (4x less device->host traffic).
"""

from __future__ import annotations

import functools
import threading
from typing import Dict, Iterable, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tecogan_tpu.config import TecoConfig
from tecogan_tpu.models import FNet, Generator
from tecogan_tpu.models.generator import generator_apply_hr_input
from tecogan_tpu.ops import deprocess
from tecogan_tpu.ops.warp import dense_image_warp, warp_space_to_depth
from tecogan_tpu.recurrent.inference import fold_s2d_active, s2d_mode_for
from tecogan_tpu.recurrent.step import RecurrentState, init_state, upscale_flow


def build_frame_fn(config: TecoConfig, gen_apply, fnet_apply,
                   output: str = "uint8"):
    """The single-frame serving body, shared by :class:`VSRServer` and the
    AOT export path (serve/export.py).

    Returns ``fn(gen_params, fnet_params, state, lr) -> (state, out)`` where
    ``lr`` is (B, h, w, 3) uint8 or float in [0, 1] and ``out`` is the HR
    batch (B, 4h, 4w, 3) — uint8 (reference ops.py:520-523 quantization) or
    float32 in [0, 1] per ``output``. Semantically the streaming scan body
    of recurrent/inference.py:run_chunk for one frame.
    """
    if output not in ("float32", "uint8"):
        raise ValueError(f"output must be float32|uint8, got {output}")
    compute_dtype = jnp.dtype(config.compute_dtype)
    max_disp = 4.0 * config.flow_max_velocity
    num_rb = config.num_resblock

    def frame_fn(gen_params, fnet_params, state, lr):
        if lr.dtype == jnp.uint8:
            # Device-side /255 (1-ulp reciprocal-multiply skew vs host
            # division; bound pinned in tests/test_recurrent.py).
            lr = (lr.astype(jnp.float32) / 255.0).astype(compute_dtype)
        else:
            lr = lr.astype(compute_dtype)
        _, h, w, _ = lr.shape
        flow_lr = fnet_apply(
            {"params": fnet_params},
            jnp.concatenate([state.prev_lr, lr], axis=-1))
        flow_hr = upscale_flow(flow_lr, h, w)
        if fold_s2d_active(config, h, w):
            warped = dense_image_warp(state.prev_hr, flow_hr,
                                      max_displacement=max_disp)
            gen_out = generator_apply_hr_input(
                gen_params, lr, warped, num_resblock=num_rb,
                s2d_mode=s2d_mode_for(config))
        else:
            packed = warp_space_to_depth(state.prev_hr, flow_hr, 4,
                                         max_displacement=max_disp)
            gen_out = gen_apply(
                {"params": gen_params},
                jnp.concatenate([lr, packed], axis=-1))
        hr = deprocess(gen_out)
        if output == "uint8":
            out = jnp.clip(hr.astype(jnp.float32) * 255.0, 0.0, 255.0
                           ).astype(jnp.uint8)
        else:
            out = hr.astype(jnp.float32)
        return RecurrentState(prev_lr=lr, prev_hr=hr), out

    return frame_fn


class VSRServer:
    """Continuous-batching 4x VSR server over a fixed slot pool.

    Args:
      config: model/runtime configuration (geometry-independent).
      gen_params / fnet_params: parameter pytrees.
      height / width: LR frame geometry (static; one compiled step).
      max_streams: slot-pool size = the served batch. Aggregate throughput
        saturates by ~4-8 slots on one chip (BASELINE.md); size larger
        pools across chips via the parallel/ layer instead.
      output: "uint8" (device-quantized, the PNG byte format) or "float32".
    """

    def __init__(self, config: TecoConfig, gen_params, fnet_params,
                 height: int, width: int, max_streams: int = 4,
                 output: str = "uint8", mesh=None):
        """``mesh``: optional Mesh with a ``config.dp_axis`` axis — the slot
        pool is sharded across it (params replicated, state/frames/outputs
        split on the slot dim), scaling aggregate serving throughput
        linearly with chips since streams are independent. One chip
        saturates at ~4-8 slots (BASELINE.md "multi-stream saturation");
        this is the scale-out past that."""
        # Any geometry works: FNet's decoder output is symmetric-padded back
        # to (h, w) by upscale_flow/pad_flow_to when maxpool floors odd dims
        # (the calendar protocol itself is 144x180).
        if mesh is not None and max_streams % mesh.shape[config.dp_axis]:
            raise ValueError(
                f"max_streams={max_streams} must divide evenly across the "
                f"{mesh.shape[config.dp_axis]}-device '{config.dp_axis}' axis")
        self.config = config
        self.height, self.width = height, width
        self.max_streams = max_streams
        self.output = output
        dtype = jnp.dtype(config.compute_dtype)
        generator = Generator(num_resblock=config.num_resblock,
                              channels=config.gen_channels, dtype=dtype)
        fnet = FNet(channels=config.fnet_channels,
                    up_channels=config.fnet_up_channels,
                    max_velocity=config.flow_max_velocity, dtype=dtype)
        self.gen_params = gen_params
        self.fnet_params = fnet_params
        frame_fn = build_frame_fn(config, generator.apply, fnet.apply,
                                  output=output)

        def server_step(gen_p, fnet_p, state, lr, reset, active):
            rm = reset[:, None, None, None]
            base = RecurrentState(
                prev_lr=jnp.where(rm, jnp.zeros_like(state.prev_lr),
                                  state.prev_lr),
                prev_hr=jnp.where(rm, jnp.zeros_like(state.prev_hr),
                                  state.prev_hr),
            )
            stepped, out = frame_fn(gen_p, fnet_p, base, lr)
            am = active[:, None, None, None]
            new_state = RecurrentState(
                prev_lr=jnp.where(am, stepped.prev_lr, base.prev_lr),
                prev_hr=jnp.where(am, stepped.prev_hr, base.prev_hr),
            )
            return new_state, out

        if mesh is None:
            self._step = jax.jit(server_step, donate_argnums=(2,))
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(mesh, P())
            slot = NamedSharding(mesh, P(config.dp_axis))
            st_sh = RecurrentState(prev_lr=slot, prev_hr=slot)
            self._step = jax.jit(
                server_step, donate_argnums=(2,),
                in_shardings=(repl, repl, st_sh, slot, slot, slot),
                out_shardings=(st_sh, slot))
        self._state = init_state(max_streams, height, width, dtype)
        self._slot_of: Dict[object, int] = {}
        self._fresh: Dict[object, bool] = {}
        self._free = list(range(max_streams - 1, -1, -1))  # pop() -> slot 0 first
        # Serializes state-donating dispatches: a background prewarm
        # (MultiGeometryServer.prewarm(background=True)) may race a tick.
        self._dispatch_lock = threading.Lock()

    def prewarm(self, frame_dtype=np.uint8) -> None:
        """Compile + warm-execute the serving step before the first tick.

        The reference builds its whole graph before the serve loop
        (main.py:187-245); lazily, the first stream of a geometry would
        stall its first tick for a full XLA compile (tens of seconds for a
        16-resblock step). One all-inactive tick here takes the compile
        (and, via utils/compilation_cache.py, the persistent-cache write)
        off the serving path; ``active`` all-False keeps every slot's state
        bit-identical, so this is safe at any point in the server's life.

        ``frame_dtype``: the tick dtype to compile for (the step signature
        is dtype-static; uint8 is the production feed).
        """
        lr = jnp.zeros((self.max_streams, self.height, self.width, 3),
                       frame_dtype)
        mask = jnp.zeros((self.max_streams,), bool)
        with self._dispatch_lock:
            self._state, out = self._step(self.gen_params, self.fnet_params,
                                          self._state, lr, mask, mask)
        jax.block_until_ready(out)

    # ------------------------------------------------------------ lifecycle
    def open(self, stream_id) -> int:
        """Attach a stream; returns its slot. Raises when the pool is full
        (admission control is the caller's policy — queue or shed)."""
        if stream_id in self._slot_of:
            raise ValueError(f"stream {stream_id!r} already open")
        if not self._free:
            raise RuntimeError(
                f"no free slots (max_streams={self.max_streams})")
        slot = self._free.pop()
        self._slot_of[stream_id] = slot
        self._fresh[stream_id] = True
        return slot

    def close(self, stream_id) -> None:
        """Detach a stream and free its slot (state is reset on reuse)."""
        slot = self._slot_of.pop(stream_id)
        self._fresh.pop(stream_id, None)
        self._free.append(slot)

    @property
    def open_streams(self):
        return tuple(self._slot_of)

    # ------------------------------------------------------------- serving
    def step(self, frames: Mapping[object, np.ndarray], fetch: bool = True
             ) -> Dict[object, np.ndarray]:
        """Advance every stream that delivered a frame by one step.

        Args:
          frames: {stream_id: (h, w, 3) LR frame}, uint8 or float32 in
            [0, 1] (all the same dtype). Streams must be ``open``; streams
            omitted this tick keep their state untouched.
          fetch: True returns host numpy arrays (one synchronous download
            per tick). False returns per-stream device-array views and the
            caller materializes them (``np.asarray``) when convenient —
            e.g. on a writer thread, overlapping the HR download with the
            next tick's compute. The views stay valid across later ticks
            (only the recurrent state buffer is donated, not the outputs).

        Returns:
          {stream_id: (4h, 4w, 3) HR frame} per ``output`` dtype.
        """
        if not frames:
            return {}
        ids = list(frames)
        missing = [s for s in ids if s not in self._slot_of]
        if missing:
            raise KeyError(f"streams not open: {missing}")
        first = np.asarray(frames[ids[0]])
        if first.dtype not in (np.uint8, np.float32):
            raise ValueError(
                f"frames must be uint8 or float32 in [0, 1], got "
                f"{first.dtype} (cast float inputs to float32)")
        np_dtype = first.dtype.type
        lr = np.zeros((self.max_streams, self.height, self.width, 3),
                      np_dtype)
        reset = np.zeros((self.max_streams,), bool)
        active = np.zeros((self.max_streams,), bool)
        for sid in ids:
            slot = self._slot_of[sid]
            frame = np.asarray(frames[sid])
            if frame.shape != (self.height, self.width, 3):
                raise ValueError(
                    f"stream {sid!r}: frame shape {frame.shape} != "
                    f"({self.height}, {self.width}, 3)")
            if frame.dtype != np_dtype:
                raise ValueError("mixed frame dtypes in one tick")
            lr[slot] = frame
            active[slot] = True
            if self._fresh.get(sid):
                reset[slot] = True
        with self._dispatch_lock:
            self._state, out = self._step(
                self.gen_params, self.fnet_params, self._state,
                jnp.asarray(lr), jnp.asarray(reset), jnp.asarray(active))
        if fetch:
            out = np.asarray(jax.device_get(out))
        for sid in ids:
            self._fresh[sid] = False
        return {sid: out[self._slot_of[sid]] for sid in ids}


class MultiGeometryServer:
    """Continuous batching across streams of heterogeneous LR geometries.

    XLA compiles one program per static shape, so a single slot pool cannot
    mix frame sizes — but a production endpoint receives 144x180 and
    540x960 streams alike. Streams are therefore bucketed by their LR
    ``(height, width)``: each geometry lazily gets its own
    :class:`VSRServer` slot pool (one compiled step per geometry, cached by
    XLA across the process) and one :meth:`step` fans the tick's frames out
    to the buckets that received any. All buckets share the same parameter
    pytrees and config; per-stream semantics are exactly
    :class:`VSRServer`'s (i.e. the reference loop, main.py:253-270).

    Bucket steps are dispatched asynchronously back-to-back and fetched
    after the last dispatch, so multi-bucket ticks overlap their HR
    downloads with the remaining buckets' compute.

    Args:
      slots_per_geometry: slot-pool size of each geometry bucket. One chip
        saturates at ~4-8 concurrent calendar-sized streams (BASELINE.md
        "multi-stream saturation"); big-frame buckets saturate earlier.
        Buckets are created on demand; idle buckets (no open streams) are
        evicted least-recently-used when a new geometry would push the
        resident state past ``state_budget_mb`` (their compiled step stays
        in XLA's in-process cache, so re-attaching the geometry later pays
        only the state re-allocation, not a recompile).
      state_budget_mb: cap on the total device bytes this server pins
        across geometry buckets — each bucket's cost is knowable at open()
        time: slot-pool recurrent state (``prev_lr``+``prev_hr`` =
        51·h·w·itemsize per slot) plus the per-tick LR-input and HR-output
        buffers (estimated by :meth:`bucket_bytes`). Opening a geometry
        that cannot fit even after evicting every idle bucket raises
        RuntimeError with the computed numbers (admission control — a
        many-geometry workload must not OOM the chip silently). ``None``
        disables the guard. With a ``mesh``, the budget is interpreted
        per-device (state is sharded over the dp axis, so each device pins
        ``bucket_bytes / n_devices``).
    """

    def __init__(self, config: TecoConfig, gen_params, fnet_params,
                 slots_per_geometry: int = 4, output: str = "uint8",
                 mesh=None, state_budget_mb: Optional[float] = 2048.0):
        self.config = config
        self.gen_params = gen_params
        self.fnet_params = fnet_params
        self.slots_per_geometry = slots_per_geometry
        self.output = output
        self.mesh = mesh
        self.state_budget_mb = state_budget_mb
        self._buckets: Dict[Tuple[int, int], VSRServer] = {}
        self._geo_of: Dict[object, Tuple[int, int]] = {}
        self._bucket_lock = threading.Lock()
        self._use_clock = 0  # LRU ordinal for idle-bucket eviction
        self._last_use: Dict[Tuple[int, int], int] = {}

    def bucket_bytes(self, height: int, width: int) -> int:
        """Device bytes one (height, width) bucket pins while resident:
        the slot pool's recurrent state (prev_lr (h,w,3) + prev_hr
        (4h,4w,3) = 51·h·w·itemsize per slot) plus one tick's LR-input and
        HR-output buffers. Compiled-program temps are excluded (XLA frees
        them between executions); with a mesh, divide by the dp-axis size
        for the per-device share."""
        hw = int(height) * int(width)
        item = jnp.dtype(self.config.compute_dtype).itemsize
        state = 51 * hw * item
        out_item = 1 if self.output == "uint8" else 4
        tick_io = 3 * hw * 1 + 48 * hw * out_item  # uint8 LR in, HR out
        total = self.slots_per_geometry * (state + tick_io)
        if self.mesh is not None:
            total //= int(self.mesh.shape[self.config.dp_axis])
        return total

    @property
    def footprint_bytes(self) -> int:
        """Total estimated device bytes across instantiated buckets
        (per-device when sharded over a mesh)."""
        return sum(self.bucket_bytes(h, w) for h, w in self._buckets)

    def _bucket(self, geo: Tuple[int, int]) -> VSRServer:
        with self._bucket_lock:
            srv = self._buckets.get(geo)
            if srv is None:
                self._admit_locked(geo)
                srv = self._buckets[geo] = VSRServer(
                    self.config, self.gen_params, self.fnet_params,
                    geo[0], geo[1], max_streams=self.slots_per_geometry,
                    output=self.output, mesh=self.mesh)
            self._use_clock += 1
            self._last_use[geo] = self._use_clock
        return srv

    def _admit_locked(self, geo: Tuple[int, int]) -> None:
        """Fit a new geometry under ``state_budget_mb``: evict idle buckets
        LRU-first, refuse with the computed bytes if that is not enough.
        Caller holds ``_bucket_lock``."""
        if self.state_budget_mb is None:
            return
        budget = int(self.state_budget_mb * 2**20)
        need = self.bucket_bytes(*geo)
        if need > budget:
            raise RuntimeError(
                f"geometry {geo} alone needs ~{need / 2**20:.1f} MB of "
                f"device state ({self.slots_per_geometry} slots) — over the "
                f"{self.state_budget_mb:.0f} MB state_budget_mb; lower "
                f"slots_per_geometry or raise the budget")
        idle = sorted(
            (g for g, srv in self._buckets.items() if not srv.open_streams),
            key=lambda g: self._last_use.get(g, 0))
        while self.footprint_bytes + need > budget and idle:
            g = idle.pop(0)
            del self._buckets[g]  # device state freed on GC; compiled
            self._last_use.pop(g, None)  # step stays in XLA's cache
        if self.footprint_bytes + need > budget:
            busy = {g: f"{self.bucket_bytes(*g) / 2**20:.1f} MB"
                    for g in self._buckets}
            raise RuntimeError(
                f"opening geometry {geo} (~{need / 2**20:.1f} MB) would put "
                f"the server at "
                f"{(self.footprint_bytes + need) / 2**20:.1f} MB resident "
                f"state, over state_budget_mb={self.state_budget_mb:.0f} and "
                f"every remaining bucket has open streams: {busy}. Close "
                f"streams, lower slots_per_geometry, or raise the budget.")

    def prewarm(self, geometries: Iterable[Tuple[int, int]],
                frame_dtype=np.uint8, background: bool = False):
        """Compile-ahead for a declared geometry menu (VERDICT r3 #3).

        Instantiates each ``(height, width)`` bucket and runs its
        all-inactive warm tick (:meth:`VSRServer.prewarm`), so no stream's
        first tick stalls on an XLA compile — the reference likewise builds
        its graph once before the serve loop (main.py:187-245).

        ``background=True`` returns a started daemon thread that warms the
        menu while already-compiled buckets keep serving (per-bucket
        dispatch locks make the overlap safe); join it to wait. Foreground
        returns None when done.
        """
        geos = [(int(h), int(w)) for h, w in geometries]

        def work():
            for geo in geos:
                self._bucket(geo).prewarm(frame_dtype)

        if background:
            t = threading.Thread(target=work, daemon=True,
                                 name="tecogan-serve-prewarm")
            t.start()
            return t
        work()
        return None

    # ------------------------------------------------------------ lifecycle
    def open(self, stream_id, height: int, width: int) -> int:
        """Attach a stream of LR geometry (height, width); returns its slot
        within the geometry's bucket. Raises RuntimeError when that bucket
        is full (admission control is the caller's policy)."""
        if stream_id in self._geo_of:
            raise ValueError(f"stream {stream_id!r} already open")
        geo = (int(height), int(width))
        slot = self._bucket(geo).open(stream_id)
        self._geo_of[stream_id] = geo
        return slot

    def close(self, stream_id) -> None:
        geo = self._geo_of.pop(stream_id)
        self._buckets[geo].close(stream_id)

    def free_slots(self, height: int, width: int) -> int:
        """Free slots in the (height, width) bucket — full pool size when
        the bucket does not exist yet."""
        srv = self._buckets.get((int(height), int(width)))
        if srv is None:
            return self.slots_per_geometry
        return self.slots_per_geometry - len(srv.open_streams)

    @property
    def open_streams(self):
        return tuple(self._geo_of)

    @property
    def geometries(self):
        """Instantiated buckets as {(height, width): (open, capacity)}."""
        return {geo: (len(srv.open_streams), self.slots_per_geometry)
                for geo, srv in self._buckets.items()}

    # ------------------------------------------------------------- serving
    def step(self, frames: Mapping[object, np.ndarray], fetch: bool = True
             ) -> Dict[object, np.ndarray]:
        """Advance every stream that delivered a frame (any mix of
        geometries) by one step; same contract as :meth:`VSRServer.step`."""
        if not frames:
            return {}
        by_geo: Dict[Tuple[int, int], Dict[object, np.ndarray]] = {}
        for sid, frame in frames.items():
            geo = self._geo_of.get(sid)
            if geo is None:
                raise KeyError(f"streams not open: [{sid!r}]")
            by_geo.setdefault(geo, {})[sid] = frame
        # Dispatch every bucket before materializing any output: JAX async
        # dispatch overlaps bucket k's HR download with bucket k+1's step.
        with self._bucket_lock:
            self._use_clock += 1
            for geo in by_geo:
                self._last_use[geo] = self._use_clock
        parts = [self._buckets[geo].step(fs, fetch=False)
                 for geo, fs in by_geo.items()]
        out: Dict[object, np.ndarray] = {}
        for part in parts:
            for sid, hr in part.items():
                out[sid] = np.asarray(jax.device_get(hr)) if fetch else hr
        return out
