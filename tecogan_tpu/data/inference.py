"""Inference-time frame I/O (parity with reference dataloader.py:11-50 and
the per-frame save loop main.py:253-270).

- lists PNGs with numeric-aware sort
- optional HR->LR path: Gaussian blur (sigma 1.5) + 4x subsample when only an
  HR directory is given
- prepends reversed frames [5..1] as warm-up padding
- decodes through the native libpng thread pool when available (bit-identical
  to the cv2 path; data/native_loader.py), cv2 otherwise
- :class:`FrameWriter` encodes HR PNGs on a background thread so host I/O
  overlaps device compute (the reference writes each frame inline on the
  session thread, main.py:262-269)
"""

from __future__ import annotations

import os
import queue
import threading
from typing import List, NamedTuple, Optional

import numpy as np

from tecogan_tpu.ops.image import list_png_in_dir
from tecogan_tpu.recurrent.inference import prepend_warmup


class InferenceData(NamedTuple):
    paths_lr: List[str]
    inputs: np.ndarray  # (T, h, w, 3) [0, 1] f32 or raw uint8, warm-up included
    fps: float = 0.0  # source frame rate (video-file input only; 0 = unknown)


def _native_io(num_threads: int = 8):
    try:
        from tecogan_tpu.data import native_loader as nl
    except ImportError as exc:
        print(f"inference IO: native decoder unavailable ({exc}); using cv2")
        return None
    try:
        return nl.NativeFrameIO(num_threads)
    except nl.UNAVAILABLE_ERRORS as exc:
        print("inference IO: native decoder unavailable "
              f"({nl.unavailable_detail(exc)}); using cv2")
        return None


def load_inference_frames(
    input_dir_lr: Optional[str] = None,
    input_dir_hr: Optional[str] = None,
    max_frames: int = -1,
    warmup: bool = True,
    as_uint8: bool = False,
    use_native: bool = True,
    input_video: Optional[str] = None,
) -> InferenceData:
    """Load the LR input sequence.

    ``as_uint8`` keeps the LR frames as raw uint8 (the PNG's own precision)
    so uploads cost 4x less; StreamingSR normalizes on device bit-identically.
    Ignored on the HR->LR Gaussian path, which is float by construction
    (reference dataloader.py:34-36).

    ``input_video`` decodes a video file instead of a PNG directory
    (data/video_io.py — a capability the reference lacks); the same
    reversed-[5..1] warm-up protocol applies.
    """
    import cv2

    if input_video:
        from tecogan_tpu.data.video_io import read_video_frames

        frames, fps = read_video_frames(
            input_video, max_frames=max_frames, as_uint8=as_uint8)
        paths = [f"{input_video}#{i}" for i in range(frames.shape[0])]
        if warmup:
            if frames.shape[0] < 6:
                raise ValueError(
                    "warm-up needs >= 6 frames "
                    f"({frames.shape[0]} in {input_video})")
            paths = prepend_warmup(paths)
            frames = np.concatenate([frames[5:0:-1], frames], axis=0)
        return InferenceData(paths_lr=paths,
                             inputs=np.ascontiguousarray(frames), fps=fps)

    filedir, down_sp = input_dir_lr, False
    if filedir is None or not os.path.exists(filedir):
        if input_dir_hr is None or not os.path.exists(input_dir_hr):
            raise ValueError("Input directory not found")
        filedir, down_sp = input_dir_hr, True

    paths = list_png_in_dir(filedir, prefix_skip="\x00")  # no IB-skip here
    if max_frames > 0:
        paths = paths[:max_frames]

    frames = None
    if not down_sp and use_native and all(p.endswith(".png") for p in paths):
        io = _native_io()
        if io is not None:
            try:
                if as_uint8:
                    # straight uint8 decode — no float round-trip
                    frames = io.decode_frames_u8(paths)
                else:
                    frames = io.decode_frames(paths)  # (T, h, w, 3) f32 [0,1]
            finally:
                io.close()

    if frames is None:
        def read(p):
            im = cv2.imread(p, 3)[:, :, ::-1]
            if down_sp:  # reference dataloader.py:34-36
                return cv2.GaussianBlur(
                    im.astype(np.float32), (0, 0), sigmaX=1.5
                )[::4, ::4, :] / 255.0
            if as_uint8:
                return im
            return im.astype(np.float32) / 255.0
        frames = np.stack([read(p) for p in paths])

    if warmup:
        paths = prepend_warmup(paths)
        # host-side numpy; the negative-step restriction is device-only
        frames = np.concatenate([frames[5:0:-1], frames], axis=0)
    return InferenceData(paths_lr=paths, inputs=np.ascontiguousarray(frames))


class AsyncChunkWriter:
    """Background HR-chunk writer skeleton: a bounded queue feeds a worker
    thread so host encoding overlaps device compute; errors are deferred to
    ``close()``. Subclasses implement ``_write(frames, start)`` (and
    optionally ``_finalize()``); shared by :class:`FrameWriter` and
    data/video_io.py:VideoFrameWriter."""

    def __init__(self, depth: int = 4):
        self.count = 0
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._err: List[BaseException] = []
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def _write(self, frames: np.ndarray, start: int) -> None:
        raise NotImplementedError

    def _finalize(self) -> None:
        """Release encoder resources; runs even when a write failed."""

    def _loop(self):
        while True:
            item = self._q.get()
            if item is None:
                return
            try:
                self._write(*item)
            except BaseException as exc:  # surfaced by close()
                self._err.append(exc)

    def submit(self, frames: np.ndarray, start_index: int) -> None:
        """frames: (n, H, W, 3) uint8, output indices start_index..+n
        (including warm-up; the warm-up prefix must already be dropped —
        StreamingSR.run's on_chunk contract)."""
        self._q.put((frames, start_index))

    def close(self) -> int:
        """Flush, join, raise any deferred encode error; returns #frames."""
        self._q.put(None)
        self._thread.join()
        self._finalize()
        if self._err:
            raise self._err[0]
        return self.count


class FrameWriter(AsyncChunkWriter):
    """Background HR-frame PNG writer with native (libpng pool) encode.

    ``submit(frames, start_index)`` enqueues a fetched chunk; a worker
    thread encodes it (ctypes releases the GIL, so the n-thread C++ pool
    runs truly parallel) while the device computes the next chunk. Falls
    back to cv2.imwrite for non-PNG extensions or when the native library
    is unavailable. ``start_index`` counts output frames including the
    warm-up prefix; filenames are numbered from 0 after it (reference
    main.py:262-269 skips the first 5 warm-up outputs the same way).
    """

    def __init__(self, out_dir: str, name: str = "output", ext: str = "png",
                 warmup: int = 0, num_threads: int = 8, depth: int = 4):
        os.makedirs(out_dir, exist_ok=True)
        self.out_dir = out_dir
        self.name = name
        self.ext = ext
        self.warmup = warmup
        self._native = _native_io(num_threads) if ext == "png" else None
        super().__init__(depth=depth)

    def _path(self, out_idx: int) -> str:
        return os.path.join(self.out_dir,
                            f"{self.name}_{out_idx:04d}.{self.ext}")

    def _write(self, frames: np.ndarray, start: int) -> None:
        # Device-array chunks (VSRServer.step(fetch=False)) materialize
        # HERE, on the writer thread — the download overlaps the next tick.
        frames = np.ascontiguousarray(frames)
        first = start - self.warmup
        paths = [self._path(first + i) for i in range(frames.shape[0])]
        if self._native is not None:
            self._native.encode_frames(paths, frames)
        else:
            import cv2

            for p, f in zip(paths, frames):
                cv2.imwrite(p, f[:, :, ::-1])
        self.count += len(paths)

    def _finalize(self) -> None:
        if self._native is not None:
            self._native.close()
