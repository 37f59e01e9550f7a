"""Incremental per-stream LR frame sources for serving (VERDICT r3 #5).

``cli.serve`` previously materialized every stream fully in host RAM before
the first tick — O(total frames) memory and a long silent startup for video
sources. A :class:`FrameSource` instead decodes its source (PNG directory or
video file) on a worker thread into a bounded queue: memory stays
O(lookahead) per stream, serving starts as soon as the first frame lands,
and a lagging source never blocks the tick loop — :meth:`try_next` is
non-blocking and the engine freezes an omitted stream's slot state
bit-for-bit (serve/engine.py ``active`` mask). This is the reference's
per-frame feed loop (reference main.py:253-270), generalized to N
concurrent sources.

The reversed-[5..1] warm-up protocol (reference dataloader.py:42-44) is
applied in-stream: the producer buffers the first six frames, emits frames
5..1 reversed, then the sequence from frame 0 — identical output order to
``data/inference.py:load_inference_frames(warmup=True)``.
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Iterable, Optional

import numpy as np

#: try_next() result meaning "no frame decoded yet — ask again next tick".
PENDING = object()
#: try_next() result meaning "source exhausted — close the stream".
EOS = object()

_WARMUP = 5  # reversed warm-up prefix length (reference dataloader.py:42-44)


class FrameSource:
    """Bounded-lookahead frame feeder for one serving stream.

    Args:
      src: LR source — a PNG directory or a video file path. ``frames``
        (an iterable of (h, w, 3) arrays) substitutes for tests/live feeds.
      lookahead: producer queue depth; host memory per stream is
        O(lookahead) frames.
      warmup: prepend the reversed-[5..1] warm-up frames (offline-sequence
        semantics; pass False for live sources).
      max_frames: cap on source frames (before warm-up padding); <= 0 means
        the whole source.
      as_uint8: keep frames uint8 (the cheap-upload serving feed).
    """

    def __init__(self, src: Optional[str] = None, lookahead: int = 16,
                 warmup: bool = True, max_frames: int = -1,
                 as_uint8: bool = True,
                 frames: Optional[Iterable[np.ndarray]] = None):
        if (src is None) == (frames is None):
            raise ValueError("pass exactly one of src / frames")
        self.src = src
        self.warmup = _WARMUP if warmup else 0
        self.fps = 0.0
        self.shape: Optional[tuple] = None  # (h, w) after the first frame
        self._frames = frames
        self._max_frames = max_frames
        self._as_uint8 = as_uint8
        self._q: "queue.Queue" = queue.Queue(maxsize=max(2, lookahead))
        self._err: Optional[BaseException] = None
        self._first = threading.Event()
        self._stopped = threading.Event()
        self._thread = threading.Thread(target=self._produce, daemon=True,
                                        name=f"frame-source-{src}")
        self._thread.start()

    # ------------------------------------------------------------ consumer
    @property
    def ready(self) -> bool:
        """True once the first frame decoded (geometry known) — or the
        producer failed, in which case :meth:`geometry` raises."""
        return self._first.is_set()

    def geometry(self, timeout: Optional[float] = None):
        """Block until the first frame decodes; returns (h, w).

        Raises the producer's deferred error if it failed before producing
        anything (missing path, too-short warm-up source, decode error)."""
        if not self._first.wait(timeout):
            raise TimeoutError(f"no frame from {self.src!r} in {timeout}s")
        if self.shape is None:
            assert self._err is not None
            raise self._err
        return self.shape

    def try_next(self):
        """Non-blocking fetch: an (h, w, 3) frame, PENDING when the decoder
        has not caught up, or EOS when the source is exhausted. Producer
        errors re-raise here (after any frames already decoded)."""
        try:
            item = self._q.get_nowait()
        except queue.Empty:
            if not self._thread.is_alive() and self._q.empty():
                # Producer died between its last put and the sentinel.
                if self._err is not None:
                    err, self._err = self._err, None
                    raise err
                return EOS
            return PENDING
        if item is None:
            if self._err is not None:
                err, self._err = self._err, None
                raise err
            return EOS
        return item

    def stop(self) -> None:
        """Abandon the stream: unblock and join the producer."""
        self._stopped.set()
        try:  # unblock a producer parked on a full queue
            self._q.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=30)

    # ------------------------------------------------------------ producer
    def _put(self, frame: np.ndarray) -> bool:
        while not self._stopped.is_set():
            try:
                self._q.put(frame, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def _emit(self, raw) -> bool:
        """Warm-up-aware emission: buffers the first 6 frames, then emits
        [f5..f1 reversed, f0, f1, ...] exactly like load_inference_frames."""
        if self.shape is None:
            self.shape = tuple(np.asarray(raw).shape[:2])
            self._first.set()
        if self.warmup and self._head is not None:
            self._head.append(raw)
            if len(self._head) < _WARMUP + 1:
                return True
            head, self._head = self._head, None
            for f in head[_WARMUP:0:-1] + head:
                if not self._put(f):
                    return False
            return True
        return self._put(raw)

    def _produce(self) -> None:
        self._head: Optional[list] = [] if self.warmup else None
        n = 0
        try:
            for frame in (self._frames if self._frames is not None
                          else self._iter_src()):
                if 0 < self._max_frames <= n:
                    break
                n += 1
                if not self._emit(frame):
                    return  # stopped
            if self.warmup and self._head is not None:
                raise ValueError(
                    f"warm-up needs >= {_WARMUP + 1} frames "
                    f"({len(self._head)} in {self.src!r}); pass "
                    "--no_warmup for short/live sources")
        except BaseException as exc:
            self._err = exc
        finally:
            self._first.set()  # geometry() must not hang on failure
            try:
                self._q.put_nowait(None)
            except queue.Full:
                # stop() drained one slot, or the consumer vanished; the
                # is_alive() check in try_next covers the EOS then.
                pass

    def _iter_src(self):
        if os.path.isfile(self.src):
            yield from self._iter_video()
            return
        yield from self._iter_png_dir()

    def _iter_video(self):
        import cv2

        cap = cv2.VideoCapture(self.src)
        if not cap.isOpened():
            raise ValueError(f"cv2.VideoCapture could not open {self.src}")
        self.fps = float(cap.get(cv2.CAP_PROP_FPS) or 0.0)
        try:
            while True:
                ok, bgr = cap.read()
                if not ok:
                    return
                rgb = np.ascontiguousarray(bgr[:, :, ::-1])
                yield rgb if self._as_uint8 else rgb.astype(np.float32) / 255.0
        finally:
            cap.release()

    def _iter_png_dir(self):
        from tecogan_tpu.data.inference import _native_io
        from tecogan_tpu.ops.image import list_png_in_dir

        paths = list_png_in_dir(self.src, prefix_skip="\x00")
        if not paths:
            raise ValueError(f"no frames in {self.src}")
        io = (_native_io(num_threads=4)
              if all(p.endswith(".png") for p in paths) else None)
        try:
            # Decode in small blocks: the native pool parallelizes within a
            # block while the queue bounds total resident frames.
            block = 4
            for i in range(0, len(paths), block):
                chunk = paths[i:i + block]
                if io is not None:
                    frames = (io.decode_frames_u8(chunk) if self._as_uint8
                              else io.decode_frames(chunk))
                else:
                    import cv2

                    def rd(p):
                        im = cv2.imread(p, 3)[:, :, ::-1]
                        return (im if self._as_uint8
                                else im.astype(np.float32) / 255.0)

                    frames = [rd(p) for p in chunk]
                for f in frames:
                    yield np.ascontiguousarray(f)
        finally:
            if io is not None:
                io.close()
