"""Direct video-file inference I/O (capability extension over the reference).

The reference operates only on PNG frame directories — video files must be
pre-exploded to frames by hand (its dataPrepare.py uses cv2.VideoCapture for
dataset cutting only, reference lib/data/video.py:168-173). Here the same
cv2 container decode/encode feeds :class:`StreamingSR` directly:

- :func:`read_video_frames` — decode a video file to the (T, h, w, 3) RGB
  array the streaming engine consumes (uint8 by default, matching the
  uint8-upload path).
- :class:`VideoFrameWriter` — encode HR chunks to a video container on a
  background thread (same ``submit(frames, start_index)`` contract as
  data/inference.py:FrameWriter, so it drops into the on_chunk overlap
  pipeline unchanged).

Codecs: cv2's bundled ffmpeg here supports mp4v (.mp4) and MJPG/XVID
(.avi); the writer picks by extension and fails fast with the probe list
if the container cannot be opened.
"""

from __future__ import annotations

import os
from typing import List, Tuple

import numpy as np

from tecogan_tpu.data.inference import AsyncChunkWriter

#: fourcc candidates per output extension, tried in order.
_FOURCC_BY_EXT = {
    ".mp4": ("mp4v",),
    ".m4v": ("mp4v",),
    ".avi": ("MJPG", "XVID"),
    ".mkv": ("mp4v", "MJPG"),
}


def read_video_frames(
    path: str,
    max_frames: int = -1,
    as_uint8: bool = True,
) -> Tuple[np.ndarray, float]:
    """Decode ``path`` to ``(frames, fps)``.

    frames: (T, h, w, 3) RGB, uint8 (or f32 [0,1] when ``as_uint8=False``);
    fps: the container frame rate (0.0 if the container does not report one).
    """
    import cv2

    if not os.path.exists(path):
        raise FileNotFoundError(f"video not found: {path}")
    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise ValueError(f"cv2.VideoCapture could not open {path}")
    fps = float(cap.get(cv2.CAP_PROP_FPS) or 0.0)
    frames: List[np.ndarray] = []
    # max_frames <= 0 means unlimited (same contract as the PNG-directory
    # path in data/inference.py:load_inference_frames).
    while max_frames <= 0 or len(frames) < max_frames:
        ok, bgr = cap.read()
        if not ok:
            break
        frames.append(np.ascontiguousarray(bgr[:, :, ::-1]))
    cap.release()
    if not frames:
        raise ValueError(f"no frames decoded from {path}")
    out = np.stack(frames)
    if not as_uint8:
        out = out.astype(np.float32) / 255.0
    return out, fps


def _fourccs_for(path: str) -> Tuple[str, ...]:
    ext = os.path.splitext(path)[1].lower()
    fourccs = _FOURCC_BY_EXT.get(ext)
    if fourccs is None:
        raise ValueError(
            f"unsupported video extension {ext!r}; "
            f"choose one of {sorted(_FOURCC_BY_EXT)}")
    return fourccs


def _open_writer(path: str, fps: float, size_wh: Tuple[int, int]):
    import cv2

    fourccs = _fourccs_for(path)
    for cc in fourccs:
        w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*cc), fps, size_wh)
        if w.isOpened():
            return w
        w.release()
    raise ValueError(
        f"no working codec for {path} (tried {fourccs}); "
        "use .mp4 (mp4v) or .avi (MJPG/XVID)")


class VideoFrameWriter(AsyncChunkWriter):
    """Background HR-chunk video encoder.

    Shares data/inference.py:AsyncChunkWriter's ``submit``/``close``
    contract so cli.main's decode -> device -> encode overlap works
    unchanged for video output. Chunks arrive in stream order
    (StreamingSR.run iterates chunks sequentially), so a single sequential
    container writer is sound; the first chunk must start exactly at
    ``warmup`` (the index of the first post-warm-up output) and any
    start_index gap raises at close(). The output extension is validated
    here in the constructor, before any decode/compile/compute is spent.
    """

    def __init__(self, path: str, fps: float = 24.0, warmup: int = 0,
                 depth: int = 4):
        _fourccs_for(path)  # fail fast on unsupported extensions
        if os.path.dirname(path):
            os.makedirs(os.path.dirname(path), exist_ok=True)
        self.path = path
        self.fps = fps if fps > 0 else 24.0
        self.warmup = warmup
        self._writer = None  # opened lazily on the first chunk (needs H, W)
        self._next_start: int = warmup
        super().__init__(depth=depth)

    def _write(self, frames: np.ndarray, start: int) -> None:
        # Device-array chunks (VSRServer.step(fetch=False)) materialize
        # HERE, on the writer thread — the download overlaps the next tick.
        frames = np.ascontiguousarray(frames)
        if start != self._next_start:
            raise ValueError(
                f"out-of-order chunk: start {start}, expected "
                f"{self._next_start} (video output must be sequential)")
        self._next_start = start + frames.shape[0]
        if self._writer is None:
            h, w = frames.shape[1:3]
            self._writer = _open_writer(self.path, self.fps, (w, h))
        for f in frames:
            self._writer.write(np.ascontiguousarray(f[:, :, ::-1]))
        self.count += frames.shape[0]

    def _finalize(self) -> None:
        if self._writer is not None:
            self._writer.release()
