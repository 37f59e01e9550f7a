"""ctypes bindings for the native data-loader core (tecogan_tpu/native/tecodata.cpp).

The C++ library plays the role TensorFlow's C++ queue runners play in the
reference input pipeline (reference lib/dataloader.py:163-165,268-270):
GIL-free threaded PNG decode, crop/flip, float conversion and batch assembly.
Augmentation decisions come from Python as :class:`SeqPlan`s, so a native
batch is bit-identical to the python executor's for the same seed
(tests/test_native_loader.py asserts this).

The shared library is built on demand from source with the system toolchain
(g++ + libpng); if the build fails, callers should fall back to the python
executor (``BatchLoader(executor="python")``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Sequence

import numpy as np

_NATIVE_DIR = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "native"))
_BUILD_LOCK = threading.Lock()
_LIB = None


def _so_path() -> str:
    """Where to build/find libtecodata.so: next to the source in a writable
    checkout (dev layout, matches `make -C tecogan_tpu/native`), else a user
    cache dir (wheel installs land in read-only site-packages)."""
    if os.access(_NATIVE_DIR, os.W_OK):
        return os.path.join(_NATIVE_DIR, "libtecodata.so")
    cache = os.path.join(
        os.environ.get("XDG_CACHE_HOME",
                       os.path.join(os.path.expanduser("~"), ".cache")),
        "tecogan_tpu")
    os.makedirs(cache, exist_ok=True)
    return os.path.join(cache, "libtecodata.so")


_SO_PATH = _so_path()


def build_library(force: bool = False) -> str:
    """Compile tecogan_tpu/native/tecodata.cpp -> libtecodata.so (idempotent)."""
    src = os.path.join(_NATIVE_DIR, "tecodata.cpp")
    with _BUILD_LOCK:
        if force or not os.path.exists(_SO_PATH) or (
            os.path.getmtime(src) > os.path.getmtime(_SO_PATH)
        ):
            subprocess.run(
                ["g++", "-O3", "-fPIC", "-std=c++17", "-shared",
                 "-o", _SO_PATH, src, "-lpng", "-pthread"],
                check=True, capture_output=True,
            )
    return _SO_PATH


def load_library() -> ctypes.CDLL:
    global _LIB
    if _LIB is None:
        lib = ctypes.CDLL(build_library())
        lib.td_open.restype = ctypes.c_void_p
        lib.td_open.argtypes = [ctypes.c_int]
        lib.td_open_cached.restype = ctypes.c_void_p
        lib.td_open_cached.argtypes = [ctypes.c_int, ctypes.c_int]
        lib.td_close.argtypes = [ctypes.c_void_p]
        lib.td_decode.restype = ctypes.c_int
        lib.td_decode.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.c_int,
        ]
        lib.td_png_dims.restype = ctypes.c_int
        lib.td_png_dims.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.td_load_batch.restype = ctypes.c_int
        lib.td_load_batch.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ]
        lib.td_load_batch_u8.restype = ctypes.c_int
        lib.td_load_batch_u8.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.td_decode_frames.restype = ctypes.c_int
        lib.td_decode_frames.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ]
        lib.td_decode_frames_u8.restype = ctypes.c_int
        lib.td_decode_frames_u8.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ]
        lib.td_encode_frames.restype = ctypes.c_int
        lib.td_encode_frames.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int,
        ]
        _LIB = lib
    return _LIB


#: Exceptions that mean "the native library can't be built/loaded here"
#: (fallback-to-python set; anything else is a real bug and must raise).
UNAVAILABLE_ERRORS = (ImportError, OSError, subprocess.CalledProcessError)


def unavailable_detail(exc: BaseException):
    """Human-readable cause for an UNAVAILABLE_ERRORS failure (g++ stderr
    for build failures, the exception itself otherwise)."""
    if isinstance(exc, subprocess.CalledProcessError) and exc.stderr:
        return exc.stderr.decode(errors="replace").strip()
    return exc


def native_available() -> bool:
    try:
        load_library()
        return True
    except Exception:
        return False


def png_dims(path: str) -> tuple:
    """Read only the PNG header -> (H, W)."""
    lib = load_library()
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.td_png_dims(path.encode(), ctypes.byref(h), ctypes.byref(w))
    if rc != 0:
        raise IOError(f"td_png_dims failed for {path}")
    return h.value, w.value


def decode_png(path: str) -> np.ndarray:
    """Decode one PNG via the native core -> (H, W, 3) float32 [0,1].

    Reads the header first and allocates exactly h*w*3 (a worst-case
    preallocation would spike RSS by hundreds of MB per call)."""
    lib = load_library()
    hdr_h, hdr_w = png_dims(path)
    buf = np.empty((hdr_h, hdr_w, 3), np.float32)
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.td_decode(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.byref(h), ctypes.byref(w), buf.size,
    )
    if rc != 0:
        raise IOError(f"td_decode failed ({rc}) for {path}")
    assert (h.value, w.value) == (hdr_h, hdr_w)
    return buf


def _path_array(paths: Sequence[str]):
    arr = (ctypes.c_char_p * len(paths))()
    keepalive = [p.encode() for p in paths]
    for i, b in enumerate(keepalive):
        arr[i] = b
    return arr, keepalive


class NativeFrameIO:
    """Threaded whole-sequence PNG decode/encode for streaming inference.

    Plays the role of the reference's per-frame cv2.imread/save_img calls
    (reference main.py:253-269, dataloader.py:30-36) but off the python
    thread: ctypes releases the GIL for the duration of each call, so a
    writer thread encodes chunk k while the device computes chunk k+1.
    """

    def __init__(self, num_threads: int = 8):
        self._lib = load_library()
        self._handle = ctypes.c_void_p(self._lib.td_open(num_threads))

    def decode_frames(self, paths: Sequence[str]) -> np.ndarray:
        """-> (len(paths), H, W, 3) float32 [0,1]; frames must share geometry."""
        n = len(paths)
        h, w = png_dims(paths[0])
        out = np.empty((n, h, w, 3), np.float32)
        arr, keep = _path_array(paths)
        ch, cw = ctypes.c_int(), ctypes.c_int()
        rc = self._lib.td_decode_frames(
            self._handle, arr, n, ctypes.byref(ch), ctypes.byref(cw),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), out.size,
        )
        if rc != 0:
            raise IOError(f"native decode_frames failed for {rc} frame(s)")
        assert (ch.value, cw.value) == (h, w)
        return out

    def decode_frames_u8(self, paths: Sequence[str]) -> np.ndarray:
        """-> (len(paths), H, W, 3) uint8 — the PNG's own precision, no
        float round-trip (4x less memory traffic than decode_frames; the
        cheap-upload inference path normalizes on device)."""
        n = len(paths)
        h, w = png_dims(paths[0])
        out = np.empty((n, h, w, 3), np.uint8)
        arr, keep = _path_array(paths)
        ch, cw = ctypes.c_int(), ctypes.c_int()
        rc = self._lib.td_decode_frames_u8(
            self._handle, arr, n, ctypes.byref(ch), ctypes.byref(cw),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), out.size,
        )
        if rc != 0:
            raise IOError(f"native decode_frames_u8 failed for {rc} frame(s)")
        assert (ch.value, cw.value) == (h, w)
        return out

    def encode_frames(self, paths: Sequence[str], frames: np.ndarray) -> None:
        """frames: (n, H, W, 3) uint8 RGB, one PNG per path."""
        n, h, w, c = frames.shape
        assert c == 3 and n == len(paths) and frames.dtype == np.uint8
        frames = np.ascontiguousarray(frames)
        arr, keep = _path_array(paths)
        rc = self._lib.td_encode_frames(
            self._handle, arr,
            frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n, h, w,
        )
        if rc != 0:
            raise IOError(f"native encode_frames failed for {rc} frame(s)")

    def close(self):
        if self._handle:
            self._lib.td_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class NativeExecutor:
    """Executes batches of SeqPlans through the C++ thread pool.

    ``cache_mb``: LRU decoded-frame cache shared by the pool (0 = off) —
    overlapping RNN windows then share decodes across the epoch (the
    reference's loadHR_batch amortization, dataloader.py:53-167, redesigned
    as a byte-budgeted cache). Pixel-identical either way."""

    def __init__(self, num_threads: int, rnn_n: int, tar: int,
                 cache_mb: int = 0):
        self._lib = load_library()
        self._handle = ctypes.c_void_p(
            self._lib.td_open_cached(num_threads, max(0, int(cache_mb))))
        self.rnn_n = rnn_n
        self.tar = tar

    def load(self, plans: Sequence, as_uint8: bool = False) -> np.ndarray:
        """-> (len(plans), rnn_n, tar, tar, 3) float32 [0,1], or raw uint8
        with ``as_uint8`` (cheap-upload path; device-side /255)."""
        n = len(plans)
        rnn_n, tar = self.rnn_n, self.tar
        paths = (ctypes.c_char_p * (n * rnn_n))()
        oy = np.empty(n * rnn_n, np.int32)
        ox = np.empty(n * rnn_n, np.int32)
        flip = np.empty(n, np.int32)
        # Keep encoded bytes alive for the duration of the call.
        keepalive: List[bytes] = []
        for s, plan in enumerate(plans):
            assert len(plan.paths) == rnn_n, (len(plan.paths), rnn_n)
            for f in range(rnn_n):
                b = plan.paths[f].encode()
                keepalive.append(b)
                paths[s * rnn_n + f] = b
            oy[s * rnn_n : (s + 1) * rnn_n] = plan.oy
            ox[s * rnn_n : (s + 1) * rnn_n] = plan.ox
            flip[s] = int(plan.flip)
        if as_uint8:
            out = np.empty((n, rnn_n, tar, tar, 3), np.uint8)
            rc = self._lib.td_load_batch_u8(
                self._handle, paths,
                oy.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                ox.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                flip.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                n, rnn_n, tar,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            )
        else:
            out = np.empty((n, rnn_n, tar, tar, 3), np.float32)
            rc = self._lib.td_load_batch(
                self._handle, paths,
                oy.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                ox.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                flip.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                n, rnn_n, tar,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            )
        if rc != 0:
            raise IOError(f"native batch load failed for {rc} sequence(s)")
        return out

    def close(self):
        if self._handle:
            self._lib.td_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
