"""Training data loader: scene discovery, per-sequence augmentation, threaded
decode, prefetch.

Functional parity with reference lib/dataloader.py:170-348 (``loadHR`` +
``frvsr_gpu_data_loader``):

- scenes ``<dir>/<prefix>_%04d`` for indices [str_dir, end_dir], skipping
  folders missing frame ``max_frm`` (dataloader.py:183-188)
- every length-``rnn_n`` window of every scene is one example
  (dataloader.py:189-191)
- per-sequence augmentations (dataloader.py:207-261):
  * movingFirstFrame (p=0.3): synthesize a camera pan from the static first
    frame — per-frame integer offsets ``floor(U(-3.5, 4.5))``, exclusive
    cumsum trajectory
  * random crop to ``hr_load_size`` (= 4*crop + gaussian margin)
  * random left-right flip (p=0.5)
- shuffled batches; a validation split uses scene indices
  [end_dir+1, end_dir_val] (dataloader.py:290-297)

Deviation by design: decode/augment is plain numpy on host threads (no TF
queue runners), and HR->LR gaussian generation happens on device inside the
train step, keeping host->device traffic to the HR crops only.
"""

from __future__ import annotations

import os
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import List, Optional, Tuple

import numpy as np

from tecogan_tpu.config import TecoConfig


class SceneDataset:
    """Enumerates (scene, start_frame) windows and materializes augmented
    HR sequences."""

    def __init__(self, config: TecoConfig, validation: bool = False):
        self.config = config
        lo = config.end_dir + 1 if validation else config.str_dir
        hi = config.end_dir_val if validation else config.end_dir
        self.scenes: List[str] = []
        for i in range(lo, hi + 1):
            d = os.path.join(
                config.input_video_dir, f"{config.input_video_pre}_{i:04d}"
            )
            if os.path.exists(d):
                if not os.path.exists(
                    os.path.join(d, f"col_high_{config.max_frm:04d}.png")
                ):
                    # reference dataloader.py:186-188
                    print(f"Skip {d}: not enough frames")
                    continue
                self.scenes.append(d)
        if not self.scenes:
            raise FileNotFoundError(
                f"No usable scenes under {config.input_video_dir} "
                f"[{lo}, {hi}]"
            )
        self.windows_per_scene = config.max_frm - config.rnn_n + 1
        self.num_examples = len(self.scenes) * self.windows_per_scene

    def __len__(self):
        return self.num_examples

    # ----------------------------------------------------------- sampling
    def load_sequence(self, index: int, rng: np.random.RandomState) -> np.ndarray:
        """Load + augment one window -> (rnn_n, tar, tar, 3) float32 [0,1]."""
        import cv2

        cfg = self.config
        scene = self.scenes[index // self.windows_per_scene]
        start = index % self.windows_per_scene
        tar = cfg.hr_load_size

        def read(fi):
            p = os.path.join(scene, f"col_high_{fi:04d}.png")
            im = cv2.imread(p, 3)
            if im is None:
                raise FileNotFoundError(p)
            return im[:, :, ::-1].astype(np.float32) / 255.0

        moving = (
            cfg.moving_first_frame
            and rng.rand() >= (1.0 - cfg.moving_first_frame_prob)
        )
        if moving:
            # Synthetic camera pan from the static first frame
            # (reference dataloader.py:207-228).
            frame0 = read(start)
            h, w = frame0.shape[:2]
            offsets = np.floor(rng.uniform(-3.5, 4.5, size=(cfg.rnn_n, 2))).astype(
                np.int64
            )
            pos = np.cumsum(offsets, axis=0) - offsets  # exclusive cumsum
            mn = pos.min(axis=0)
            rg = pos.max(axis=0) - mn  # [range_x, range_y] in (x, y) order
            lefttop = pos - mn
            # Random crop of the shrunken valid region.
            max_oh = h - tar - rg[1]
            max_ow = w - tar - rg[0]
            if max_oh <= 0 or max_ow <= 0:
                raise ValueError(
                    f"Scene {scene} too small for crop {tar} + pan margin"
                )
            oh = int(rng.uniform(0, max_oh))
            ow = int(rng.uniform(0, max_ow))
            seq = np.stack(
                [
                    frame0[
                        oh + lefttop[fi, 1] : oh + lefttop[fi, 1] + tar,
                        ow + lefttop[fi, 0] : ow + lefttop[fi, 0] + tar,
                    ]
                    for fi in range(cfg.rnn_n)
                ]
            )
        else:
            frames = [read(start + fi) for fi in range(cfg.rnn_n)]
            h, w = frames[0].shape[:2]
            if h < tar or w < tar:
                raise ValueError(f"Scene {scene} smaller than crop {tar}")
            oh = int(rng.uniform(0, h - tar)) if cfg.random_crop else 0
            ow = int(rng.uniform(0, w - tar)) if cfg.random_crop else 0
            seq = np.stack([f[oh : oh + tar, ow : ow + tar] for f in frames])

        if cfg.flip and rng.rand() < 0.5:  # reference ops.py:230-235
            seq = seq[:, :, ::-1]
        return np.ascontiguousarray(seq)


class BatchLoader:
    """Threaded shuffling batch producer with bounded prefetch."""

    def __init__(
        self,
        dataset: SceneDataset,
        batch_size: Optional[int] = None,
        seed: Optional[int] = None,
        num_threads: Optional[int] = None,
        prefetch: Optional[int] = None,
    ):
        cfg = dataset.config
        self.dataset = dataset
        self.batch_size = batch_size or cfg.batch_size
        self.seed = cfg.rand_seed if seed is None else seed
        self.num_threads = num_threads or max(1, cfg.queue_thread)
        self.prefetch = prefetch or cfg.prefetch_depth
        self._queue: "queue.Queue[np.ndarray]" = queue.Queue(maxsize=self.prefetch)
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    # --------------------------------------------------------------- iter
    def _producer(self):
        rng = np.random.RandomState(self.seed)
        pool = ThreadPoolExecutor(max_workers=self.num_threads)
        n = len(self.dataset)
        perm = rng.permutation(n)
        cursor = 0
        try:
            while not self._stop.is_set():
                idxs = []
                for _ in range(self.batch_size):
                    if cursor >= n:
                        perm = rng.permutation(n)
                        cursor = 0
                    idxs.append(int(perm[cursor]))
                    cursor += 1
                seeds = rng.randint(0, 2**31 - 1, size=len(idxs))
                futures = [
                    pool.submit(
                        self.dataset.load_sequence, i, np.random.RandomState(s)
                    )
                    for i, s in zip(idxs, seeds)
                ]
                batch = np.stack([f.result() for f in futures])
                while not self._stop.is_set():
                    try:
                        self._queue.put(batch, timeout=0.5)
                        break
                    except queue.Full:
                        continue
        finally:
            pool.shutdown(wait=False)

    def start(self):
        if self._thread is None:
            self._thread = threading.Thread(target=self._producer, daemon=True)
            self._thread.start()
        return self

    def next_batch(self) -> np.ndarray:
        """(B, rnn_n, tar, tar, 3) float32 in [0, 1]."""
        if self._thread is None:
            self.start()
        return self._queue.get()

    def stop(self):
        self._stop.set()
        if self._thread is not None:
            # Drain so the producer can observe the stop flag.
            try:
                while True:
                    self._queue.get_nowait()
            except queue.Empty:
                pass
            self._thread.join(timeout=5)
            self._thread = None

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()
