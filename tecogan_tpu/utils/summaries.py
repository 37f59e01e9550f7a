"""TensorBoard scalar summaries and animated-GIF sequence summaries.

Replaces the reference's TB pipeline: scalar summaries for lr + every loss
EMA (reference main.py:290-297, Teco.py:433-435), ``val_*`` raw scalars
(main.py:299-304), and animated GIF summaries of LR/HR/Generated sequences
(reference ``gif_summary`` ops.py:399-517 — there an ffmpeg subprocess piped
inside ``tf.py_func``; here PIL writes the GIF directly, matching the
reference's own PIL fallback, with an optional ffmpeg path for parity).
"""

from __future__ import annotations

import os
import subprocess
from typing import Dict

import numpy as np


def encode_gif(frames: np.ndarray, path: str, fps: int = 3,
               use_ffmpeg: bool = False) -> None:
    """Write (T, H, W, 3) uint8 frames as an animated GIF.

    ``use_ffmpeg`` pipes raw frames through ffmpeg exactly like reference
    ops.py:399-431; the default PIL path matches its fallback (ops.py:465-480).
    """
    frames = np.asarray(frames)
    if frames.dtype != np.uint8:
        frames = np.clip(frames * 255.0, 0, 255).astype(np.uint8)
    t, h, w, c = frames.shape
    if use_ffmpeg:
        cmd = [
            "ffmpeg", "-y", "-f", "rawvideo", "-vcodec", "rawvideo",
            "-r", f"{fps:.02f}", "-s", f"{w}x{h}", "-pix_fmt", "rgb24",
            "-i", "-", "-filter_complex",
            "[0:v]split[x][z];[z]palettegen[y];[x]paletteuse",
            "-r", f"{fps:.02f}", path,
        ]
        proc = subprocess.Popen(cmd, stdin=subprocess.PIPE,
                                stdout=subprocess.DEVNULL,
                                stderr=subprocess.DEVNULL)
        proc.communicate(frames.tobytes())
        if proc.returncode == 0:
            return
        # fall through to PIL on ffmpeg failure
    from PIL import Image

    imgs = [Image.fromarray(f) for f in frames]
    imgs[0].save(path, save_all=True, append_images=imgs[1:],
                 duration=int(1000 / fps), loop=0)


class SummaryLogger:
    """Scalars to TensorBoard (tensorboardX) + GIF sequence dumps.

    Degrades gracefully to JSONL scalars when tensorboardX is unavailable.
    """

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self.log_dir = log_dir
        try:
            from tensorboardX import SummaryWriter

            self._tb = SummaryWriter(log_dir)
        except Exception:
            self._tb = None
        self._jsonl = open(os.path.join(log_dir, "scalars.jsonl"), "a")

    def scalars(self, step: int, values: Dict[str, float],
                prefix: str = "") -> None:
        import json

        row = {"step": int(step)}
        for k, v in values.items():
            name = prefix + k
            v = float(np.asarray(v))
            row[name] = v
            if self._tb is not None:
                self._tb.add_scalar(name, v, step)
        self._jsonl.write(json.dumps(row) + "\n")
        self._jsonl.flush()

    def gif(self, step: int, tag: str, sequence: np.ndarray, fps: int = 3,
            max_outputs: int = 1) -> None:
        """(B, T, H, W, 3) float [0,1] or uint8 -> GIF files + TB images
        (reference gif_summary ops.py:489-517)."""
        seq = np.asarray(sequence)[:max_outputs]
        for b in range(seq.shape[0]):
            path = os.path.join(self.log_dir, f"{tag}_{b}_step{step}.gif")
            encode_gif(seq[b], path, fps=fps)
            if self._tb is not None:
                frame = seq[b][0]
                if frame.dtype != np.uint8:
                    frame = np.clip(frame * 255, 0, 255).astype(np.uint8)
                self._tb.add_image(f"{tag}/{b}", frame, step,
                                   dataformats="HWC")

    def close(self):
        if self._tb is not None:
            self._tb.close()
        self._jsonl.close()
