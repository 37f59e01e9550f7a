"""Procedural synthetic video: deterministic test fixtures and smoke-training
data.

The reference ships OpenCV-sample procedural classes (Chess/Book/Cube,
lib/data/video.py:47-165; TestSceneRender, lib/data/tst_scene_render.py) used
only as capture fallbacks; here synthetic clips are a first-class fixture
strategy (SURVEY.md §4.6): textured scenes with smooth global motion, so flow
estimation and warping have real signal to learn/track.
"""

from __future__ import annotations

import os

import numpy as np


def synthetic_clip(
    num_frames: int,
    height: int,
    width: int,
    seed: int = 0,
) -> np.ndarray:
    """A deterministic moving-texture clip, (T, H, W, 3) float32 in [0, 1].

    Composition: two drifting 2D sinusoid gratings at different scales and
    velocities plus a moving bright square — smooth subpixel camera-like
    motion with occlusion edges.
    """
    rng = np.random.RandomState(seed)
    yy, xx = np.meshgrid(np.arange(height), np.arange(width), indexing="ij")
    yy = yy.astype(np.float64)
    xx = xx.astype(np.float64)

    f1 = rng.uniform(0.05, 0.15, size=2)
    f2 = rng.uniform(0.15, 0.4, size=2)
    v1 = rng.uniform(-1.5, 1.5, size=2)
    v2 = rng.uniform(-2.5, 2.5, size=2)
    phase = rng.uniform(0, 2 * np.pi, size=3)
    sq = rng.uniform(0.2, 0.6, size=2)  # square start (fractional)
    sqv = rng.uniform(-2.0, 2.0, size=2)
    sq_size = max(4, int(0.15 * min(height, width)))

    frames = np.zeros((num_frames, height, width, 3), np.float32)
    for t in range(num_frames):
        g1 = 0.5 + 0.5 * np.sin(
            2 * np.pi * (f1[0] * (yy - v1[0] * t) + f1[1] * (xx - v1[1] * t))
            + phase[0]
        )
        g2 = 0.5 + 0.5 * np.sin(
            2 * np.pi * (f2[0] * (yy - v2[0] * t) + f2[1] * (xx - v2[1] * t))
            + phase[1]
        )
        base = np.stack(
            [
                0.6 * g1 + 0.4 * g2,
                0.5 * g1 + 0.5 * g2 * np.cos(phase[2]) ** 2,
                0.4 * g1 + 0.6 * g2,
            ],
            axis=-1,
        )
        cy = int((sq[0] * height + sqv[0] * t) % (height - sq_size))
        cx = int((sq[1] * width + sqv[1] * t) % (width - sq_size))
        base[cy : cy + sq_size, cx : cx + sq_size] = [0.9, 0.8, 0.2]
        frames[t] = np.clip(base, 0.0, 1.0)
    return frames


def write_synthetic_scenes(
    root: str,
    num_scenes: int,
    num_frames: int,
    height: int,
    width: int,
    start_index: int = 2000,
    prefix: str = "scene",
    seed: int = 0,
) -> None:
    """Materialize scene dirs in the reference layout:
    ``<root>/<prefix>_%04d/col_high_%04d.png`` (reference dataloader.py:65-72,
    dataPrepare.py:98-99)."""
    import cv2

    for s in range(num_scenes):
        d = os.path.join(root, f"{prefix}_{start_index + s:04d}")
        os.makedirs(d, exist_ok=True)
        clip = synthetic_clip(num_frames, height, width, seed=seed + s)
        for t in range(num_frames):
            img = (clip[t, :, :, ::-1] * 255).astype(np.uint8)  # RGB->BGR
            cv2.imwrite(os.path.join(d, f"col_high_{t:04d}.png"), img)
