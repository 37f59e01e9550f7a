"""Procedural synthetic video: deterministic test fixtures and smoke-training
data.

The reference ships OpenCV-sample procedural classes (Chess/Book/Cube,
lib/data/video.py:47-165; TestSceneRender, lib/data/tst_scene_render.py) used
only as capture fallbacks; here synthetic video is a first-class fixture
strategy (SURVEY.md §4.6), in two tiers:

- :func:`synthetic_clip`: fast array-native clips (drifting gratings + a
  moving occluder) — the workhorse fixture for training/inference tests.
- Procedural scene classes (:class:`CheckerPlane`, :class:`TexturedQuad`,
  :class:`WireCube`, the reference's Chess/Book/Cube roles) rendering a
  camera orbit over 3D geometry through a pinhole projection — structured
  motion parallax for flow/warp stress tests, reachable through the same
  ``read()`` capture interface (:func:`create_capture`) the reference's
  fallbacks expose (reference lib/data/video.py:176-206).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np


def synthetic_clip(
    num_frames: int,
    height: int,
    width: int,
    seed: int = 0,
    content: str = "grating",
) -> np.ndarray:
    """A deterministic moving-texture clip, (T, H, W, 3) float32 in [0, 1].

    Two content regimes, selected by ``content``:

    - ``"grating"`` (default, the op-stress fixture): two drifting 2D
      sinusoid gratings at different scales and velocities plus a moving
      bright square. Frequencies reach 0.4 cycles/px — far above the 0.125
      quarter-band that survives the x4 Gaussian decimation (reference
      ops.py:347-367) — so most detail is *unrecoverable*: ideal for
      stressing warp/metric ops, measured unusable for demonstrating that
      training beats bicubic (round-5 train->eval: trained 17.37 dB vs
      bicubic 17.53 dB on this content).
    - ``"natural"`` (the training/eval fixture): band-limited textured
      background panning at sub-pixel velocity plus sharp-edged moving
      occluders (gradient-filled rectangles and a disk). Spectrally this
      matches the reference's real training data (half-res Vimeo video,
      dataPrepare.py:90-99 + INTER_AREA 0.5x, which is naturally
      band-limited), so 4x SR is learnable: a trained model can and should
      clearly beat the bicubic baseline here.
    """
    if content == "natural":
        return _natural_clip(num_frames, height, width, seed)
    if content != "grating":
        raise ValueError(
            f"content must be 'grating' or 'natural', got {content!r}")
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


def _natural_clip(
    num_frames: int,
    height: int,
    width: int,
    seed: int = 0,
) -> np.ndarray:
    """Band-limited naturalistic clip: see :func:`synthetic_clip` (the
    ``content="natural"`` regime).

    Composition: a large noise canvas sampled through a sub-pixel panning
    window, plus two gradient-filled rectangles and one flat disk moving
    sinusoidally. The canvas mixes three octaves:

    - two Gaussian-smoothed layers (sigma 8 / 2.5 px) — the smooth base;
    - an FFT-annulus band-pass layer confined to 0.05-0.115 cycles/px —
      BELOW the 0.125 quarter-band (so it survives the x4 decimation and
      stays single-frame recoverable) but heavily attenuated by the
      sigma=1.5 anti-alias blur (gain 0.55-0.75). Interpolators like
      ``bicubic_four`` reproduce it at that attenuated amplitude; inverting
      the known blur is a plain linear filter a conv net learns quickly.
      Measured on this band: FFT-interpolation ~28 dB vs ~50 dB for the
      deconvolution oracle — the learnable headroom the round-5 train->eval
      loop demonstrates. Without this octave (two smooth layers only)
      bicubic saturates at ~39 dB and training can only tie it.
    """
    from scipy.ndimage import gaussian_filter

    rng = np.random.RandomState(seed)
    v = rng.uniform(-1.5, 1.5, size=2)  # background pan, px/frame
    pad = int(np.ceil(np.abs(v).max() * num_frames)) + 2
    ch, cw = height + 2 * pad + 1, width + 2 * pad + 1
    coarse = gaussian_filter(rng.rand(ch, cw, 3).astype(np.float32),
                             (8.0, 8.0, 0.0))
    mid = gaussian_filter(rng.rand(ch, cw, 3).astype(np.float32),
                          (2.5, 2.5, 0.0))
    fy = np.fft.fftfreq(ch)[:, None]
    fx = np.fft.fftfreq(cw)[None, :]
    ann = (np.sqrt(fy ** 2 + fx ** 2) >= 0.05) & \
          (np.sqrt(fy ** 2 + fx ** 2) <= 0.115)
    detail = np.empty((ch, cw, 3), np.float32)
    for c in range(3):
        spec = (rng.randn(ch, cw) + 1j * rng.randn(ch, cw)) * ann
        layer = np.fft.ifft2(spec).real
        detail[:, :, c] = layer / (layer.std() + 1e-12)
    canvas = (coarse - coarse.mean((0, 1))) / (coarse.std((0, 1)) + 1e-6)
    canvas = 0.12 * canvas + 0.06 * (
        (mid - mid.mean((0, 1))) / (mid.std((0, 1)) + 1e-6)) + 0.10 * detail
    canvas = np.clip(0.5 + canvas, 0.02, 0.98)

    # Occluders: sinusoidal orbits around the frame center, always in-frame.
    def orbit(t, amp_y, amp_x, w, phase):
        return (amp_y * np.sin(w * t + phase), amp_x * np.cos(w * t + phase))

    rects = []
    for _ in range(2):
        rh = max(6, int(rng.uniform(0.12, 0.22) * height))
        rw = max(6, int(rng.uniform(0.12, 0.22) * width))
        c0, c1 = rng.uniform(0.1, 0.9, 3), rng.uniform(0.1, 0.9, 3)
        gy = np.linspace(0.0, 1.0, rh, dtype=np.float32)[:, None, None]
        tex = (c0 * (1.0 - gy) + c1 * gy).astype(np.float32)
        tex = np.broadcast_to(tex, (rh, rw, 3))
        rects.append((rh, rw, tex, rng.uniform(0.04, 0.18),
                      rng.uniform(0, 2 * np.pi)))
    disk_r = max(4, int(0.10 * min(height, width)))
    disk_c = rng.uniform(0.15, 0.95, 3).astype(np.float32)
    disk_w, disk_ph = rng.uniform(0.04, 0.18), rng.uniform(0, 2 * np.pi)
    yy, xx = np.meshgrid(np.arange(height), np.arange(width), indexing="ij")

    frames = np.empty((num_frames, height, width, 3), np.float32)
    for t in range(num_frames):
        oy, ox = pad + v[0] * t, pad + v[1] * t
        iy, ix = int(np.floor(oy)), int(np.floor(ox))
        fy, fx = oy - iy, ox - ix
        c = canvas[iy:iy + height + 1, ix:ix + width + 1]
        frame = ((1 - fy) * (1 - fx) * c[:-1, :-1]
                 + (1 - fy) * fx * c[:-1, 1:]
                 + fy * (1 - fx) * c[1:, :-1]
                 + fy * fx * c[1:, 1:]).copy()
        for k, (rh, rw, tex, w, ph) in enumerate(rects):
            dy, dx = orbit(t, (height - rh) // 2 - 1, (width - rw) // 2 - 1,
                           w, ph + k)
            y0 = int((height - rh) // 2 + dy)
            x0 = int((width - rw) // 2 + dx)
            frame[y0:y0 + rh, x0:x0 + rw] = tex
        dy, dx = orbit(t, height // 2 - disk_r - 1, width // 2 - disk_r - 1,
                       disk_w, disk_ph)
        cy, cx = height // 2 + dy, width // 2 + dx
        mask = (yy - cy) ** 2 + (xx - cx) ** 2 <= disk_r ** 2
        frame[mask] = disk_c
        frames[t] = np.clip(frame, 0.0, 1.0)
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
    content: str = "natural",
) -> None:
    """Materialize scene dirs in the reference layout:
    ``<root>/<prefix>_%04d/col_high_%04d.png`` (reference dataloader.py:65-72,
    dataPrepare.py:98-99). Defaults to ``content="natural"`` — the learnable,
    band-limited regime (see :func:`synthetic_clip`) — since written scenes
    feed training/eval, where SR must be able to beat bicubic."""
    import cv2

    for s in range(num_scenes):
        d = os.path.join(root, f"{prefix}_{start_index + s:04d}")
        os.makedirs(d, exist_ok=True)
        clip = synthetic_clip(num_frames, height, width, seed=seed + s,
                              content=content)
        for t in range(num_frames):
            img = (clip[t, :, :, ::-1] * 255).astype(np.uint8)  # RGB->BGR
            cv2.imwrite(os.path.join(d, f"col_high_{t:04d}.png"), img)


# ---------------------------------------------------------------------------
# Procedural 3D scene classes (reference lib/data/video.py:47-165 roles:
# VideoSynthBase / Chess / Book / Cube), re-derived — not transcribed — as a
# minimal pinhole renderer over numpy geometry.
# ---------------------------------------------------------------------------
class ProceduralScene:
    """Base class: a deterministic camera orbit + pinhole projection with
    optional per-frame sensor noise, exposed through the cv2.VideoCapture
    ``read()`` protocol so loaders can consume it like a real source."""

    def __init__(self, height: int = 240, width: int = 320, seed: int = 0,
                 noise: float = 0.0):
        self.h, self.w = height, width
        self.rng = np.random.RandomState(seed)
        self.noise = noise
        self.t = 0
        f = 0.9 * width
        self.K = np.array([[f, 0, width / 2.0],
                           [0, f, height / 2.0],
                           [0, 0, 1.0]])

    # camera pose: slow orbit around the scene origin, slight bob
    def _pose(self, t: int) -> Tuple[np.ndarray, np.ndarray]:
        ang = 0.02 * t
        r = 6.0
        eye = np.array([r * np.sin(ang), 1.2 + 0.2 * np.sin(0.05 * t),
                        r * np.cos(ang)])
        fwd = -eye / np.linalg.norm(eye)          # look at origin
        right = np.cross([0.0, 1.0, 0.0], fwd)
        right /= np.linalg.norm(right)
        up = np.cross(fwd, right)
        R = np.stack([right, up, fwd])            # world -> camera rows
        tvec = -R @ eye
        return R, tvec

    def _project(self, pts_world: np.ndarray, t: int) -> np.ndarray:
        R, tvec = self._pose(t)
        cam = pts_world @ R.T + tvec
        z = np.maximum(cam[:, 2], 1e-6)
        uv = (cam[:, :2] / z[:, None]) * self.K[0, 0]
        uv[:, 0] += self.K[0, 2]
        uv[:, 1] += self.K[1, 2]
        return uv

    def render(self, t: int) -> np.ndarray:
        """(H, W, 3) float32 [0, 1] frame at time t; override ``_draw``."""
        frame = np.zeros((self.h, self.w, 3), np.float32)
        # sky/ground gradient background
        grad = np.linspace(0.25, 0.6, self.h, dtype=np.float32)[:, None]
        frame[:] = grad[..., None] * np.float32([0.9, 0.95, 1.0])
        self._draw(frame, t)
        if self.noise > 0:
            frame = frame + self.rng.normal(
                0.0, self.noise, frame.shape).astype(np.float32)
        return np.clip(frame, 0.0, 1.0)

    def _draw(self, frame: np.ndarray, t: int) -> None:
        raise NotImplementedError

    # ---- cv2.VideoCapture protocol ------------------------------------
    def read(self) -> Tuple[bool, np.ndarray]:
        frame = self.render(self.t)
        self.t += 1
        return True, (frame * 255).astype(np.uint8)

    def isOpened(self) -> bool:  # noqa: N802 (cv2 spelling)
        return True

    def release(self) -> None:
        pass


def _fill_quad(frame: np.ndarray, uv: np.ndarray, color) -> None:
    """Rasterize a convex quad given 4 projected (x, y) corners."""
    import cv2

    pts = np.round(uv).astype(np.int32).reshape(-1, 1, 2)
    cv2.fillConvexPoly(frame, pts, color)


class CheckerPlane(ProceduralScene):
    """The 'Chess' role: a ground-plane checkerboard under camera orbit —
    strong perspective flow with sign changes across the board."""

    def __init__(self, squares: int = 8, **kw):
        super().__init__(**kw)
        self.n = squares

    def _draw(self, frame, t):
        n = self.n
        half = n / 2.0
        for i in range(n):
            for j in range(n):
                corners = np.array([
                    [i - half, 0.0, j - half],
                    [i + 1 - half, 0.0, j - half],
                    [i + 1 - half, 0.0, j + 1 - half],
                    [i - half, 0.0, j + 1 - half],
                ])
                uv = self._project(corners, t)
                c = 0.85 if (i + j) % 2 == 0 else 0.12
                _fill_quad(frame, uv, (c, c * 0.95, c * 0.9))


class TexturedQuad(ProceduralScene):
    """The 'Book' role: an upright textured rectangle (procedural stripes)
    swaying in front of the camera — large coherent surface motion."""

    def __init__(self, stripes: int = 12, **kw):
        super().__init__(**kw)
        self.stripes = stripes
        self.colors = self.rng.rand(stripes, 3) * 0.7 + 0.2

    def _draw(self, frame, t):
        sway = 0.4 * np.sin(0.07 * t)
        for s in range(self.stripes):
            x0 = -1.5 + 3.0 * s / self.stripes + sway
            x1 = -1.5 + 3.0 * (s + 1) / self.stripes + sway
            corners = np.array([
                [x0, 0.2, -0.5], [x1, 0.2, -0.5],
                [x1, 2.2, -0.5], [x0, 2.2, -0.5],
            ])
            uv = self._project(corners, t)
            _fill_quad(frame, uv, tuple(self.colors[s]))


class WireCube(ProceduralScene):
    """The 'Cube' role: a spinning solid cube — self-occlusion and depth
    discontinuities."""

    _FACES = [(0, 1, 2, 3), (4, 5, 6, 7), (0, 1, 5, 4),
              (2, 3, 7, 6), (1, 2, 6, 5), (0, 3, 7, 4)]

    def _draw(self, frame, t):
        a = 0.05 * t
        ca, sa = np.cos(a), np.sin(a)
        rot = np.array([[ca, 0, sa], [0, 1, 0], [-sa, 0, ca]])
        verts = (np.array([[x, y, z] for x in (-1, 1) for y in (-1, 1)
                           for z in (-1, 1)])[[0, 1, 3, 2, 4, 5, 7, 6]]
                 @ rot.T)
        verts[:, 1] += 1.0
        R, tvec = self._pose(t)
        cam_z = (verts @ R.T + tvec)[:, 2]
        uv = self._project(verts, t)
        order = np.argsort([-cam_z[list(f)].mean() for f in self._FACES])
        for k in order:  # painter's algorithm, far faces first
            f = self._FACES[k]
            shade = 0.35 + 0.08 * k
            _fill_quad(frame, uv[list(f)], (shade, 0.3, 0.9 - 0.07 * k))


class SlidingPatch(ProceduralScene):
    """The 'TestSceneRender' role (reference tst_scene_render.py): a
    foreground patch sliding sinusoidally over a static textured background,
    with the patch's ground-truth rect queryable per frame — fixtures that
    need known motion (flow/warp assertions) read :meth:`current_rect`.

    Motion model matches the reference's: offsets ``amplitude * cos/sin
    (speed * t)`` around the centered rest position, full-amplitude so the
    patch sweeps the frame without leaving it.
    """

    def __init__(self, patch_frac: float = 0.25, speed: float = 0.25, **kw):
        super().__init__(**kw)
        self.speed = speed
        ph = max(4, int(self.h * patch_frac))
        pw = max(4, int(self.w * patch_frac))
        # procedural textures: smooth background, high-contrast patch
        yy, xx = np.meshgrid(np.arange(self.h), np.arange(self.w),
                             indexing="ij")
        self._bg = np.stack([
            0.3 + 0.2 * np.sin(2 * np.pi * xx / self.w * 3),
            0.3 + 0.2 * np.sin(2 * np.pi * yy / self.h * 2),
            0.45 + 0.1 * np.cos(2 * np.pi * (xx + yy) / (self.h + self.w)),
        ], axis=-1).astype(np.float32)
        py, px = np.meshgrid(np.arange(ph), np.arange(pw), indexing="ij")
        self._patch = np.stack([
            ((py // 4 + px // 4) % 2).astype(np.float32) * 0.7 + 0.15,
            0.2 + 0.6 * (px / max(1, pw - 1)).astype(np.float32),
            0.8 - 0.6 * (py / max(1, ph - 1)).astype(np.float32),
        ], axis=-1)
        self._rest = ((self.h - ph) // 2, (self.w - pw) // 2)
        self._ampl = (self._rest[0], self._rest[1])  # keep patch in-frame

    def _offset(self, t: int):
        return (int(self._ampl[0] * np.cos(t * self.speed)),
                int(self._ampl[1] * np.sin(t * self.speed)))

    def current_rect(self, t: Optional[int] = None) -> np.ndarray:
        """(y0, x0, y1, x1) of the patch at time ``t`` (default: the frame
        :meth:`read` would produce next) — the reference's getCurrentRect/
        getRectInTime contract."""
        t = self.t if t is None else t
        dy, dx = self._offset(t)
        ph, pw = self._patch.shape[:2]
        y0, x0 = self._rest[0] + dy, self._rest[1] + dx
        return np.array([y0, x0, y0 + ph, x0 + pw])

    def _draw(self, frame, t):
        frame[:] = self._bg
        y0, x0, y1, x1 = self.current_rect(t)
        frame[y0:y1, x0:x1] = self._patch


def _parse_synth(source: str) -> dict:
    """Parse the reference's ``synth:`` source grammar
    (lib/data/video.py:21-27: ``synth:class=chess:noise=0.1:size=WxH``)."""
    params: dict = {}
    for part in source.split(":")[1:]:
        if not part:
            continue
        k, _, v = part.partition("=")
        if k == "size":
            w, h = v.split("x")
            params["width"], params["height"] = int(w), int(h)
        elif k == "noise":
            params["noise"] = float(v)
        elif k == "class":
            params["class"] = v
        elif k == "seed":
            params["seed"] = int(v)
    return params


_SCENES = {"chess": CheckerPlane, "book": TexturedQuad, "cube": WireCube,
           "patch": SlidingPatch}


def create_capture(source=None, height: int = 240, width: int = 320,
                   seed: int = 0):
    """Open a video source with a procedural fallback (the reference's
    create_capture contract, lib/data/video.py:176-206): an int/path opens
    cv2.VideoCapture; the strings 'chess'/'book'/'cube'/'patch' or a
    ``synth:class=...:noise=...:size=WxH`` spec (or a failed real open)
    return the corresponding procedural scene."""
    if isinstance(source, str) and source.startswith("synth:"):
        p = _parse_synth(source)
        cls = _SCENES.get(p.pop("class", "chess"), CheckerPlane)
        return cls(height=p.pop("height", height),
                   width=p.pop("width", width),
                   seed=p.pop("seed", seed), **p)
    if isinstance(source, str) and source.lower() in _SCENES:
        return _SCENES[source.lower()](height=height, width=width, seed=seed)
    import cv2

    cap = cv2.VideoCapture(source if source is not None else 0)
    if not cap.isOpened():
        return CheckerPlane(height=height, width=width, seed=seed)
    return cap


def procedural_clip(kind: str, num_frames: int, height: int, width: int,
                    seed: int = 0) -> np.ndarray:
    """(T, H, W, 3) float32 [0, 1] clip from a procedural scene class."""
    cap = create_capture(kind, height=height, width=width, seed=seed)
    out = np.empty((num_frames, height, width, 3), np.float32)
    for t in range(num_frames):
        ok, frame = cap.read()
        assert ok
        out[t] = frame.astype(np.float32) / 255.0
    return out
