"""Video-file inference I/O (data/video_io.py + cli.main --input_video /
--output_video) — a capability extension over the reference, which only
consumes PNG frame directories (reference lib/dataloader.py:11-50)."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from tecogan_tpu.data.video_io import (  # noqa: E402
    VideoFrameWriter, read_video_frames,
)

H, W = 16, 16


def _write_video(path, frames, fps=12.0):
    w = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), fps,
                        (frames.shape[2], frames.shape[1]))
    if not w.isOpened():
        pytest.skip("mp4v codec unavailable in this cv2 build")
    for f in frames:
        w.write(f[:, :, ::-1])
    w.release()


def _smooth_frames(rng, t, h=H, w=W):
    """Low-frequency content so lossy mp4v stays near-exact."""
    base = cv2.GaussianBlur((rng.rand(h, w, 3) * 255).astype(np.uint8),
                            (0, 0), sigmaX=3)
    return np.stack([np.clip(base.astype(int) + 8 * i, 0, 255).astype(np.uint8)
                     for i in range(t)])


def test_read_video_frames_roundtrip(rng, tmp_path):
    frames = _smooth_frames(rng, 7)
    p = tmp_path / "clip.mp4"
    _write_video(p, frames, fps=12.0)

    got, fps = read_video_frames(str(p))
    assert got.shape == (7, H, W, 3) and got.dtype == np.uint8
    assert abs(fps - 12.0) < 0.5
    assert np.mean(np.abs(got.astype(int) - frames.astype(int))) < 4.0

    got_f, _ = read_video_frames(str(p), max_frames=3, as_uint8=False)
    assert got_f.shape == (3, H, W, 3) and got_f.dtype == np.float32
    assert 0.0 <= got_f.min() and got_f.max() <= 1.0

    # max_frames <= 0 = unlimited, matching the PNG-directory contract.
    assert read_video_frames(str(p), max_frames=0)[0].shape[0] == 7


def test_read_video_frames_missing_file(tmp_path):
    with pytest.raises(FileNotFoundError):
        read_video_frames(str(tmp_path / "nope.mp4"))


def test_video_frame_writer_sequential_and_ordering(rng, tmp_path):
    p = tmp_path / "out.mp4"
    frames = _smooth_frames(rng, 6, h=32, w=32)
    w = VideoFrameWriter(str(p), fps=10.0)
    w.submit(frames[:4], 0)
    w.submit(frames[4:], 4)
    assert w.close() == 6
    back, fps = read_video_frames(str(p))
    assert back.shape == (6, 32, 32, 3) and abs(fps - 10.0) < 0.5

    w = VideoFrameWriter(str(tmp_path / "bad.mp4"), fps=10.0)
    w.submit(frames[:2], 0)
    w.submit(frames[2:4], 5)  # gap: out of order
    with pytest.raises(ValueError, match="out-of-order"):
        w.close()


def test_video_frame_writer_rejects_unknown_ext(tmp_path):
    # Fails fast in the constructor, before any compute is spent.
    with pytest.raises(ValueError, match="extension"):
        VideoFrameWriter(str(tmp_path / "out.webm"), fps=10.0)


def test_video_frame_writer_warmup_start_enforced(rng, tmp_path):
    frames = _smooth_frames(rng, 3, h=32, w=32)
    w = VideoFrameWriter(str(tmp_path / "o.mp4"), fps=10.0, warmup=5)
    w.submit(frames, 0)  # must start at warmup=5
    with pytest.raises(ValueError, match="out-of-order"):
        w.close()
    w = VideoFrameWriter(str(tmp_path / "o.mp4"), fps=10.0, warmup=5)
    w.submit(frames, 5)
    assert w.close() == 3


def test_cli_video_input_matches_png_input(rng, tmp_path):
    """--input_video must equal the PNG-dir path on identical pixels:
    decode the (lossy) clip once, feed BOTH paths those exact frames."""
    from tecogan_tpu.cli import main as cli_main

    clip = tmp_path / "clip.mp4"
    _write_video(clip, _smooth_frames(rng, 8), fps=8.0)
    decoded, _ = read_video_frames(str(clip))

    png_dir = tmp_path / "LR"
    png_dir.mkdir()
    for i, f in enumerate(decoded):
        cv2.imwrite(str(png_dir / f"{i:04d}.png"), f[:, :, ::-1])

    common = ["--allow_random_weights", "--num_resblock", "2"]
    cli_main.main(["--mode", "inference", "--input_video", str(clip),
                   "--output_dir", str(tmp_path / "from_video")] + common)
    cli_main.main(["--mode", "inference", "--input_dir_LR", str(png_dir),
                   "--output_dir", str(tmp_path / "from_png")] + common)

    got = sorted(os.listdir(tmp_path / "from_video"))
    want = sorted(os.listdir(tmp_path / "from_png"))
    got = [f for f in got if f.endswith(".png")]
    want = [f for f in want if f.endswith(".png")]
    assert got == want and len(got) == 8
    for f in got:
        a = cv2.imread(str(tmp_path / "from_video" / f))
        b = cv2.imread(str(tmp_path / "from_png" / f))
        np.testing.assert_array_equal(a, b)


def test_cli_serve_video_streams(rng, tmp_path):
    """cli.serve accepts video files as stream sources (mixed with PNG
    dirs) and --output_videos encodes one HR mp4 per stream."""
    from tecogan_tpu.cli import serve as cli_serve

    clip_a = tmp_path / "clip_a.mp4"
    _write_video(clip_a, _smooth_frames(rng, 8), fps=8.0)
    png_dir = tmp_path / "scene_b"
    png_dir.mkdir()
    for i, f in enumerate(_smooth_frames(rng, 6)):
        cv2.imwrite(str(png_dir / f"{i:04d}.png"), f[:, :, ::-1])

    out = tmp_path / "served"
    cli_serve.main([
        "--input_dirs", f"{clip_a},{png_dir}",
        "--output_dir", str(out), "--max_streams", "2",
        "--output_videos", "--allow_random_weights", "--num_resblock", "2",
    ])
    hr_a, fps_a = read_video_frames(str(out / "clip_a.mp4"))
    hr_b, _ = read_video_frames(str(out / "scene_b.mp4"))
    assert hr_a.shape == (8, 4 * H, 4 * W, 3)
    assert hr_b.shape == (6, 4 * H, 4 * W, 3)
    assert abs(fps_a - 8.0) < 0.5


def test_cli_video_output(rng, tmp_path):
    """--output_video encodes the HR stream: right count, 4x size, source
    fps carried over, content near the PNG outputs (mp4v is lossy)."""
    from tecogan_tpu.cli import main as cli_main

    clip = tmp_path / "clip.mp4"
    _write_video(clip, _smooth_frames(rng, 8), fps=8.0)

    common = ["--allow_random_weights", "--num_resblock", "2"]
    cli_main.main(["--mode", "inference", "--input_video", str(clip),
                   "--output_dir", str(tmp_path / "png_out")] + common)
    cli_main.main(["--mode", "inference", "--input_video", str(clip),
                   "--output_dir", str(tmp_path / "vid_out"),
                   "--output_video", "sr.mp4"] + common)

    out = tmp_path / "vid_out" / "sr.mp4"
    assert out.exists()
    hr, fps = read_video_frames(str(out))
    assert hr.shape == (8, 4 * H, 4 * W, 3)
    assert abs(fps - 8.0) < 0.5  # source fps carried over
    ref = np.stack([
        cv2.imread(str(tmp_path / "png_out" / f))[:, :, ::-1]
        for f in sorted(os.listdir(tmp_path / "png_out"))
        if f.endswith(".png")])
    # mp4v is lossy and the random-weight HR output is noise-like; mean
    # |diff| ~14 from codec loss alone vs ~60 for unrelated content.
    assert np.mean(np.abs(hr.astype(int) - ref.astype(int))) < 30.0
