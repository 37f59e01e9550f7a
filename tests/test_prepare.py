"""Dataset-preparation tests (offline paths)."""

import os

import numpy as np
import pytest

from tecogan_tpu.data.prepare import VIDEO_DATA_DICT, extract_scene, prepare
from tecogan_tpu.data.synthetic import synthetic_clip


def test_video_dict_shape():
    # 28 curated videos (reference dataPrepare.py:26-62).
    assert len(VIDEO_DATA_DICT) == 28
    assert all(len(v) >= 1 for v in VIDEO_DATA_DICT.values())


@pytest.fixture(scope="module")
def video_file(tmp_path_factory):
    cv2 = pytest.importorskip("cv2")
    d = tmp_path_factory.mktemp("video")
    path = str(d / "121649159.mp4")
    clip = (synthetic_clip(20, 120, 160, seed=1) * 255).astype(np.uint8)
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 24, (160, 120))
    for f in clip:
        vw.write(f[:, :, ::-1])
    vw.release()
    return path


def test_extract_scene_halfres(video_file, tmp_path):
    cv2 = pytest.importorskip("cv2")
    out = str(tmp_path / "scene_2000")
    n = extract_scene(video_file, 2, out, duration=6)
    assert n == 6
    im = cv2.imread(os.path.join(out, "col_high_0000.png"))
    assert im.shape == (60, 80, 3)  # 0.5x INTER_AREA (reference video.py:168-173)


def test_prepare_local_only(video_file, tmp_path):
    out = str(tmp_path / "scenes")
    n = prepare(out, os.path.dirname(video_file), duration=3,
                start_id=2000, download=False, test_only=True)
    # One local video with 5 start frames -> 5 scene dirs.
    assert n == 5
    assert os.path.isdir(os.path.join(out, "scene_2000"))
