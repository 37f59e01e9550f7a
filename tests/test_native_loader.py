"""Native C++ loader: build, decode parity vs cv2, batch parity vs the
python executor (same seed -> bit-identical batches)."""

import shutil

import numpy as np
import pytest

from tecogan_tpu.config import TecoConfig
from tecogan_tpu.data.loader import BatchLoader, SceneDataset, png_dims
from tecogan_tpu.data.synthetic import write_synthetic_scenes

pytestmark = pytest.mark.skipif(
    shutil.which("g++") is None, reason="no C++ toolchain"
)


@pytest.fixture(scope="module")
def scene_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("nat_scenes")
    write_synthetic_scenes(str(root), num_scenes=2, num_frames=12,
                           height=96, width=112, start_index=2000)
    return str(root)


@pytest.fixture(scope="module")
def cfg(scene_root):
    return TecoConfig(
        input_video_dir=scene_root, str_dir=2000, end_dir=2001,
        end_dir_val=2002, max_frm=11, rnn_n=3, crop_size=8,
        batch_size=4, queue_thread=2,
    )


def test_build_and_decode(scene_root):
    cv2 = pytest.importorskip("cv2")
    from tecogan_tpu.data.native_loader import decode_png, native_available

    assert native_available()
    p = f"{scene_root}/scene_2000/col_high_0000.png"
    native = decode_png(p)
    ref = cv2.imread(p, 3)[:, :, ::-1].astype(np.float32) / 255.0
    np.testing.assert_array_equal(native, ref)


def test_png_dims(scene_root):
    assert png_dims(f"{scene_root}/scene_2000/col_high_0000.png") == (96, 112)


def test_decode_frames_u8_matches_float(scene_root):
    """The direct uint8 decode == the f32 decode rescaled (f32 is k/255
    exactly, so *255 round-trips bit-perfectly)."""
    from tecogan_tpu.data.native_loader import NativeFrameIO

    paths = [f"{scene_root}/scene_2000/col_high_{i:04d}.png"
             for i in range(4)]
    io = NativeFrameIO(2)
    try:
        u8 = io.decode_frames_u8(paths)
        f32 = io.decode_frames(paths)
    finally:
        io.close()
    assert u8.dtype == np.uint8 and u8.shape == f32.shape
    np.testing.assert_array_equal(
        u8, np.round(f32 * 255.0).astype(np.uint8))


def test_plan_matches_load_sequence(cfg, rng):
    """plan_sequence + load_plan == the original one-shot load_sequence."""
    ds = SceneDataset(cfg)
    for idx in (0, 3, 7):
        seq_direct = ds.load_sequence(idx, np.random.RandomState(idx))
        plan = ds.plan_sequence(idx, np.random.RandomState(idx))
        seq_plan = ds.load_plan(plan)
        np.testing.assert_array_equal(seq_direct, seq_plan)


def test_native_batches_bitmatch_python(cfg):
    """Same seed -> the native and python executors emit identical batches."""
    ds = SceneDataset(cfg)
    with BatchLoader(ds, seed=7) as py_loader:
        b_py = [py_loader.next_batch() for _ in range(3)]
    with BatchLoader(ds, seed=7, executor="native") as nat_loader:
        b_nat = [nat_loader.next_batch() for _ in range(3)]
    for a, b in zip(b_py, b_nat):
        np.testing.assert_array_equal(a, b)


def test_frame_cache_bitmatch_and_eviction(cfg):
    """The decoded-frame LRU (loadHR_batch analog) must not change a single
    bit of any batch, at a generous budget, a 1 MB thrashing budget, and
    off — for BOTH executors (C++ FrameCache and python _FrameLRU)."""
    ref_batches = None
    for executor in ("python", "native"):
        for mb in (0, 1, 64):
            c = cfg.replace(loader_cache_mb=mb)
            with BatchLoader(SceneDataset(c), seed=11,
                             executor=executor) as loader:
                got = [loader.next_batch() for _ in range(3)]
            if ref_batches is None:
                ref_batches = got
            else:
                for a, b in zip(ref_batches, got):
                    np.testing.assert_array_equal(a, b)


def test_uint8_batches_match_float(cfg):
    """train_upload_uint8 batches are exactly the float batches * 255
    (same decoded source pixels) for BOTH executors."""
    for executor in ("python", "native"):
        with BatchLoader(SceneDataset(cfg.replace(train_upload_uint8=True)),
                         seed=3, executor=executor) as lu:
            b_u8 = lu.next_batch()
        with BatchLoader(SceneDataset(cfg.replace(train_upload_uint8=False)),
                         seed=3, executor=executor) as lf:
            b_f = lf.next_batch()
        assert b_u8.dtype == np.uint8 and b_f.dtype == np.float32
        np.testing.assert_array_equal(
            b_u8, np.round(b_f * 255.0).astype(np.uint8))


def test_native_executor_moving_first_frame(cfg):
    """Force the movingFirstFrame branch (repeated paths, per-frame crops)."""
    from tecogan_tpu.data.native_loader import NativeExecutor

    ds = SceneDataset(cfg.replace(moving_first_frame_prob=1.0))
    plan = ds.plan_sequence(0, np.random.RandomState(3))
    assert len(set(plan.paths)) == 1  # static first frame repeated
    ex = NativeExecutor(num_threads=2, rnn_n=cfg.rnn_n, tar=cfg.hr_load_size)
    batch = ex.load([plan])
    ref = ds.load_plan(plan)
    np.testing.assert_array_equal(batch[0], ref)
    ex.close()
