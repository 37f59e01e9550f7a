"""Pipeline-parallel streaming (parallel/pipeline.py) vs StreamingSR.

The two-stage pipelined engine must produce the same outputs as the
single-device engine: same batched-fnet prologue, same scan body, same
warm-up and quantization handling (SURVEY.md §2.3 pipeline row).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tecogan_tpu.config import TecoConfig
from tecogan_tpu.models import FNet, Generator
from tecogan_tpu.parallel import PipelinedStreamingSR
from tecogan_tpu.recurrent.inference import StreamingSR


@pytest.fixture(scope="module")
def small_setup():
    cfg = TecoConfig(num_resblock=2, compute_dtype="float32", infer_chunk=3)
    gen = Generator(num_resblock=cfg.num_resblock, channels=cfg.gen_channels)
    fnet = FNet(channels=cfg.fnet_channels, up_channels=cfg.fnet_up_channels,
                max_velocity=cfg.flow_max_velocity)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    h, w = 16, 16
    gp = gen.init(k1, jnp.zeros((1, h, w, 51)))["params"]
    fp = fnet.init(k2, jnp.zeros((1, h, w, 6)))["params"]
    frames = np.random.RandomState(0).rand(8, h, w, 3).astype(np.float32)
    return cfg, gp, fp, frames


def test_pipelined_matches_streaming(small_setup):
    cfg, gp, fp, frames = small_setup
    ref, _ = StreamingSR(cfg, gp, fp, output="float32").run(frames, warmup=2)
    pipe = PipelinedStreamingSR(cfg, gp, fp, output="float32")
    assert pipe.flow_device != pipe.recurrent_device
    got, _ = pipe.run(frames, warmup=2)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_pipelined_uint8_and_ragged_chunks(small_setup):
    cfg, gp, fp, frames = small_setup
    # 8 frames / chunk 3 exercises the padded final chunk on both engines.
    ref, _ = StreamingSR(cfg, gp, fp, output="uint8").run(frames)
    got, _ = PipelinedStreamingSR(cfg, gp, fp, output="uint8").run(frames)
    assert got.dtype == np.uint8 and got.shape == ref.shape
    # Quantized outputs may differ by 1 ulp where the float is on a .5
    # boundary across device placements; require near-exactness.
    assert np.mean(got != ref) < 1e-3
    np.testing.assert_array_compare(lambda a, b: np.abs(
        a.astype(np.int16) - b.astype(np.int16)) <= 1, got, ref)


def test_pipelined_requires_two_devices(small_setup, monkeypatch):
    cfg, gp, fp, _ = small_setup
    dev0 = jax.devices()[0]
    monkeypatch.setattr(jax, "devices", lambda: [dev0])
    with pytest.raises(ValueError, match="two devices"):
        PipelinedStreamingSR(cfg, gp, fp)
