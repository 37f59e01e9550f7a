"""End-to-end numeric self-parity regression.

Pins a fixed-seed pipeline — FRVSR training on synthetic scenes ->
streaming inference -> metric suite — to recorded PSNR/tOF values, so any
semantic drift in the TF1-exact ops (warp border clamp, legacy bilinear,
gaussian down-4, Catmull-Rom padding, loss reductions, BT.601 metrics)
trips CI even when each op's golden test still passes in isolation.
This is the offline stand-in for the pretrained-model parity gate
(BASELINE.md north star: PSNR within 0.1 dB / tOF within 2% of the
published checkpoint, which needs network-gated weights).

Recorded on CPU float32 (highest matmul precision, tests/conftest.py) —
tolerances absorb cross-version numeric noise but not semantic changes,
which move PSNR by ~1 dB or more.
"""

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from tecogan_tpu.config import TecoConfig
from tecogan_tpu.data.synthetic import synthetic_clip
from tecogan_tpu.eval.suite import evaluate_folders
from tecogan_tpu.ops import gauss_down_by4
from tecogan_tpu.recurrent.inference import StreamingSR
from tecogan_tpu.train import Trainer

# Recorded 2026-08-18 (jax 0.9.0, CPU float32, highest precision).
# Re-pinned after the flat-layout warp gather (ops/warp.py): forward and
# flow grads are bit-identical, but the image-grad scatter-add order
# reassociates (1 f32 ulp), which a fixed-seed training run amplifies
# chaotically (PSNR moved +0.18 dB, tOF -11%).
PINNED_PSNR = 20.4904
PINNED_TOF = 1.8408
PSNR_TOL = 0.1     # dB — the north-star tolerance (BASELINE.md)
TOF_RTOL = 0.02    # 2% — the north-star tolerance
# LPIPS/tLP100 pinned with a deterministic random-weight AlexNet fixture
# (eval/lpips.py:random_alexnet_params, PRNGKey(7), unit lin weights) —
# pins the metric *machinery* (feature taps, unit-norm, im2tensor, the
# consecutive-frame tLP protocol), not perceptual values.
# Recorded 2026-08-18 (same environment).
PINNED_LPIPS = 0.0066656
PINNED_TLP100 = 0.75888
LPIPS_RTOL = 0.02


def fixture_lpips():
    import jax as _jax

    from tecogan_tpu.eval.lpips import (
        ALEX_CHANNELS, LPIPS, random_alexnet_params,
    )

    alex = random_alexnet_params(_jax.random.PRNGKey(7))
    lin = [np.full((c,), 1.0 / c, np.float32) for c in ALEX_CHANNELS]
    return LPIPS(alex, lin)


def test_train_infer_eval_self_parity(tmp_path):
    cfg = TecoConfig(num_resblock=4, crop_size=8, batch_size=2, rnn_n=4,
                     ratio=-0.01, vgg_scaling=-0.002, learning_rate=2e-4,
                     remat_generator=False, compute_dtype="float32")
    tar = cfg.hr_load_size
    trainer = Trainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))

    clips = [synthetic_clip(cfg.rnn_n, 56, 56, seed=s) for s in range(4)]
    rng = np.random.RandomState(123)
    first_loss = last_loss = None
    for step in range(80):
        batch = np.empty((cfg.batch_size, cfg.rnn_n, tar, tar, 3), np.float32)
        for b in range(cfg.batch_size):
            clip = clips[int(rng.randint(len(clips)))]
            oy, ox = rng.randint(0, 56 - tar + 1, size=2)
            batch[b] = clip[:, oy:oy + tar, ox:ox + tar]
        state, metrics = trainer.train_step(state, jnp.asarray(batch))
        if step == 0:
            first_loss = float(metrics["l2_content_loss"])
        last_loss = float(metrics["l2_content_loss"])
    assert last_loss < first_loss  # it actually learned

    # Held-out clip through the HR->gaussian-LR inference path.
    hr_clip = synthetic_clip(12, 64, 64, seed=99)
    lr = np.asarray(gauss_down_by4(jnp.asarray(hr_clip), cfg.gaussian_sigma))
    sr = StreamingSR(cfg.replace(infer_chunk=6), state.gen_params,
                     state.fnet_params, output="uint8")
    out, _ = sr.run(lr.astype(np.float32))

    res, gt_dir = tmp_path / "res", tmp_path / "tar"
    res.mkdir(), gt_dir.mkdir()
    k, n = cfg.gauss_border, out.shape[1]
    for i in range(out.shape[0]):
        cv2.imwrite(str(res / f"f_{i:04d}.png"), out[i][:, :, ::-1])
        gt = np.clip(hr_clip[i, k:k + n, k:k + n] * 255.0, 0, 255).astype(np.uint8)
        cv2.imwrite(str(gt_dir / f"f_{i:04d}.png"), gt[:, :, ::-1])

    overall = evaluate_folders([str(res)], [str(gt_dir)], str(tmp_path / "m"),
                               keys=["PSNR", "tOF", "LPIPS", "tLP100"],
                               lpips_model=fixture_lpips(), verbose=False)
    psnr = overall["FrameAvg_PSNR"]
    tof = overall["FrameAvg_tOF"]
    assert abs(psnr - PINNED_PSNR) < PSNR_TOL, (psnr, PINNED_PSNR)
    assert abs(tof - PINNED_TOF) / PINNED_TOF < TOF_RTOL, (tof, PINNED_TOF)
    lp = overall["FrameAvg_LPIPS"]
    tlp = overall["FrameAvg_tLP100"]
    assert abs(lp - PINNED_LPIPS) / PINNED_LPIPS < LPIPS_RTOL, (lp, PINNED_LPIPS)
    assert abs(tlp - PINNED_TLP100) / PINNED_TLP100 < LPIPS_RTOL, (
        tlp, PINNED_TLP100)
