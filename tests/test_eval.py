"""Eval suite tests: quality metrics golden checks, LPIPS vs an independent
torch implementation, end-to-end CSV generation."""

import os

import numpy as np
import pytest

from tecogan_tpu.eval import (
    LPIPS,
    crop_8x8,
    evaluate_folders,
    psnr,
    rgb2ycbcr,
    ssim,
    ssim_y,
    to_uint8,
)

REF_LIN = "/root/reference/LPIPSmodels/v0.1/alex.pth"


def test_crop_8x8_protocol():
    img = np.zeros((576, 720, 3))
    c, y, x = crop_8x8(img)
    assert c.shape == (544, 704, 3) and (y, x) == (16, 8)
    img = np.zeros((48, 48))
    c, y, x = crop_8x8(img)
    assert c.shape == (32, 32) and (y, x) == (8, 8)


def test_psnr_golden(rng):
    a = rng.rand(64, 64, 3) * 255
    b = np.clip(a + 10.0, 0, 255)
    # Independent computation: Y diff of rounded-uint8 images.
    T = np.array([0.256788235294118, 0.504129411764706, 0.097905882352941])
    ya = np.clip(np.round(a), 0, 255) @ T + 16
    yb = np.clip(np.round(b), 0, 255) @ T + 16
    expect = 20 * np.log10(255.0 / np.sqrt(np.mean((ya - yb) ** 2)))
    np.testing.assert_allclose(psnr(a, b), expect, rtol=1e-6)
    assert psnr(a, a) == np.inf or psnr(a, a) > 100  # identical -> inf rmse=0


def test_ssim_constant_images_closed_form():
    # Constant images: variances/covariance are 0 -> closed form
    # S = (2 u1 u2 + C1) C2 / ((u1^2 + u2^2 + C1) C2).
    u1, u2, dr = 100.0, 120.0, 50.0
    c1 = (0.01 * dr) ** 2
    expect = (2 * u1 * u2 + c1) / (u1**2 + u2**2 + c1)
    got = ssim_y(np.full((64, 64), u1), np.full((64, 64), u2), data_range=dr)
    np.testing.assert_allclose(got, expect, rtol=1e-10)


def test_ssim_identity_and_monotonicity(rng):
    a = (rng.rand(64, 64, 3) * 255).astype(np.float32)
    assert ssim(a, a) == pytest.approx(1.0, abs=1e-7)
    noisy1 = np.clip(a + rng.randn(64, 64, 3) * 5, 0, 255)
    noisy2 = np.clip(a + rng.randn(64, 64, 3) * 40, 0, 255)
    assert ssim(a, noisy1) > ssim(a, noisy2)


def test_rgb2ycbcr_range():
    white = rgb2ycbcr(np.full((2, 2, 3), 255.0))
    np.testing.assert_allclose(white[..., 0], 235.0, atol=0.5)
    black = rgb2ycbcr(np.zeros((2, 2, 3)))
    np.testing.assert_allclose(black[..., 0], 16.0, atol=0.5)


def test_lpips_matches_torch_reference(rng):
    """JAX LPIPS vs an independently-coded torch LPIPS with identical
    random backbone weights and the real v0.1 lin weights."""
    torch = pytest.importorskip("torch")
    from tecogan_tpu.eval.lpips import (
        load_lin_weights_pth,
        random_alexnet_params,
    )
    import jax

    alex = jax.tree.map(np.asarray, random_alexnet_params(jax.random.PRNGKey(7)))
    if os.path.exists(REF_LIN):
        lin = load_lin_weights_pth(REF_LIN)
    else:
        lin = [np.abs(rng.randn(c)).astype(np.float32)
               for c in (64, 192, 384, 256, 256)]

    model = LPIPS(alex, lin)
    img0 = (rng.rand(1, 64, 64, 3) * 2 - 1).astype(np.float32)
    img1 = (rng.rand(1, 64, 64, 3) * 2 - 1).astype(np.float32)
    got = model(img0, img1)

    # --- independent torch path (NCHW) ---
    import torch.nn.functional as F

    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def feats(x):
        convs = [(4, 2), (1, 2), (1, 1), (1, 1), (1, 1)]
        out = []
        for i, (s, p) in enumerate(convs):
            w = torch.tensor(alex[f"conv{i}"]["w"]).permute(3, 2, 0, 1)
            b = torch.tensor(alex[f"conv{i}"]["b"])
            x = F.relu(F.conv2d(x, w, b, stride=s, padding=p))
            out.append(x)
            if i in (0, 1):
                x = F.max_pool2d(x, 3, stride=2)
        return out

    t0 = (torch.tensor(img0).permute(0, 3, 1, 2) - shift) / scale
    t1 = (torch.tensor(img1).permute(0, 3, 1, 2) - shift) / scale
    val = torch.zeros(1)
    for l, (a, b) in enumerate(zip(feats(t0), feats(t1))):
        na = a / (a.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
        nb = b / (b.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
        d = (na - nb).pow(2)
        w = torch.tensor(lin[l]).view(1, -1, 1, 1)
        val = val + (d * w).sum(1).mean(dim=(1, 2))
    np.testing.assert_allclose(got, val.numpy(), rtol=2e-4, atol=1e-5)


def test_evaluate_folders_csv(tmp_path, rng):
    """End-to-end: two small folders -> metrics.csv in reference layout."""
    cv2 = pytest.importorskip("cv2")
    res, tar = tmp_path / "res", tmp_path / "tar"
    res.mkdir(), tar.mkdir()
    n = 8
    base = (rng.rand(48, 48, 3) * 255).astype(np.uint8)
    for i in range(n):
        shifted = np.roll(base, i, axis=1)
        cv2.imwrite(str(tar / f"frame_{i:04d}.png"), shifted)
        noisy = np.clip(shifted.astype(int) + rng.randint(-6, 6, shifted.shape),
                        0, 255).astype(np.uint8)
        cv2.imwrite(str(res / f"frame_{i:04d}.png"), noisy)

    out = tmp_path / "metrics_out"
    overall = evaluate_folders([str(res)], [str(tar)], str(out), verbose=False)
    assert (out / "metrics.csv").exists()
    assert "FrameAvg_PSNR" in overall and "FrameAvg_tOF" in overall
    assert 10 < overall["FrameAvg_PSNR"] < 60
    assert overall["FrameAvg_SSIM"] <= 1.0
    # LPIPS keys dropped (no backbone weights in env)
    assert "FrameAvg_LPIPS" not in overall
    text = (out / "metrics.csv").read_text()
    assert "PSNR_00" in text and "Avg_PSNR" in text and "FolderAvg_tOF" in text
