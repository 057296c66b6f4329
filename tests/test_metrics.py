"""Golden tests for adsr_tpu.metrics against independent oracles.

Oracles here are written from the mathematical spec (uniform-kernel SSIM with
reflect/zero padding, BT.601 luma weights, the reference's C1/C2 conventions)
using naive sliding windows and torch.nn.functional.conv2d — independent of the
integral-image / separable-conv implementations under test.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from adsr_tpu import metrics as M

RNG = np.random.RandomState(0)


def naive_box_filter(x, win, pad_mode):
    """O(HW*win^2) sliding-window mean filter oracle."""
    pad = win // 2
    if pad_mode == "reflect":
        xp = np.pad(x, pad, mode="reflect")
    else:
        xp = np.pad(x, pad, mode="constant")
    h, w = x.shape
    out = np.empty((h, w), dtype=np.float64)
    for i in range(h):
        for j in range(w):
            out[i, j] = xp[i:i + win, j:j + win].mean()
    return out.astype(np.float32)


def naive_ssim(ref, out, win, c1, c2, pad_mode):
    if ref.ndim == 3:
        if ref.shape[2] > 1:
            coeffs = np.array([65.738, 129.057, 25.064], np.float32) / 256.0
            ref = ref @ coeffs
            out = out @ coeffs
        else:
            ref, out = ref[..., 0], out[..., 0]
    f = lambda z: naive_box_filter(z, win, pad_mode)
    mu1, mu2 = f(ref), f(out)
    s1 = f(ref * ref) - mu1 ** 2
    s2 = f(out * out) - mu2 ** 2
    s12 = f(ref * out) - mu1 * mu2
    return ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / (
        (mu1 ** 2 + mu2 ** 2 + c1) * (s1 + s2 + c2))


class TestPsnrNp:
    def test_identical_is_inf(self):
        x = RNG.rand(16, 16).astype(np.float32)
        assert M.psnr_np(x, x) == float("inf")

    def test_known_value(self):
        ref = np.zeros((8, 8), np.float32)
        out = np.full((8, 8), 0.1, np.float32)
        # mse = 0.01 -> psnr = 10*log10(1/0.01) = 20
        assert M.psnr_np(ref, out) == pytest.approx(20.0, abs=1e-4)

    def test_data_range(self):
        ref = np.zeros((8, 8), np.float32)
        out = np.full((8, 8), 25.5, np.float32)
        assert M.psnr_np(ref, out, data_range=255.0) == pytest.approx(20.0, abs=1e-4)


class TestSsimNp:
    @pytest.mark.parametrize("win", [3, 7, 11])
    def test_matches_naive_gray(self, win):
        a = RNG.rand(24, 20).astype(np.float32)
        b = np.clip(a + 0.05 * RNG.randn(24, 20).astype(np.float32), 0, 1)
        want = float(naive_ssim(a, b, win, 1e-4, 9e-4, "reflect").mean())
        got = M.ssim_np(a, b, win_size=win)
        assert got == pytest.approx(want, abs=2e-5)

    def test_matches_naive_rgb(self):
        a = RNG.rand(16, 16, 3).astype(np.float32)
        b = np.clip(a + 0.1 * RNG.randn(16, 16, 3).astype(np.float32), 0, 1)
        want = float(naive_ssim(a, b, 7, 1e-4, 9e-4, "reflect").mean())
        assert M.ssim_np(a, b, win_size=7) == pytest.approx(want, abs=2e-5)

    def test_identical_is_one(self):
        a = RNG.rand(16, 16).astype(np.float32)
        assert M.ssim_np(a, a) == pytest.approx(1.0, abs=1e-6)

    def test_singleton_channel(self):
        a = RNG.rand(16, 16, 1).astype(np.float32)
        b = RNG.rand(16, 16, 1).astype(np.float32)
        assert M.ssim_np(a, b) == pytest.approx(
            M.ssim_np(a[..., 0], b[..., 0]), abs=1e-6)


class TestDeviceTwins:
    def test_ssim_eval_matches_np(self):
        a = RNG.rand(2, 20, 20, 1).astype(np.float32)
        b = np.clip(a + 0.05 * RNG.randn(2, 20, 20, 1).astype(np.float32), 0, 1)
        got = np.asarray(M.ssim_eval(jnp.asarray(a), jnp.asarray(b), 7))
        for i in range(2):
            assert got[i] == pytest.approx(M.ssim_np(a[i], b[i], 7), abs=3e-5)

    def test_ssim_eval_rgb(self):
        a = RNG.rand(1, 16, 16, 3).astype(np.float32)
        b = np.clip(a + 0.1 * RNG.randn(1, 16, 16, 3).astype(np.float32), 0, 1)
        got = float(M.ssim_eval(jnp.asarray(a), jnp.asarray(b), 5)[0])
        assert got == pytest.approx(M.ssim_np(a[0], b[0], 5), abs=3e-5)

    def test_psnr_eval_matches_np(self):
        a = RNG.rand(3, 12, 12, 1).astype(np.float32)
        b = RNG.rand(3, 12, 12, 1).astype(np.float32)
        got = np.asarray(M.psnr_eval(jnp.asarray(a), jnp.asarray(b)))
        for i in range(3):
            assert got[i] == pytest.approx(M.psnr_np(a[i], b[i]), abs=1e-3)


class TestTorchParity:
    """Cross-check the shave-4 validation metrics against a torch oracle."""

    def _torch_ssim(self, sr, hr, rgb_range, win):
        import torch
        import torch.nn.functional as F
        sr = torch.from_numpy(sr).permute(0, 3, 1, 2)
        hr = torch.from_numpy(hr).permute(0, 3, 1, 2)
        sr = sr[..., :hr.shape[-2], :hr.shape[-1]]
        sr = (sr / rgb_range).clamp(0, 1)
        hr = (hr / rgb_range).clamp(0, 1)
        if sr.shape[-1] > 8:
            sr = sr[..., 4:-4, 4:-4]
            hr = hr[..., 4:-4, 4:-4]
        if sr.shape[1] > 1:
            cv = torch.tensor([65.738, 129.057, 25.064]).view(1, 3, 1, 1) / 256
            sr = (sr * cv).sum(1, keepdim=True)
            hr = (hr * cv).sum(1, keepdim=True)
        c1, c2 = (0.01 * 255.0) ** 2, (0.03 * 255.0) ** 2
        k = torch.ones(1, 1, win, win) / (win * win)
        p = win // 2
        mu1, mu2 = F.conv2d(sr, k, padding=p), F.conv2d(hr, k, padding=p)
        s1 = F.conv2d(sr * sr, k, padding=p) - mu1 ** 2
        s2 = F.conv2d(hr * hr, k, padding=p) - mu2 ** 2
        s12 = F.conv2d(sr * hr, k, padding=p) - mu1 * mu2
        m = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / (
            (mu1 ** 2 + mu2 ** 2 + c1) * (s1 + s2 + c2))
        return float(m.mean())

    def test_ssim_shave4(self):
        sr = (RNG.rand(1, 32, 32, 1) * 255).astype(np.float32)
        hr = np.clip(sr + 10 * RNG.randn(1, 32, 32, 1), 0, 255).astype(np.float32)
        want = self._torch_ssim(sr, hr, 255.0, 11)
        got = float(M.ssim_shave4(jnp.asarray(sr), jnp.asarray(hr), 255.0)[0])
        assert got == pytest.approx(want, abs=5e-5)

    def test_ssim_shave4_rgb(self):
        sr = (RNG.rand(1, 24, 24, 3) * 255).astype(np.float32)
        hr = np.clip(sr + 20 * RNG.randn(1, 24, 24, 3), 0, 255).astype(np.float32)
        want = self._torch_ssim(sr, hr, 255.0, 11)
        got = float(M.ssim_shave4(jnp.asarray(sr), jnp.asarray(hr), 255.0)[0])
        assert got == pytest.approx(want, abs=5e-5)

    def test_psnr_shave4(self):
        sr = (RNG.rand(2, 32, 32, 1) * 255).astype(np.float32)
        hr = np.clip(sr + 10 * RNG.randn(2, 32, 32, 1), 0, 255).astype(np.float32)
        diff = (sr - hr) / 255.0
        diff = diff[:, 4:-4, 4:-4, :]
        for i in range(2):
            want = 10 * np.log10(1.0 / np.mean(diff[i] ** 2))
            got = float(M.psnr_shave4(jnp.asarray(sr), jnp.asarray(hr), 255.0)[i])
            assert got == pytest.approx(want, rel=1e-4)

    def test_small_image_no_shave(self):
        sr = (RNG.rand(1, 6, 6, 1) * 255).astype(np.float32)
        hr = (RNG.rand(1, 6, 6, 1) * 255).astype(np.float32)
        want = 10 * np.log10(1.0 / np.mean(((sr - hr) / 255.0) ** 2))
        got = float(M.psnr_shave4(jnp.asarray(sr), jnp.asarray(hr), 255.0)[0])
        assert got == pytest.approx(want, rel=1e-4)


class TestQuantize:
    def test_roundtrip_255(self):
        x = jnp.asarray([[0.4, 254.6, -3.0, 300.0]])
        out = np.asarray(M.quantize(x, 255.0))
        assert out.tolist() == [[0.0, 255.0, 0.0, 255.0]]

    def test_grid_values(self):
        x = jnp.linspace(0, 255, 32)
        out = np.asarray(M.quantize(x, 255.0))
        assert np.allclose(out, np.round(np.asarray(x)))
