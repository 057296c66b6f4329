"""PSNR / SSIM metric primitives — the numerical spec of the framework.

Anomaly scores in this system ARE metric values (1-SSIM, MSE, -PSNR), so these
functions reproduce the reference formulas exactly:

- ``psnr_np`` / ``ssim_np``        — parity with the reference's numpy metrics
  (reference src/metrics.py:15-67): uniform box kernel, *reflect* padding,
  optional BT.601 luma conversion, data_range default 1.0 (the reference casts
  to float32 before checking dtype, so its "255 for ints" branch is dead —
  reproduced here by defaulting to 1.0).
- ``psnr_shave4`` / ``ssim_shave4`` — parity with the reference's torch metrics
  (src/metrics.py:70-108): divide by rgb_range, shave a 4px border, luma
  convert, *zero* padding, C1=(0.01*255)^2-style constants applied to [0,1]
  signals (a reference quirk, reproduced).
- ``ssim_map`` — the shared SSIM-map computation, also used by the SSIM loss
  (src/loss.py:9-52 uses shave=scale+6 and a pixel-*sum* reduction; that
  call-site lives in adsr_tpu.train.losses).

Host (numpy) versions use float64 integral images — O(HW) regardless of window
size, exactly matching the naive O(HW*win^2) convolution the reference runs.
Device (jax) versions use separable depthwise convolutions at HIGHEST precision
so MXU bf16 passes cannot perturb metric parity.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

# BT.601 luma coefficients as used by the reference (metrics.py:37, 93):
# weighted sum only — no +16 offset.
_LUMA_COEFFS = (65.738 / 256.0, 129.057 / 256.0, 25.064 / 256.0)


# --------------------------------------------------------------------------- #
# Host (numpy) reference implementations
# --------------------------------------------------------------------------- #

def psnr_np(img_ref: np.ndarray, img: np.ndarray,
            data_range: Optional[float] = None) -> float:
    """PSNR between two arrays; parity with reference psnr_numpy (metrics.py:15-23)."""
    ref = np.asarray(img_ref, dtype=np.float32)
    out = np.asarray(img, dtype=np.float32)
    if data_range is None:
        data_range = 1.0  # reference quirk: dtype checked after float32 cast
    mse = float(np.mean((ref - out) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * float(np.log10((data_range ** 2) / mse))


def _box_filter_reflect_np(x: np.ndarray, win: int) -> np.ndarray:
    """Uniform win x win mean filter with reflect padding via f64 integral image."""
    pad = win // 2
    xp = np.pad(x, pad, mode="reflect").astype(np.float64)
    ii = xp.cumsum(axis=0).cumsum(axis=1)
    ii = np.pad(ii, ((1, 0), (1, 0)))
    h, w = x.shape
    s = (ii[win:win + h, win:win + w] - ii[:h, win:win + w]
         - ii[win:win + h, :w] + ii[:h, :w])
    return (s / float(win * win)).astype(np.float32)


def to_luma_np(img: np.ndarray) -> np.ndarray:
    """HxWx3 -> HxW BT.601 luma (no offset); HxWx1 -> HxW; HxW passthrough."""
    if img.ndim == 3:
        if img.shape[2] > 1:
            coeffs = np.asarray(_LUMA_COEFFS, dtype=np.float32)
            return np.tensordot(img[..., :3], coeffs, axes=([2], [0]))
        return img[:, :, 0]
    return img


def ssim_np(img_ref: np.ndarray, img: np.ndarray, win_size: int = 11,
            data_range: Optional[float] = None) -> float:
    """Mean SSIM; parity with reference ssim_numpy (metrics.py:26-67).

    Uniform kernel, reflect padding, luma conversion for 3-channel inputs.
    """
    ref = np.asarray(img_ref, dtype=np.float32)
    out = np.asarray(img, dtype=np.float32)
    if data_range is None:
        data_range = 1.0
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    ref = to_luma_np(ref)
    out = to_luma_np(out)

    mu1 = _box_filter_reflect_np(ref, win_size)
    mu2 = _box_filter_reflect_np(out, win_size)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _box_filter_reflect_np(ref * ref, win_size) - mu1_sq
    sigma2_sq = _box_filter_reflect_np(out * out, win_size) - mu2_sq
    sigma12 = _box_filter_reflect_np(ref * out, win_size) - mu1_mu2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2))
    return float(np.mean(ssim_map))


# --------------------------------------------------------------------------- #
# Device (jax) implementations — NHWC layout
# --------------------------------------------------------------------------- #

def _uniform_filter_nhwc(x: jnp.ndarray, win: int, padding: str) -> jnp.ndarray:
    """Separable win x win mean filter over H,W of an NHWC tensor.

    padding: 'reflect' (matches numpy path) or 'zero' (matches torch F.conv2d
    with padding=win//2). Depthwise: each channel filtered independently.
    """
    pad = win // 2
    mode = "reflect" if padding == "reflect" else "constant"
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode=mode)
    c = x.shape[-1]
    kh = jnp.full((win, 1, 1, 1), 1.0 / win, dtype=x.dtype)
    kh = jnp.tile(kh, (1, 1, 1, c))
    kw = jnp.full((1, win, 1, 1), 1.0 / win, dtype=x.dtype)
    kw = jnp.tile(kw, (1, 1, 1, c))
    dn = lax.conv_dimension_numbers(xp.shape, kh.shape, ("NHWC", "HWIO", "NHWC"))
    y = lax.conv_general_dilated(
        xp, kh, (1, 1), "VALID", dimension_numbers=dn,
        feature_group_count=c, precision=lax.Precision.HIGHEST)
    y = lax.conv_general_dilated(
        y, kw, (1, 1), "VALID", dimension_numbers=dn,
        feature_group_count=c, precision=lax.Precision.HIGHEST)
    return y


def to_luma(x: jnp.ndarray) -> jnp.ndarray:
    """NHWC with C==3 -> NHW1 luma; C==1 passthrough."""
    if x.shape[-1] == 1:
        return x
    coeffs = jnp.asarray(_LUMA_COEFFS, dtype=x.dtype)
    return jnp.tensordot(x[..., :3], coeffs, axes=([3], [0]))[..., None]


def ssim_map(a: jnp.ndarray, b: jnp.ndarray, win: int,
             c1: float, c2: float, padding: str) -> jnp.ndarray:
    """Per-pixel SSIM map for NHWC inputs (single channel expected)."""
    mu1 = _uniform_filter_nhwc(a, win, padding)
    mu2 = _uniform_filter_nhwc(b, win, padding)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _uniform_filter_nhwc(a * a, win, padding) - mu1_sq
    sigma2_sq = _uniform_filter_nhwc(b * b, win, padding) - mu2_sq
    sigma12 = _uniform_filter_nhwc(a * b, win, padding) - mu1_mu2
    return ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2))


@partial(jax.jit, static_argnames=("win_size",))
def ssim_eval(ref: jnp.ndarray, out: jnp.ndarray, win_size: int = 11) -> jnp.ndarray:
    """Batched device twin of ``ssim_np``: NHWC [0,1] inputs, reflect padding.

    Returns [B] per-image mean SSIM. Luma-converts 3-channel inputs.
    """
    a = to_luma(ref.astype(jnp.float32))
    b = to_luma(out.astype(jnp.float32))
    m = ssim_map(a, b, win_size, 0.01 ** 2, 0.03 ** 2, "reflect")
    return jnp.mean(m, axis=(1, 2, 3))


@jax.jit
def psnr_eval(ref: jnp.ndarray, out: jnp.ndarray) -> jnp.ndarray:
    """Batched device twin of ``psnr_np`` (data_range=1): NHWC -> [B]."""
    diff = ref.astype(jnp.float32) - out.astype(jnp.float32)
    mse = jnp.mean(diff * diff, axis=(1, 2, 3))
    return jnp.where(mse == 0, jnp.inf, 10.0 * jnp.log10(1.0 / jnp.maximum(mse, 1e-38)))


@jax.jit
def mse_eval(ref: jnp.ndarray, out: jnp.ndarray) -> jnp.ndarray:
    """Batched per-image MSE: NHWC -> [B]."""
    diff = ref.astype(jnp.float32) - out.astype(jnp.float32)
    return jnp.mean(diff * diff, axis=(1, 2, 3))


def psnr_shave4(sr: jnp.ndarray, hr: jnp.ndarray, rgb_range: float) -> jnp.ndarray:
    """Validation PSNR; parity with reference psnr_torch (metrics.py:70-79).

    NHWC batched; divides by rgb_range, shaves a 4px border when W > 8,
    returns [B] (reference reduces over the batch too — do that at call site).
    """
    diff = (sr.astype(jnp.float32) - hr.astype(jnp.float32)) / rgb_range
    shave = 4
    if sr.shape[2] > 2 * shave:
        diff = diff[:, shave:-shave, shave:-shave, :]
    mse = jnp.mean(diff * diff, axis=(1, 2, 3))
    return jnp.where(mse == 0, jnp.inf, 10.0 * jnp.log10(1.0 / jnp.maximum(mse, 1e-38)))


def ssim_shave4(sr: jnp.ndarray, hr: jnp.ndarray, rgb_range: float,
                win_size: int = 11) -> jnp.ndarray:
    """Validation SSIM; parity with reference ssim_torch (metrics.py:82-108).

    NHWC batched -> [B]. Crops sr to hr size, normalises to [0,1], shaves 4px,
    luma-converts, uses C1=(0.01*255)^2 / C2=(0.03*255)^2 on the [0,1] signal
    (reference quirk) with ZERO padding.
    """
    h, w = hr.shape[1], hr.shape[2]
    sr = sr[:, :h, :w, :]
    sr = jnp.clip(sr.astype(jnp.float32) / rgb_range, 0.0, 1.0)
    hr = jnp.clip(hr.astype(jnp.float32) / rgb_range, 0.0, 1.0)
    shave = 4
    if sr.shape[2] > 2 * shave:
        sr = sr[:, shave:-shave, shave:-shave, :]
        hr = hr[:, shave:-shave, shave:-shave, :]
    sr = to_luma(sr)
    hr = to_luma(hr)
    c1 = (0.01 * 255.0) ** 2
    c2 = (0.03 * 255.0) ** 2
    m = ssim_map(sr, hr, win_size, c1, c2, "zero")
    return jnp.mean(m, axis=(1, 2, 3))


def quantize(img: jnp.ndarray, rgb_range: float) -> jnp.ndarray:
    """Round-trip an image to the 0-255 grid; parity with trainer.py:45-47."""
    pixel_range = 255.0 / rgb_range
    return jnp.round(jnp.clip(img * pixel_range, 0.0, 255.0)) / pixel_range
