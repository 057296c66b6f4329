"""Multi-class batched anomaly-scoring service (BASELINE.json config #5).

One compiled graph per (class, scale) fuses the whole serving path:
uint8 LR/HR batch -> channel conversion + pixel scaling (the prep pipeline's
math, data.py:11-19/52-65) -> SR forward -> uint8 quantisation round-trip ->
per-image anomaly scores (1-SSIM at a configured window, MSE, -PSNR,
evaluate.py:250-261). No host round-trips between stages; scores come back as
one small [B, 3] array.

Classes with different channel counts / scales get separate XLA executables
(static shapes); the server routes incoming batches and pads the tail to the
compiled batch size.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from adsr_tpu.core.config import Experiment
from adsr_tpu.metrics import mse_eval, psnr_eval, quantize, ssim_eval
from adsr_tpu.models.factory import make_model


class AnomalyServer:
    """Registry of per-class compiled scoring graphs."""

    def __init__(self, batch_size: int = 16, ssim_window: int = 11):
        self.batch_size = batch_size
        self.ssim_window = ssim_window
        self._entries: Dict[str, Tuple[Experiment, dict, object]] = {}

    def register(self, name: str, exp: Experiment, params) -> None:
        import os

        from adsr_tpu.core.config import DRCTModelConfig
        model = make_model(exp.model, exp.precision)
        rgb_range = exp.data.rgb_range
        n_colors = exp.data.n_colors
        win = self.ssim_window
        # DRCT on TPU serves through the fused Pallas forward (same dispatch
        # as make_eval_forward; ADSR_TPU_FUSED=0 opts out)
        use_fused = (isinstance(exp.model, DRCTModelConfig)
                     and exp.model.scan_layers
                     and os.environ.get("ADSR_TPU_FUSED", "auto") != "0"
                     and jax.default_backend() not in ("cpu",))
        if use_fused:
            from adsr_tpu.models.factory import compute_dtype
            from adsr_tpu.ops.fused_drct import fused_drct_apply, prepack_drct
            dtype = compute_dtype(exp.precision)
            img = exp.model.img_size
            # pack weights + attention bias ONCE at registration; every
            # scoring call then consumes ready kernel-layout tensors
            params = prepack_drct(params, exp.model, img, img, dtype=dtype)

        @jax.jit
        def score(params, lr_u8, hr_u8):
            # channel conversion + pixel scaling as the data pipeline does
            lr = _prep(lr_u8, n_colors, rgb_range)
            hr = _prep(hr_u8, n_colors, rgb_range)
            if use_fused:
                sr = fused_drct_apply(params, exp.model, lr, dtype=dtype)
            else:
                sr = model.apply({"params": params}, lr, deterministic=True)
            if isinstance(sr, (list, tuple)):
                sr = sr[-1]
            sr = sr[:, :hr.shape[1], :hr.shape[2], :]
            sr = quantize(sr.astype(jnp.float32), rgb_range)
            # uint8 round-trip to [0,1] for scoring parity (evaluate.py:243)
            sr01 = jnp.floor(jnp.clip(sr * (255.0 / rgb_range), 0, 255)) / 255.0
            hr01 = jnp.floor(jnp.clip(hr * (255.0 / rgb_range), 0, 255)) / 255.0
            s_ssim = 1.0 - ssim_eval(hr01, sr01, win)
            s_mse = mse_eval(sr01, hr01)
            s_psnr = -psnr_eval(hr01, sr01)
            return jnp.stack([s_ssim, s_mse, s_psnr], axis=-1)

        self._entries[name] = (exp, params, score)

    def classes(self) -> List[str]:
        return list(self._entries)

    def score(self, name: str, lr_u8: np.ndarray, hr_u8: np.ndarray
              ) -> np.ndarray:
        """[N,h,w,c] uint8 LR + [N,H,W,c] uint8 HR -> [N,3] scores
        (1-SSIM, MSE, -PSNR). Tail batches are padded to the compiled size."""
        exp, params, fn = self._entries[name]
        n = lr_u8.shape[0]
        b = self.batch_size
        outs = []
        for i in range(0, n, b):
            lr = lr_u8[i:i + b]
            hr = hr_u8[i:i + b]
            pad = b - lr.shape[0]
            if pad:
                lr = np.concatenate([lr, np.repeat(lr[-1:], pad, 0)])
                hr = np.concatenate([hr, np.repeat(hr[-1:], pad, 0)])
            s = np.asarray(fn(params, jnp.asarray(lr), jnp.asarray(hr)))
            outs.append(s[:s.shape[0] - pad] if pad else s)
        return np.concatenate(outs)


def _prep(img_u8: jnp.ndarray, n_colors: int, rgb_range: float) -> jnp.ndarray:
    """uint8 NHWC -> float32, channel rule + rgb_range scaling on device."""
    x = img_u8.astype(jnp.float32)
    c = x.shape[-1]
    if n_colors == 1 and c >= 3:
        y = (16.0 + (65.481 * x[..., 0] + 128.553 * x[..., 1]
                     + 24.966 * x[..., 2]) / 255.0)[..., None]
        x = y
    elif n_colors == 3 and c == 1:
        x = jnp.concatenate([x] * 3, axis=-1)
    return x * (rgb_range / 255.0)
