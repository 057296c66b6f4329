"""Loss factory parsing 'w1*L1+w2*MSE'-style specs (reference src/loss.py:72-121).

Components (parity with the reference's definitions):
- L1   — mean absolute error
- MSE  — mean squared error
- PSNR — ``-10*log10(255^2 / (mse + 1e-8))`` (src/loss.py:63-70; note the
  hardcoded 255 regardless of rgb_range)
- SSIM — ``(1 - ssim_map).sum() / batch_size`` with shave=scale+6 (else 1px),
  luma conversion, zero-padded 11x11 uniform kernel, C1/C2 on the 255 scale
  (src/loss.py:9-52)

``make_loss`` returns a pure function (sr, hr) -> (total, {name: value}) usable
inside jit; per-epoch loss-history logging lives in the trainer.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Tuple

import jax.numpy as jnp

from adsr_tpu.metrics import ssim_map, to_luma

LossFn = Callable[[jnp.ndarray, jnp.ndarray], Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]]


def _l1(sr, hr):
    return jnp.mean(jnp.abs(sr - hr))


def _mse(sr, hr):
    return jnp.mean((sr - hr) ** 2)


def _psnr_loss(sr, hr):
    mse = jnp.mean((sr - hr) ** 2)
    return -10.0 * jnp.log10((255.0 ** 2) / (mse + 1e-8))


def _ssim_loss(sr: jnp.ndarray, hr: jnp.ndarray, batch_size: int,
               scale: int = 4, rgb_range: float = 255.0) -> jnp.ndarray:
    """SSIM loss with the reference's shave/sum conventions (loss.py:9-52)."""
    h, w = hr.shape[1], hr.shape[2]
    sr = sr[:, :h, :w, :]
    sr = jnp.clip(sr / rgb_range, 0.0, 1.0)
    hr = jnp.clip(hr / rgb_range, 0.0, 1.0)
    shave = scale + 6
    if sr.shape[2] > 2 * shave:
        sr = sr[:, shave:-shave, shave:-shave, :]
        hr = hr[:, shave:-shave, shave:-shave, :]
    else:
        sr = sr[:, 1:-1, 1:-1, :]
        hr = hr[:, 1:-1, 1:-1, :]
    sr = to_luma(sr)
    hr = to_luma(hr)
    c1, c2 = (0.01 * 255.0) ** 2, (0.03 * 255.0) ** 2
    m = ssim_map(sr, hr, 11, c1, c2, "zero")
    return jnp.sum(1.0 - m) / batch_size


def parse_loss_spec(spec: str) -> List[Tuple[float, str]]:
    out = []
    for term in spec.split("+"):
        weight, name = term.split("*")
        if name not in ("L1", "MSE", "PSNR", "SSIM"):
            raise ValueError(f"Unsupported loss type: {name}")
        out.append((float(weight), name))
    return out


def make_loss(spec: str, batch_size: int = 1, scale: int = 4,
              rgb_range: float = 255.0) -> LossFn:
    terms = parse_loss_spec(spec)
    fns = {
        "L1": _l1,
        "MSE": _mse,
        "PSNR": _psnr_loss,
        "SSIM": lambda sr, hr: _ssim_loss(sr, hr, batch_size, scale, rgb_range),
    }

    def loss_fn(sr: jnp.ndarray, hr: jnp.ndarray):
        comps: Dict[str, jnp.ndarray] = {}
        total = jnp.asarray(0.0, jnp.float32)
        for weight, name in terms:
            val = weight * fns[name](sr.astype(jnp.float32),
                                     hr.astype(jnp.float32))
            comps[name] = val
            total = total + val
        return total, comps

    return loss_fn
