"""Shared model blocks (NHWC, Flax linen).

TPU-first re-designs of the reference's building blocks:
- convolutions carry explicit torch-style padding tuples so strided convs align
  with the reference (XLA 'SAME' pads asymmetrically for even inputs);
- PixelShuffle is a pure reshape/transpose with torch channel ordering
  ('(c i j)') so torch checkpoints remain convertible;
- bicubic x{2,4,8} upsampling is a precomputed dense interpolation matrix
  (a=-0.75, align_corners=False — torch's kernel, which jax.image.resize does
  not implement) applied as two small matmuls: exact, and MXU-friendly.
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import Any, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

# Dataset channel statistics used by MeanShift (reference src/drn.py:176-185).
RGB_MEAN = (0.4488, 0.4371, 0.4040)
GRAY_MEAN = (0.4440,)


# torch nn.Conv2d default init: kaiming_uniform(a=sqrt(5)) == U(-b, b) with
# b = 1/sqrt(fan_in), i.e. var = 1/(3*fan_in). This matters: DRN chains 40
# norm-free residual blocks, and flax's LeCun-normal (3x the variance) makes
# activations explode at init (observed: init loss ~1e5 vs ~1e2).
torch_conv_init = nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform")


def conv(features: int, kernel_size: int, stride: int = 1, bias: bool = True,
         name: Optional[str] = None, dtype: Dtype = jnp.float32) -> nn.Conv:
    """3x3/1x1-style conv with torch padding + init semantics."""
    pad = kernel_size // 2
    return nn.Conv(features, (kernel_size, kernel_size),
                   strides=(stride, stride),
                   padding=((pad, pad), (pad, pad)),
                   kernel_init=torch_conv_init,
                   use_bias=bias, name=name, dtype=dtype)


def pixel_shuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """NHWC pixel shuffle with torch channel order: C = c*r*r laid out (c,i,j)."""
    b, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)           # b h i w j c
    return x.reshape(b, h * r, w * r, c)


class MeanShift(nn.Module):
    """1x1 conv initialised to subtract/add the dataset mean.

    The reference constructs this as an nn.Conv2d whose `requires_grad=False`
    is set on the *module*, which torch ignores — the parameters train. That
    (accidental but behavior-defining) trainability is reproduced here
    (reference src/drn.py:44-52).
    """
    n_channels: int
    rgb_range: float
    mean: Tuple[float, ...]
    sign: int = -1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = self.n_channels

        def kernel_init(key, shape, dtype=jnp.float32):
            return jnp.eye(c, dtype=dtype).reshape(1, 1, c, c)

        def bias_init(key, shape, dtype=jnp.float32):
            return self.sign * self.rgb_range * jnp.asarray(self.mean, dtype)

        return nn.Conv(c, (1, 1), kernel_init=kernel_init, bias_init=bias_init,
                       dtype=self.dtype, name="shift")(x)


class CALayer(nn.Module):
    """Squeeze-excite channel attention (reference src/drn.py:123-139)."""
    channel: int
    reduction: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = jnp.mean(x, axis=(1, 2), keepdims=True)
        y = nn.Conv(max(1, self.channel // self.reduction), (1, 1),
                    kernel_init=torch_conv_init,
                    dtype=self.dtype, name="du_reduce")(y)
        y = nn.relu(y)
        y = nn.Conv(self.channel, (1, 1), kernel_init=torch_conv_init,
                    dtype=self.dtype, name="du_expand")(y)
        y = nn.sigmoid(y)
        return x * y


class RCAB(nn.Module):
    """Residual channel-attention block (reference src/drn.py:143-158)."""
    n_feat: int
    kernel_size: int = 3
    reduction: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        res = conv(self.n_feat, self.kernel_size, dtype=self.dtype,
                   name="conv0")(x)
        res = nn.relu(res)
        res = conv(self.n_feat, self.kernel_size, dtype=self.dtype,
                   name="conv1")(res)
        res = CALayer(self.n_feat, self.reduction, dtype=self.dtype,
                      name="ca")(res)
        return res + x


class Upsampler(nn.Module):
    """conv -> PixelShuffle(2) per 2x factor (reference src/drn.py:55-81)."""
    scale: int
    n_feats: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.scale & (self.scale - 1) != 0:
            raise NotImplementedError("only power-of-two scales")
        for i in range(int(math.log2(self.scale))):
            x = conv(4 * self.n_feats, 3, dtype=self.dtype, name=f"conv{i}")(x)
            x = pixel_shuffle(x, 2)
        return x


# --------------------------------------------------------------------------- #
# Torch-parity bicubic upsampling as dense interpolation matrices
# --------------------------------------------------------------------------- #

def _cubic(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    at = np.abs(t)
    w = np.where(at <= 1,
                 (a + 2) * at ** 3 - (a + 3) * at ** 2 + 1,
                 np.where(at < 2,
                          a * at ** 3 - 5 * a * at ** 2 + 8 * a * at - 4 * a,
                          0.0))
    return w


@lru_cache(maxsize=None)
def _bicubic_matrix(n_in: int, factor: int) -> np.ndarray:
    """[n_in*factor, n_in] row-stochastic matrix for 1-D bicubic upsampling
    with align_corners=False and border replication (torch semantics)."""
    n_out = n_in * factor
    src = (np.arange(n_out) + 0.5) / factor - 0.5
    i0 = np.floor(src).astype(np.int64) - 1
    mat = np.zeros((n_out, n_in), dtype=np.float64)
    for k in range(4):
        idx = np.clip(i0 + k, 0, n_in - 1)
        w = _cubic(src - (i0 + k))
        np.add.at(mat, (np.arange(n_out), idx), w)
    return mat.astype(np.float32)


def upsample_bicubic(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """NHWC bicubic upsample by an integer factor, torch-kernel exact."""
    b, h, w, c = x.shape
    mh = jnp.asarray(_bicubic_matrix(h, factor))
    mw = jnp.asarray(_bicubic_matrix(w, factor))
    y = jnp.einsum("Oh,bhwc->bOwc", mh, x,
                   precision=jax.lax.Precision.HIGHEST)
    y = jnp.einsum("Ow,bhwc->bhOc", mw, y,
                   precision=jax.lax.Precision.HIGHEST)
    return y


def trunc_normal_init(std: float = 0.02):
    """timm-style truncated normal in [-2, 2] std units (drct.py:32-93)."""
    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)
    return init
