"""EfficientAD student-teacher baseline models (Flax, NHWC).

TPU-native re-implementation of the reference's PDN feature extractors and
conv autoencoder (reference src/efficientAD.py:32-127). The teacher is a PDN
whose weights come either from a converted torch checkpoint (the reference
loads pretrained weights, efficientAD.py:429-430) or from scratch-distillation;
student and autoencoder train from random init.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def _conv(feats: int, k: int, stride: int = 1, pad: int = 0, name: str = "",
          dtype: Dtype = jnp.float32) -> nn.Conv:
    from adsr_tpu.models.common import torch_conv_init
    return nn.Conv(feats, (k, k), strides=(stride, stride),
                   padding=((pad, pad), (pad, pad)),
                   kernel_init=torch_conv_init, name=name, dtype=dtype)


def _avg_pool(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    """torch AvgPool2d(k=2, s=2, padding=pad, count_include_pad=True)."""
    if pad:
        x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    return nn.avg_pool(x, (2, 2), strides=(2, 2), padding="VALID")


class PDN(nn.Module):
    """Patch description network, 'small' or 'medium' (efficientAD.py:90-127)."""
    out_channels: int = 384
    size: str = "small"
    padding: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        p = 1 if self.padding else 0
        d = self.dtype
        if self.size == "small":
            x = nn.relu(_conv(128, 4, pad=3 * p, name="conv0", dtype=d)(x))
            x = _avg_pool(x, p)
            x = nn.relu(_conv(256, 4, pad=3 * p, name="conv1", dtype=d)(x))
            x = _avg_pool(x, p)
            x = nn.relu(_conv(256, 3, pad=1 * p, name="conv2", dtype=d)(x))
            x = _conv(self.out_channels, 4, name="conv3", dtype=d)(x)
        elif self.size == "medium":
            x = nn.relu(_conv(256, 4, pad=3 * p, name="conv0", dtype=d)(x))
            x = _avg_pool(x, p)
            x = nn.relu(_conv(512, 4, pad=3 * p, name="conv1", dtype=d)(x))
            x = _avg_pool(x, p)
            x = nn.relu(_conv(512, 1, name="conv2", dtype=d)(x))
            x = nn.relu(_conv(512, 3, pad=1 * p, name="conv3", dtype=d)(x))
            x = nn.relu(_conv(self.out_channels, 4, name="conv4", dtype=d)(x))
            x = _conv(self.out_channels, 1, name="conv5", dtype=d)(x)
        else:
            raise ValueError(f"unknown PDN size: {self.size}")
        return x


class Autoencoder(nn.Module):
    """Conv autoencoder over 256px inputs (efficientAD.py:32-88)."""
    out_channels: int = 384
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        d = self.dtype
        # encoder: five k4/s2/p1 convs then a k8 valid conv
        widths = (32, 32, 64, 64, 64)
        for i, wdt in enumerate(widths):
            x = nn.relu(_conv(wdt, 4, stride=2, pad=1, name=f"enc{i}",
                              dtype=d)(x))
        x = _conv(64, 8, name="enc5", dtype=d)(x)

        # decoder: bilinear-resize ladder with k4/p2 convs
        def up(t, size):
            return jax.image.resize(
                t, (t.shape[0], size, size, t.shape[3]), method="bilinear")

        for i, size in enumerate((3, 8, 15, 32, 63, 127)):
            x = up(x, size)
            x = nn.relu(_conv(64, 4, pad=2, name=f"dec{i}", dtype=d)(x))
            x = nn.Dropout(0.2, deterministic=deterministic)(x)
        x = up(x, 56)
        x = nn.relu(_conv(64, 3, pad=1, name="dec6", dtype=d)(x))
        return _conv(self.out_channels, 3, pad=1, name="dec7", dtype=d)(x)
