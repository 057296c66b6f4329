"""DRN-L dual-regression super-resolution network (Flax, NHWC).

TPU-native re-implementation of the reference architecture
(reference src/drn.py:160-270): bicubic-upsample the LR input to HR size,
U-Net-style strided-conv down phases with skip copies, RCAB+Upsampler up
phases, and a 3x3 tail emitting an SR image at *every* scale
``[H/2^phase ... H]``. The companion ``DownBlock`` is both the internal
down-phase block and the dual-regression model mapping SR back to LR
(reference src/model.py:78-82, src/drn.py:83-119).
"""

from __future__ import annotations

import math
from typing import Any, List

import jax.numpy as jnp
from flax import linen as nn

from adsr_tpu.core.config import DRNModelConfig
from adsr_tpu.models.common import (
    GRAY_MEAN, RGB_MEAN, CALayer, MeanShift, RCAB, Upsampler, conv,
    upsample_bicubic,
)

Dtype = Any


class DownBlock(nn.Module):
    """Strided-conv downsampler; also the dual model (src/drn.py:83-119)."""
    scale: int
    n_feat: int
    in_channels: int
    out_channels: int
    negval: float = 0.2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = conv(self.n_feat, 3, stride=2, bias=False, dtype=self.dtype,
                 name="down0")(x)
        x = nn.leaky_relu(x, self.negval)
        for i in range(1, int(math.log2(self.scale))):
            x = conv(self.n_feat, 3, stride=2, bias=False, dtype=self.dtype,
                     name=f"down{i}")(x)
            x = nn.leaky_relu(x, self.negval)
        return conv(self.out_channels, 3, bias=False, dtype=self.dtype,
                    name="proj")(x)


class _RCABScanBody(nn.Module):
    """nn.scan body for a stack of identical RCABs: carry -> carry."""
    n_feat: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, carry: jnp.ndarray, _):
        return RCAB(self.n_feat, dtype=self.dtype, name="rcab")(carry), None


class DRN(nn.Module):
    """Returns a list of SR images, lowest resolution first (src/drn.py:241-270)."""
    cfg: DRNModelConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 deterministic: bool = True) -> List[jnp.ndarray]:
        # `deterministic` keeps the model interface uniform; DRN has no
        # stochastic layers (the reference trains it without dropout).
        del deterministic
        cfg = self.cfg
        phase = len(cfg.scale)
        f = cfg.n_feats
        c = cfg.n_colors
        mean = GRAY_MEAN if c == 1 else RGB_MEAN

        # upsample LR to target SR size, then remove dataset mean
        x = upsample_bicubic(x, cfg.max_scale).astype(self.dtype)
        x = MeanShift(c, cfg.rgb_range, mean, sign=-1, dtype=self.dtype,
                      name="sub_mean")(x)
        x = conv(f, 3, dtype=self.dtype, name="head")(x)

        # down phases, saving skip copies (src/drn.py:249-253)
        copies = []
        for p in range(phase):
            copies.append(x)
            x = DownBlock(scale=2, n_feat=f * 2 ** p, in_channels=f * 2 ** p,
                          out_channels=f * 2 ** (p + 1), negval=cfg.negval,
                          dtype=self.dtype, name=f"down_{p}")(x)

        add_mean = MeanShift(c, cfg.rgb_range, mean, sign=1, dtype=self.dtype,
                             name="add_mean")

        sr = add_mean(conv(c, 3, dtype=self.dtype, name="tail_0")(x))
        results = [sr]

        # channel widths per up phase (src/drn.py:199-223):
        # body width: phase at idx0 repeated, then descending powers
        body_feats = [f * 2 ** phase, f * 2 ** phase] + [
            f * 2 ** p for p in range(phase - 1, 1, -1)]
        body_feats = body_feats[:phase]
        # upsampler widths: first f*2^phase, then 2*f*2^p for p=phase-1..1
        up_feats = [f * 2 ** phase] + [
            2 * f * 2 ** p for p in range(phase - 1, 0, -1)]
        # 1x1 projection out-widths: f*2^(phase-1) .. f
        proj_feats = [f * 2 ** p for p in range(phase - 1, -1, -1)]

        for idx in range(phase):
            if cfg.scan_blocks:
                scanned = nn.scan(
                    _RCABScanBody,
                    variable_axes={"params": 0},
                    split_rngs={"params": True},
                    length=cfg.n_blocks)
                x, _ = scanned(n_feat=body_feats[idx], dtype=self.dtype,
                               name=f"up{idx}_rcabs")(x, None)
            else:
                for b in range(cfg.n_blocks):
                    x = RCAB(body_feats[idx], dtype=self.dtype,
                             name=f"up{idx}_rcab{b}")(x)
            x = Upsampler(2, up_feats[idx], dtype=self.dtype,
                          name=f"up{idx}_upsampler")(x)
            from adsr_tpu.models.common import torch_conv_init
            x = nn.Conv(proj_feats[idx], (1, 1),
                        kernel_init=torch_conv_init, dtype=self.dtype,
                        name=f"up{idx}_proj")(x)
            # concat skip copy, U-Net style (src/drn.py:263)
            x = jnp.concatenate([x, copies[phase - idx - 1]], axis=-1)
            sr = add_mean(conv(c, 3, dtype=self.dtype,
                               name=f"tail_{idx + 1}")(x))
            results.append(sr)

        return results


def make_dual_models(cfg: DRNModelConfig, dtype: Dtype = jnp.float32
                     ) -> List[DownBlock]:
    """One x2 DownBlock per scale entry, mapping SR -> LR (model.py:78-82)."""
    return [DownBlock(scale=2, n_feat=cfg.n_feats, in_channels=cfg.n_colors,
                      out_channels=cfg.n_colors, negval=cfg.negval, dtype=dtype)
            for _ in cfg.scale]
