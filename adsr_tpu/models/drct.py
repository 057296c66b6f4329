"""DRCT Swin-style transformer SR network (Flax, NHWC).

TPU-native re-implementation of the reference architecture
(reference src/drct.py:716-898): shallow conv embed -> 12 Residual Dense
Groups (each 5 Swin transformer blocks with shift pattern 0/w2/0/w2/0 and
dense concat growth dim+k*gc) -> LayerNorm -> conv + long skip ->
conv_before_upsample -> PixelShuffle upsample -> conv_last.

Architecture arithmetic reproduced exactly for weight-shape parity:
- per-block head fix-up ``num_heads - ((dim + k*gc) % num_heads)``
  (src/drct.py:337-367): embed 180, gc 32 -> dims 180/212/244/276/308 with
  heads 6/4/2/6/4;
- blocks 4 and 5 of each RDG use mlp_ratio=1 (src/drct.py:359, 369);
- stochastic-depth rate: each RDG uses the first value of its dpr slice
  (src/drct.py:332 — `drop_path[0] if isinstance(drop_path, list)`).

Window attention runs through ``adsr_tpu.ops.window_attention`` which picks a
fused Pallas kernel on TPU and a pure-XLA einsum path elsewhere. Shifted-window
masks and relative-position indices are static numpy constants — no
data-dependent control flow under jit.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Any, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from adsr_tpu.core.config import DRCTModelConfig
from adsr_tpu.models.common import RGB_MEAN, conv, pixel_shuffle, trunc_normal_init
from adsr_tpu.ops.window_attention import window_attention

Dtype = Any


# --------------------------------------------------------------------------- #
# Static geometry: relative-position index and shifted-window masks
# --------------------------------------------------------------------------- #

@lru_cache(maxsize=None)
def relative_position_index(window_size: int) -> np.ndarray:
    """[N, N] gather index into the (2W-1)^2 bias table (src/drct.py:249-259)."""
    w = window_size
    coords = np.stack(np.meshgrid(np.arange(w), np.arange(w), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += w - 1
    rel[:, :, 1] += w - 1
    rel[:, :, 0] *= 2 * w - 1
    return rel.sum(-1)


@lru_cache(maxsize=None)
def shift_attn_mask(h: int, w: int, window_size: int, shift: int) -> np.ndarray:
    """[nW, N, N] additive 0/-100 mask for SW-MSA (src/drct.py:449-470)."""
    img = np.zeros((h, w))
    slices = (slice(0, -window_size), slice(-window_size, -shift),
              slice(-shift, None))
    cnt = 0
    for hs in slices:
        for ws in slices:
            img[hs, ws] = cnt
            cnt += 1
    win = (img.reshape(h // window_size, window_size,
                       w // window_size, window_size)
              .transpose(0, 2, 1, 3)
              .reshape(-1, window_size * window_size))
    mask = win[:, None, :] - win[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)


def window_partition(x: jnp.ndarray, win: int) -> jnp.ndarray:
    """[B, H, W, C] -> [B*nW, win*win, C] (src/drct.py:193-204)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // win, win, w // win, win, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, win * win, c)


def window_reverse(x: jnp.ndarray, win: int, h: int, w: int) -> jnp.ndarray:
    """[B*nW, win*win, C] -> [B, H, W, C] (src/drct.py:207-220)."""
    c = x.shape[-1]
    b = x.shape[0] // (h * w // win // win)
    x = x.reshape(b, h // win, w // win, win, win, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


# --------------------------------------------------------------------------- #
# Blocks
# --------------------------------------------------------------------------- #

class Mlp(nn.Module):
    hidden: int
    out: int
    gelu_approx: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.hidden, kernel_init=trunc_normal_init(),
                     dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=self.gelu_approx)
        x = nn.Dense(self.out, kernel_init=trunc_normal_init(),
                     dtype=self.dtype, name="fc2")(x)
        return x


class WindowAttention(nn.Module):
    """W-MSA with learned relative position bias (src/drct.py:223-302)."""
    dim: int
    window_size: int
    num_heads: int
    qkv_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        b, n, c = x.shape
        nh = self.num_heads
        hd = c // nh
        scale = hd ** -0.5

        qkv = nn.Dense(3 * self.dim, use_bias=self.qkv_bias,
                       kernel_init=trunc_normal_init(), dtype=self.dtype,
                       name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, nh, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]          # [B, nh, N, hd]

        table = self.param(
            "relative_position_bias_table", trunc_normal_init(),
            ((2 * self.window_size - 1) ** 2, nh))
        idx = jnp.asarray(relative_position_index(self.window_size).reshape(-1))
        bias = table[idx].reshape(n, n, nh).transpose(2, 0, 1)  # [nh, N, N]

        out = window_attention(q * scale, k, v, bias.astype(self.dtype), mask)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
        return nn.Dense(self.dim, kernel_init=trunc_normal_init(),
                        dtype=self.dtype, name="proj")(out)


class SwinBlock(nn.Module):
    """Swin transformer block with optional cyclic shift (src/drct.py:398-512).

    ``drop_path`` is a call-time (possibly traced) rate so identical layers can
    be nn.scan-stacked with per-layer rates; rate 0 is an exact identity.
    """
    dim: int
    input_resolution: Tuple[int, int]
    num_heads: int
    window_size: int
    shift_size: int
    mlp_ratio: float
    qkv_bias: bool = True
    gelu_approx: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, x_size: Tuple[int, int],
                 deterministic: bool = True,
                 drop_path: jnp.ndarray | float = 0.0) -> jnp.ndarray:
        h, w = x_size
        b, l, c = x.shape
        win, shift = self.window_size, self.shift_size
        # window-size clamp for small inputs (src/drct.py:426-429)
        if min(h, w) <= win:
            win, shift = min(h, w), 0

        shortcut = x
        x = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        x = x.reshape(b, h, w, c)
        if shift > 0:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
        xw = window_partition(x, win)

        mask = None
        if shift > 0:
            mask = jnp.asarray(shift_attn_mask(h, w, win, shift))
        xw = WindowAttention(dim=self.dim, window_size=win,
                             num_heads=self.num_heads, qkv_bias=self.qkv_bias,
                             dtype=self.dtype, name="attn")(xw, mask)

        x = window_reverse(xw, win, h, w)
        if shift > 0:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        x = x.reshape(b, l, c)

        x = shortcut + self._drop_path(x, deterministic, drop_path)
        y = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        y = Mlp(hidden=int(self.dim * self.mlp_ratio), out=self.dim,
                gelu_approx=self.gelu_approx, dtype=self.dtype,
                name="mlp")(y)
        return x + self._drop_path(y, deterministic, drop_path)

    def _drop_path(self, x: jnp.ndarray, deterministic: bool,
                   rate) -> jnp.ndarray:
        """Per-sample stochastic depth (src/drct.py:107-119). With a traced
        rate of 0 the mask is exactly all-ones (identity)."""
        if deterministic:
            return x
        keep = 1.0 - jnp.asarray(rate, x.dtype)
        rng = self.make_rng("dropout")
        mask = jnp.floor(keep + jax.random.uniform(
            rng, (x.shape[0],) + (1,) * (x.ndim - 1), dtype=x.dtype))
        return x / keep * mask


class RDG(nn.Module):
    """Residual Dense Group: 5 Swin blocks, dense growth gc (src/drct.py:322-396)."""
    dim: int
    input_resolution: Tuple[int, int]
    num_heads: int
    window_size: int
    mlp_ratio: float
    gc: int
    qkv_bias: bool = True
    gelu_approx: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, x_size: Tuple[int, int],
                 deterministic: bool = True,
                 drop_path: jnp.ndarray | float = 0.0) -> jnp.ndarray:
        d, gc, nh = self.dim, self.gc, self.num_heads
        h, w = x_size
        shift = self.window_size // 2

        def swin(k, feat, cur_shift, ratio, name):
            heads = nh if k == 0 else nh - ((d + k * gc) % nh)
            return SwinBlock(dim=feat, input_resolution=self.input_resolution,
                             num_heads=heads, window_size=self.window_size,
                             shift_size=cur_shift, mlp_ratio=ratio,
                             qkv_bias=self.qkv_bias,
                             gelu_approx=self.gelu_approx,
                             dtype=self.dtype, name=name)

        def adjust(feat, name):
            from adsr_tpu.models.common import torch_conv_init
            return nn.Conv(feat, (1, 1), kernel_init=torch_conv_init,
                           dtype=self.dtype, name=name)

        def to_space(t):  # patch-unembed: [B, L, C] -> [B, H, W, C]
            return t.reshape(t.shape[0], h, w, t.shape[-1])

        def to_tokens(t):  # patch-embed: [B, H, W, C] -> [B, L, C]
            return t.reshape(t.shape[0], h * w, t.shape[-1])

        outs = [x]
        feats = [d + k * gc for k in range(5)]
        shifts = [0, shift, 0, shift, 0]
        ratios = [self.mlp_ratio, self.mlp_ratio, self.mlp_ratio, 1.0, 1.0]
        for k in range(5):
            inp = outs[0] if k == 0 else jnp.concatenate(outs, axis=-1)
            t = swin(k, feats[k], shifts[k], ratios[k],
                     f"swin{k + 1}")(inp, x_size, deterministic, drop_path)
            t = adjust(d if k == 4 else gc, f"adjust{k + 1}")(to_space(t))
            if k < 4:
                t = nn.leaky_relu(t, 0.2)
            outs.append(to_tokens(t))

        return outs[5] * 0.2 + x


class _RDGScanBody(nn.Module):
    """nn.scan body: (tokens, per-layer drop_path rate) -> tokens."""
    dim: int
    input_resolution: Tuple[int, int]
    num_heads: int
    window_size: int
    mlp_ratio: float
    gc: int
    x_size: Tuple[int, int]
    deterministic: bool
    qkv_bias: bool = True
    gelu_approx: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, carry: jnp.ndarray, dp: jnp.ndarray):
        out = RDG(dim=self.dim, input_resolution=self.input_resolution,
                  num_heads=self.num_heads, window_size=self.window_size,
                  mlp_ratio=self.mlp_ratio, gc=self.gc,
                  qkv_bias=self.qkv_bias, gelu_approx=self.gelu_approx,
                  dtype=self.dtype,
                  name="rdg")(carry, self.x_size, self.deterministic, dp)
        return out, None


class DRCT(nn.Module):
    """Full DRCT model: LR [B, h, w, C] -> SR [B, h*scale, w*scale, C]."""
    cfg: DRCTModelConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        cfg = self.cfg
        c_in = cfg.in_chans
        # dataset mean shift (src/drct.py:773-777, 886-888)
        if c_in == 3:
            mean = jnp.asarray(RGB_MEAN, dtype=jnp.float32)
        else:
            mean = jnp.zeros((c_in,), dtype=jnp.float32)
        x = (x - mean) * cfg.img_range
        x = x.astype(self.dtype)

        h, w = x.shape[1], x.shape[2]
        res = (h, w)

        feat = conv(cfg.embed_dim, 3, dtype=self.dtype, name="conv_first")(x)

        # deep feature extraction over token layout; the top-level patch
        # embed carries a LayerNorm (patch_norm=True default in the
        # reference, src/drct.py:739, 793-798, applied at 685-688) — the
        # RDG-internal pe/pue do NOT (norm_layer=None, src/drct.py:377-384)
        t = feat.reshape(feat.shape[0], h * w, cfg.embed_dim)
        t = nn.LayerNorm(dtype=self.dtype, name="patch_norm")(t)
        # stochastic-depth schedule: RDG i uses dpr[6i] of linspace(0, 0.1, 72)
        # with the reference's depths=(6,)*12 (src/drct.py:819-830)
        total = 6 * cfg.num_layers
        dpr = [0.1 * (6 * i) / max(total - 1, 1)
               for i in range(cfg.num_layers)]
        rdg_kwargs = dict(dim=cfg.embed_dim, input_resolution=res,
                          num_heads=cfg.num_heads,
                          window_size=cfg.window_size,
                          mlp_ratio=cfg.mlp_ratio, gc=cfg.gc,
                          qkv_bias=cfg.qkv_bias,
                          gelu_approx=cfg.gelu_approx, dtype=self.dtype)
        if cfg.scan_layers:
            # one compiled RDG body scanned num_layers times; params carry a
            # leading [num_layers] axis under 'rdgs'. With remat, each RDG's
            # activations are recomputed in backward instead of stored.
            if cfg.remat:
                policy = (jax.checkpoint_policies
                          .dots_with_no_batch_dims_saveable
                          if cfg.remat_policy == "dots" else None)
                body_cls = nn.remat(_RDGScanBody, policy=policy)
            else:
                body_cls = _RDGScanBody
            scanned = nn.scan(
                body_cls,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                length=cfg.num_layers,
                in_axes=0, out_axes=0)
            body = scanned(x_size=res, deterministic=deterministic,
                           name="rdgs", **rdg_kwargs)
            t, _ = body(t, jnp.asarray(dpr, jnp.float32))
        else:
            for i in range(cfg.num_layers):
                t = RDG(name=f"rdg_{i}", **rdg_kwargs)(
                    t, res, deterministic, dpr[i])
        t = nn.LayerNorm(dtype=self.dtype, name="norm")(t)
        deep = t.reshape(feat.shape[0], h, w, cfg.embed_dim)

        x = conv(cfg.embed_dim, 3, dtype=self.dtype,
                 name="conv_after_body")(deep) + feat

        # reconstruction (src/drct.py:842-847, 890-895)
        x = conv(cfg.num_feat, 3, dtype=self.dtype,
                 name="conv_before_upsample")(x)
        x = nn.leaky_relu(x, 0.01)
        s, i = cfg.upscale, 0
        while s > 1:
            x = conv(4 * cfg.num_feat, 3, dtype=self.dtype,
                     name=f"upsample_conv{i}")(x)
            x = pixel_shuffle(x, 2)
            s //= 2
            i += 1
        x = conv(c_in, 3, dtype=self.dtype, name="conv_last")(x)

        x = x.astype(jnp.float32) / cfg.img_range + mean
        return x
