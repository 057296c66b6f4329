"""Fused DRCT serving forward: the whole deep stack via fused SwinBlock
kernels, consuming the standard (scan-stacked) DRCT param tree directly.

This is the inference engine counterpart of ``models/drct.py`` — same math,
same params, but each of the 60 swin blocks runs as one Pallas program with
the image's tokens resident in VMEM (see ops/fused_swin_block.py), and the
convolutional head/tail stay in XLA. Forward-only (serving / evaluation);
training uses the flax model.

Numerically verified against DRCT.apply in interpret mode (tests) and on
hardware.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from adsr_tpu.core.config import DRCTModelConfig
from adsr_tpu.models.common import RGB_MEAN
from adsr_tpu.models.drct import shift_attn_mask
from adsr_tpu.ops.fused_swin_block import fused_swin_block, pack_swin_weights_jnp


def _conv(x, kernel, bias, stride=1):
    pad = kernel.shape[0] // 2
    dn = lax.conv_dimension_numbers(x.shape, kernel.shape,
                                    ("NHWC", "HWIO", "NHWC"))
    y = lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (stride, stride),
        ((pad, pad), (pad, pad)), dimension_numbers=dn)
    return y + bias.astype(x.dtype)


def _pixel_shuffle(x, r):
    b, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(b, h, w, c, r, r).transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, h * r, w * r, c)


def fused_drct_forward(params: Dict, cfg: DRCTModelConfig,
                       x: jnp.ndarray,
                       dtype=jnp.bfloat16) -> jnp.ndarray:
    """LR [B, h, w, C] float32 -> SR, matching DRCT.apply(deterministic=True).

    ``params`` is the scan-stacked tree ({'rdgs': {'rdg': ...}}, the default
    checkpoint layout).
    """
    assert cfg.scan_layers, "fused forward expects the scan-stacked layout"
    c_in = cfg.in_chans
    if c_in == 3:
        mean = jnp.asarray(RGB_MEAN, jnp.float32)
    else:
        mean = jnp.zeros((c_in,), jnp.float32)
    x = (x - mean) * cfg.img_range
    x = x.astype(dtype)
    b, h, w, _ = x.shape
    d, gc, nh, win = cfg.embed_dim, cfg.gc, cfg.num_heads, cfg.window_size
    shift = win // 2
    n = win * win

    feat = _conv(x, params["conv_first"]["kernel"],
                 params["conv_first"]["bias"])
    t0 = feat.reshape(b, h * w, d)

    rdg = params["rdgs"]["rdg"]
    feats = [d + k * gc for k in range(5)]
    heads = [nh] + [nh - ((d + k * gc) % nh) for k in range(1, 5)]
    shifts = [0, shift, 0, shift, 0]
    masks = {s: (np.asarray(shift_attn_mask(h, w, win, s)) if s else None)
             for s in set(shifts)}

    def layer(t, layer_params):
        outs = [t]
        for k in range(5):
            inp = outs[0] if k == 0 else jnp.concatenate(outs, axis=-1)
            packed = pack_swin_weights_jnp(layer_params[f"swin{k+1}"],
                                           feats[k], heads[k], win,
                                           dtype=dtype)
            y = fused_swin_block(inp.astype(dtype), packed, h, w, win,
                                 shifts[k], heads[k], feats[k],
                                 mask=masks[shifts[k]])
            adj = layer_params[f"adjust{k+1}"]
            y = y.reshape(b, h, w, feats[k])
            y = _conv(y, adj["kernel"], adj["bias"])
            if k < 4:
                y = jax.nn.leaky_relu(y, 0.2)
            outs.append(y.reshape(b, h * w, y.shape[-1]))
        return outs[5] * 0.2 + t

    def body(t, layer_params):
        return layer(t, layer_params), None

    t, _ = lax.scan(body, t0, rdg)

    # final LayerNorm (f32 stats)
    tf = t.astype(jnp.float32)
    mu = jnp.mean(tf, axis=-1, keepdims=True)
    var = jnp.var(tf, axis=-1, keepdims=True)
    t = ((tf - mu) * lax.rsqrt(var + 1e-6)
         * params["norm"]["scale"] + params["norm"]["bias"]).astype(dtype)
    deep = t.reshape(b, h, w, d)

    xb = _conv(deep, params["conv_after_body"]["kernel"],
               params["conv_after_body"]["bias"]) + feat
    xb = _conv(xb, params["conv_before_upsample"]["kernel"],
               params["conv_before_upsample"]["bias"])
    xb = jax.nn.leaky_relu(xb, 0.01)
    s, i = cfg.upscale, 0
    while s > 1:
        up = params[f"upsample_conv{i}"]
        xb = _conv(xb, up["kernel"], up["bias"])
        xb = _pixel_shuffle(xb, 2)
        s //= 2
        i += 1
    out = _conv(xb, params["conv_last"]["kernel"], params["conv_last"]["bias"])
    return out.astype(jnp.float32) / cfg.img_range + mean
