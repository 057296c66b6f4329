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

from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from adsr_tpu.core.config import DRCTModelConfig
from adsr_tpu.models.common import RGB_MEAN
from adsr_tpu.models.drct import shift_attn_mask
from adsr_tpu.ops.fused_swin_block import (build_attn_term, fused_swin_block,
                                           pack_swin_weights_jnp)


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


def _geometry(cfg: DRCTModelConfig):
    d, gc, nh, win = cfg.embed_dim, cfg.gc, cfg.num_heads, cfg.window_size
    shift = win // 2
    feats = [d + k * gc for k in range(5)]
    heads = [nh] + [nh - ((d + k * gc) % nh) for k in range(1, 5)]
    shifts = [0, shift, 0, shift, 0]
    return feats, heads, shifts


def prepack_drct(params: Dict, cfg: DRCTModelConfig, h: int, w: int,
                 dtype=jnp.bfloat16, mode: Optional[str] = None) -> Dict:
    """One-off kernel-layout packing of the scan-stacked DRCT param tree.

    Runs the lane padding, the relative-position-bias gather, and the
    pair-grouped additive-attention-term construction ONCE at params-load
    time; the per-forward scan then consumes ready tensors (the reference
    rebuilds none of this per step either — torch keeps weights resident,
    src/drct.py:249-276).

    ``mode`` picks the kernel granularity:
    - ``"rdg"`` (default, ADSR_TPU_RDG=0 opts out): whole-RDG programs
      (ops/fused_rdg.py) — adjust convs / dense concat / residual fused in;
      returns ``{"blocks": [...], "head": {...}}``.
    - ``"block"``: per-swin-block programs (ops/fused_swin_block.py) with
      XLA glue between blocks; returns ``{"swin": [...], "adjust": [...],
      "head": {...}}``.
    Every stacked leaf has a leading [num_layers] axis for lax.scan.
    """
    if mode is None:
        import os
        mode = "block" if os.environ.get("ADSR_TPU_RDG", "1") == "0" \
            else "rdg"
    if mode == "rdg":
        from adsr_tpu.ops.fused_rdg import prepack_rdg_stack
        return prepack_rdg_stack(params, cfg, h, w, dtype=dtype)
    assert cfg.scan_layers, "fused forward expects the scan-stacked layout"
    win = cfg.window_size
    feats, heads, shifts = _geometry(cfg)
    masks = {s: (np.asarray(shift_attn_mask(h, w, win, s)) if s else None)
             for s in set(shifts)}
    rdg = params["rdgs"]["rdg"]

    swin, adjust = [], []
    for k in range(5):
        def pack_one(p, k=k):
            pk = pack_swin_weights_jnp(p, feats[k], heads[k], win,
                                       dtype=dtype)
            bias = pk.pop("bias")
            pk["attn"] = build_attn_term(bias, h, w, win, heads[k],
                                         masks[shifts[k]])
            return pk
        swin.append(jax.vmap(pack_one)(rdg[f"swin{k+1}"]))
        adj = rdg[f"adjust{k+1}"]
        adjust.append({
            # 1x1 conv == matmul over tokens: [L, 1, 1, Cin, Cout] -> [L, Cin, Cout]
            "kernel": jnp.asarray(adj["kernel"], jnp.float32)
                         .reshape(adj["kernel"].shape[0], feats[k], -1)
                         .astype(dtype),
            "bias": jnp.asarray(adj["bias"], jnp.float32),
        })

    head = {name: params[name] for name in params
            if name not in ("rdgs",)}
    return {"swin": swin, "adjust": adjust, "head": head}


def fused_drct_apply(packed: Dict, cfg: DRCTModelConfig, x: jnp.ndarray,
                     dtype=jnp.bfloat16) -> jnp.ndarray:
    """LR [B, h, w, C] float32 -> SR from a :func:`prepack_drct` tree."""
    c_in = cfg.in_chans
    if c_in == 3:
        mean = jnp.asarray(RGB_MEAN, jnp.float32)
    else:
        mean = jnp.zeros((c_in,), jnp.float32)
    x = (x - mean) * cfg.img_range
    x = x.astype(dtype)
    b, h, w, _ = x.shape
    d, win = cfg.embed_dim, cfg.window_size
    feats, heads, shifts = _geometry(cfg)
    params = packed["head"]

    feat = _conv(x, params["conv_first"]["kernel"],
                 params["conv_first"]["bias"])
    t0 = feat.reshape(b, h * w, d)
    # top-level patch-embed LayerNorm (reference src/drct.py:739, 685-688)
    tf = t0.astype(jnp.float32)
    mu = jnp.mean(tf, axis=-1, keepdims=True)
    var = jnp.var(tf, axis=-1, keepdims=True)
    t0 = ((tf - mu) * lax.rsqrt(var + 1e-6)
          * params["patch_norm"]["scale"]
          + params["patch_norm"]["bias"]).astype(dtype)

    if "blocks" in packed:
        # whole-RDG Pallas programs: tokens stay VMEM-resident through all 5
        # swin blocks + adjust convs + dense concat + 0.2 residual. The
        # kernel keeps tokens WINDOW-ORDER RESIDENT (shift-0 window order,
        # see ops/fused_rdg.py) — permute once here, undo after the scan.
        from adsr_tpu.ops.fused_rdg import fused_rdg
        c0p = -(-d // 128) * 128
        t = jnp.pad(t0, ((0, 0), (0, 0), (0, c0p - d)))
        hw, ww = h // win, w // win
        # quadrant-major within-window token order (see fused_rdg's
        # _quadrant_perm): window-major, then the 2x2 quadrants, then raster
        # within the (win/2)^2 quadrant
        q = win // 2
        t = (t.reshape(b, hw, 2, q, ww, 2, q, c0p)
             .transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(b, h * w, c0p))

        # static key-presence flags (see prepack_rdg_stack) — trace-safe
        stable = "softmax_stable" in packed
        vext = "vext" in packed

        def rdg_body(t, blocks):
            return fused_rdg(t, blocks, cfg, h, w,
                             force_stable=stable, vext=vext), None

        t, _ = lax.scan(rdg_body, t, packed["blocks"])
        t = (t.reshape(b, hw, ww, 2, 2, q, q, c0p)
             .transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(b, h * w, c0p))
        t = t[:, :, :d]
    else:
        def layer(t, xs):
            swin_k, adjust_k = xs
            outs = [t]
            for k in range(5):
                inp = outs[0] if k == 0 else jnp.concatenate(outs, axis=-1)
                pk = dict(swin_k[k])
                attn = pk.pop("attn")
                y = fused_swin_block(inp.astype(dtype), pk, h, w, win,
                                     shifts[k], heads[k], feats[k], attn=attn)
                adj = adjust_k[k]
                y = jnp.einsum("blc,co->blo", y.astype(dtype),
                               adj["kernel"]) + adj["bias"].astype(dtype)
                if k < 4:
                    y = jax.nn.leaky_relu(y, 0.2)
                outs.append(y)
            return outs[5] * 0.2 + t

        def body(t, xs):
            return layer(t, xs), None

        t, _ = lax.scan(body, t0, (packed["swin"], packed["adjust"]))

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


def fused_drct_forward(params: Dict, cfg: DRCTModelConfig,
                       x: jnp.ndarray,
                       dtype=jnp.bfloat16) -> jnp.ndarray:
    """LR [B, h, w, C] float32 -> SR, matching DRCT.apply(deterministic=True).

    ``params`` is the scan-stacked tree ({'rdgs': {'rdg': ...}}, the default
    checkpoint layout). Packing runs inside the call — when the same params
    serve many forwards (serving, benchmarking), call :func:`prepack_drct`
    once and use :func:`fused_drct_apply` instead.
    """
    b, h, w, _ = x.shape
    packed = prepack_drct(params, cfg, h, w, dtype=dtype)
    return fused_drct_apply(packed, cfg, x, dtype=dtype)
