"""Fused SwinBlock forward as a single Pallas TPU kernel.

Motivation (ARCHITECTURE.md bandwidth audit): the XLA path makes ~10 HBM round
trips per swin block over ~16 MB activations; this kernel keeps one image's
tokens resident in VMEM through LN1 -> qkv -> per-window attention -> proj ->
residual -> LN2 -> MLP -> residual.

Weight packing (host-side, once): lanes padded to 128 multiples and qkv/proj
rearranged into per-(head, q/k/v) 128-aligned slabs so no in-kernel lane
relayouts occur. Padded input lanes carry zeros; LN statistics divide by the
TRUE channel count and packed weight rows/biases for padded lanes are zero, so
padding never leaks into results.

Window gather: each 8x8 window is assembled from 8 strided row-slices of the
[1024, C] token block (with static wrap-around slices for the shifted case),
attention computed per (window, head) with the additive bias+mask term, and
scattered back — all static Python loops at trace time, pure 2-D ops for
Mosaic.

Status: forward-only, numerically verified in interpret mode against the XLA
SwinBlock; integration behind a flag once hardware microbenchmarks confirm the
win (round-2 plan).
"""

from __future__ import annotations

import functools
import os
from typing import Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

_INTERPRET = os.environ.get("ADSR_TPU_PALLAS_INTERPRET", "0") == "1"


def _rup(x: int, m: int = 128) -> int:
    return (x + m - 1) // m * m


def pack_swin_weights(params: Dict, c: int, num_heads: int,
                      window: int) -> Dict[str, np.ndarray]:
    """Repack a SwinBlock param tree into kernel layout (host-side, once).

    Only the channel axes are zero-padded to 128-lane multiples; head dims
    stay unpadded (per-head lane slices inside VMEM are cheap, while padding
    hd 30->128 would inflate qkv/proj FLOPs ~6x for the 6-head dims).
    """
    hd = c // num_heads
    c_p = _rup(c)
    c3_p = _rup(3 * c)
    qkv_k = np.asarray(params["attn"]["qkv"]["kernel"])      # [C, 3C]
    qkv_b = np.asarray(params["attn"]["qkv"]["bias"])
    wq = np.zeros((c_p, c3_p), np.float32)
    wq[:c, :3 * c] = qkv_k
    bq = np.zeros((1, c3_p), np.float32)
    bq[0, :3 * c] = qkv_b

    proj_k = np.asarray(params["attn"]["proj"]["kernel"])    # [C, C]
    wp = np.zeros((c_p, c_p), np.float32)
    wp[:c, :c] = proj_k
    bp = np.zeros((1, c_p), np.float32)
    bp[0, :c] = np.asarray(params["attn"]["proj"]["bias"])

    fc1_k = np.asarray(params["mlp"]["fc1"]["kernel"])       # [C, F]
    f = fc1_k.shape[1]
    f_p = _rup(f)
    w1 = np.zeros((c_p, f_p), np.float32)
    w1[:c, :f] = fc1_k
    b1 = np.zeros((1, f_p), np.float32)
    b1[0, :f] = np.asarray(params["mlp"]["fc1"]["bias"])
    fc2_k = np.asarray(params["mlp"]["fc2"]["kernel"])       # [F, C]
    w2 = np.zeros((f_p, c_p), np.float32)
    w2[:f, :c] = fc2_k
    b2 = np.zeros((1, c_p), np.float32)
    b2[0, :c] = np.asarray(params["mlp"]["fc2"]["bias"])

    def ln(p):
        s = np.zeros((1, c_p), np.float32)
        b = np.zeros((1, c_p), np.float32)
        s[0, :c] = np.asarray(p["scale"])
        b[0, :c] = np.asarray(p["bias"])
        return s, b

    ln1_s, ln1_b = ln(params["norm1"])
    ln2_s, ln2_b = ln(params["norm2"])

    # additive attention term [H, N, N]: relative position bias
    from adsr_tpu.models.drct import relative_position_index
    table = np.asarray(params["attn"]["relative_position_bias_table"])
    n = window * window
    rpi = relative_position_index(window).reshape(-1)
    bias = table[rpi].reshape(n, n, num_heads).transpose(2, 0, 1)

    return {"wqkv": wq, "bqkv": bq, "wproj": wp, "bproj": bp,
            "w1": w1, "b1": b1, "w2": w2, "b2": b2,
            "ln1_s": ln1_s, "ln1_b": ln1_b, "ln2_s": ln2_s, "ln2_b": ln2_b,
            "bias": bias.astype(np.float32)}


def pack_swin_weights_jnp(params: Dict, c: int, num_heads: int,
                          window: int, dtype=jnp.bfloat16) -> Dict:
    """Device-side twin of pack_swin_weights (jnp ops, usable under jit —
    e.g. on nn.scan-sliced per-layer params). Pads channel lanes only."""
    c_p = _rup(c)
    c3_p = _rup(3 * c)

    def pad2(m, rows, cols, dt):
        m = jnp.asarray(m, jnp.float32)
        return jnp.pad(m, ((0, rows - m.shape[0]),
                           (0, cols - m.shape[1]))).astype(dt)

    def pad_row(v, cols):
        v = jnp.asarray(v, jnp.float32).reshape(1, -1)
        return jnp.pad(v, ((0, 0), (0, cols - v.shape[1])))

    f = params["mlp"]["fc1"]["kernel"].shape[1]
    f_p = _rup(f)
    from adsr_tpu.models.drct import relative_position_index
    n = window * window
    rpi = jnp.asarray(relative_position_index(window).reshape(-1))
    table = jnp.asarray(params["attn"]["relative_position_bias_table"],
                        jnp.float32)
    bias = table[rpi].reshape(n, n, num_heads).transpose(2, 0, 1)
    return {
        "wqkv": pad2(params["attn"]["qkv"]["kernel"], c_p, c3_p, dtype),
        "bqkv": pad_row(params["attn"]["qkv"]["bias"], c3_p),
        "wproj": pad2(params["attn"]["proj"]["kernel"], c_p, c_p, dtype),
        "bproj": pad_row(params["attn"]["proj"]["bias"], c_p),
        "w1": pad2(params["mlp"]["fc1"]["kernel"], c_p, f_p, dtype),
        "b1": pad_row(params["mlp"]["fc1"]["bias"], f_p),
        "w2": pad2(params["mlp"]["fc2"]["kernel"], f_p, c_p, dtype),
        "b2": pad_row(params["mlp"]["fc2"]["bias"], c_p),
        "ln1_s": pad_row(params["norm1"]["scale"], c_p),
        "ln1_b": pad_row(params["norm1"]["bias"], c_p),
        "ln2_s": pad_row(params["norm2"]["scale"], c_p),
        "ln2_b": pad_row(params["norm2"]["bias"], c_p),
        "bias": bias,
    }


def _attn_group(nw: int, n: int) -> int:
    """Windows per attention matmul: pairs when a [2N, 2N] tile fits MXU rows."""
    return 2 if (nw % 2 == 0 and 2 * n <= 128) else 1


def build_attn_term(bias: jnp.ndarray, h: int, w: int, window: int,
                    num_heads: int,
                    mask: Optional[np.ndarray] = None,
                    group: Optional[int] = None,
                    perm: Optional[np.ndarray] = None) -> jnp.ndarray:
    """Additive attention term per (window-group, head), block-diagonal when
    the kernel batches ``group`` windows per score tile. Pure function of the
    (learned) relative position bias [H, N, N] and the static shift mask —
    build it ONCE at params-load time (prepack) instead of per forward.

    ``perm`` (optional, [N]): within-window token permutation applied to both
    score axes, for kernels whose resident token order inside a window is not
    raster (fused_rdg keeps tokens quadrant-major so the shifted-window
    gather is nw*4 whole-quadrant block copies)."""
    n = window * window
    nw = (h // window) * (w // window)
    a = jnp.broadcast_to(jnp.asarray(bias)[None], (nw, num_heads, n, n))
    if mask is not None:
        a = a + jnp.asarray(mask)[:, None]
    if perm is not None:
        p = jnp.asarray(perm)
        a = a[:, :, p][:, :, :, p]
    if group is None:
        group = _attn_group(nw, n)
    if group > 1:
        # group-block-diagonal with -1e30 off-diagonal, so grouped softmax
        # is exactly per-window softmax
        ap = a.reshape(nw // group, group, num_heads, n, n)
        big = jnp.full((nw // group, num_heads, group * n, group * n),
                       -1e30, jnp.float32)
        for i in range(group):
            big = big.at[:, :, i * n:(i + 1) * n, i * n:(i + 1) * n] \
                .set(ap[:, i])
        a = big
    return a


def _window_row_slices(h: int, w: int, win: int, shift: int):
    """Static gather plan: for each window, the list of (dst_row, src_start,
    width, dst_col) copies assembling its [win*win] token rows from the
    (shifted) [H*W] token sequence."""
    plans = []
    for wi in range(h // win):
        for wj in range(w // win):
            copies = []
            for r in range(win):
                src_row = (wi * win + r + shift) % h
                col0 = (wj * win + shift) % w
                if col0 + win <= w:
                    copies.append((r * win, src_row * w + col0, win))
                else:
                    k = w - col0
                    copies.append((r * win, src_row * w + col0, k))
                    copies.append((r * win + k, src_row * w, win - k))
            plans.append(copies)
    return plans


def _kernel(x_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
            w1_ref, b1_ref, w2_ref, b2_ref,
            ln1s_ref, ln1b_ref, ln2s_ref, ln2b_ref, a_ref,
            o_ref, qkv_scr, win_scr, ctx_scr,
            *, c: int, c_p: int, nh: int, n: int,
            plans, inv_plans, f_p: int):
    mm = x_ref.dtype                                 # matmul dtype (bf16/f32)
    x = x_ref[0].astype(jnp.float32)                 # [L, C_p]
    l = x.shape[0]
    hd = c // nh

    def layer_norm(t, s_ref, b_ref):
        mu = jnp.sum(t, axis=-1, keepdims=True) / c
        d = t - mu
        # padded lanes hold -mu after centering; the zero-padded scale zeroes
        # them; stats divide by the TRUE channel count
        var = (jnp.sum(t * t, axis=-1, keepdims=True) / c) - mu * mu
        inv = jax.lax.rsqrt(var + 1e-6)
        return (d * inv) * s_ref[0] + b_ref[0]

    y = layer_norm(x, ln1s_ref, ln1b_ref).astype(mm)
    qkv_scr[:, :] = (jnp.dot(y, wqkv_ref[...],
                             preferred_element_type=jnp.float32)
                     + bqkv_ref[0]).astype(qkv_scr.dtype)

    scale = hd ** -0.5
    nw = len(plans)
    ctx_scr[:, :] = jnp.zeros_like(ctx_scr)  # padded lanes must be 0, not junk
    # windows processed in pairs: [2N, 2N] score tiles fill MXU rows; the
    # additive term is block-diagonal with -1e30 off-diagonal, so grouped
    # softmax is exactly per-window softmax
    group = _attn_group(nw, n)
    gn = group * n
    for j in range(nw // group):
        for g in range(group):
            wdx = j * group + g
            for dst, src, width in plans[wdx]:
                win_scr[g * n + dst:g * n + dst + width, :] = \
                    qkv_scr[src:src + width, :]
        for h in range(nh):
            qo = 0 * c + h * hd
            ko = 1 * c + h * hd
            vo = 2 * c + h * hd
            q = win_scr[:gn, qo:qo + hd] * scale
            k = win_scr[:gn, ko:ko + hd]
            v = win_scr[:gn, vo:vo + hd]
            s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
            s = s + a_ref[j, h]
            s = s - jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            ctx_scr[j * gn:(j + 1) * gn, h * hd:(h + 1) * hd] = jnp.dot(
                p.astype(v.dtype), v,
                preferred_element_type=jnp.float32).astype(ctx_scr.dtype)

    # undo the window permutation into qkv_scr reused as [L, C_p] context
    for wdx in range(nw):
        for dst, src, width in inv_plans[wdx]:
            qkv_scr[dst:dst + width, :c_p] = ctx_scr[src:src + width, :c_p]

    ctx = qkv_scr[:, :c_p].astype(mm)
    x = x + (jnp.dot(ctx, wproj_ref[...],
                     preferred_element_type=jnp.float32) + bproj_ref[0])

    y = layer_norm(x, ln2s_ref, ln2b_ref).astype(mm)
    hmid = jnp.dot(y, w1_ref[...], preferred_element_type=jnp.float32) \
        + b1_ref[0]
    # exact-form gelu; Mosaic lowers neither erf nor erfc, so erf comes from
    # the Abramowitz-Stegun 7.1.26 polynomial (max abs err 1.5e-7)
    z = hmid * (2.0 ** -0.5)
    az = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * az)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    erf_abs = 1.0 - poly * jnp.exp(-az * az)
    erf_z = jnp.sign(z) * erf_abs
    hmid = 0.5 * hmid * (1.0 + erf_z)
    x = x + (jnp.dot(hmid.astype(mm), w2_ref[...],
                     preferred_element_type=jnp.float32) + b2_ref[0])
    o_ref[0] = x.astype(o_ref.dtype)


def fused_swin_block(x: jnp.ndarray, packed: Dict[str, jnp.ndarray],
                     h: int, w: int, window: int, shift: int,
                     num_heads: int, c: int,
                     mask: Optional[np.ndarray] = None,
                     attn: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """x: [B, L, C] tokens -> [B, L, C]; one program per image.

    ``attn`` is the prebuilt additive term from :func:`build_attn_term`
    (pass it to skip per-call construction); when None it is built here from
    ``packed['bias']`` and ``mask``.
    """
    if not _HAS_PLTPU:
        raise NotImplementedError
    b, l, _ = x.shape
    n = window * window
    c_p = _rup(c)
    c3_p = packed["wqkv"].shape[1]
    f_p = packed["w1"].shape[1]
    nw = (h // window) * (w // window)
    group = _attn_group(nw, n)

    # keep the caller's dtype: bf16 x + bf16 packed weights run MXU bf16
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, c_p - c)))

    a = attn if attn is not None else build_attn_term(
        packed["bias"], h, w, window, num_heads, mask)

    plans = _window_row_slices(h, w, window, shift)
    # inverse plan: window rows -> token rows (same copies, swapped src/dst)
    inv_plans = []
    for wdx, copies in enumerate(plans):
        inv = [(src, wdx * n + dst, width) for dst, src, width in copies]
        inv_plans.append(inv)

    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    grid = (b,)
    kernel = functools.partial(
        _kernel, c=c, c_p=c_p, nh=num_heads, n=n,
        plans=tuple(tuple(p) for p in plans),
        inv_plans=tuple(tuple(p) for p in inv_plans), f_p=f_p)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((1, l, c_p), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)]
        + [vmem()] * 13,
        out_specs=pl.BlockSpec((1, l, c_p), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, l, c_p), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((l, c3_p), x.dtype),
            pltpu.VMEM((group * n, c3_p), x.dtype),
            pltpu.VMEM((l, c_p), x.dtype),
        ],
        compiler_params=(pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024) if _HAS_PLTPU and not _INTERPRET
            else None),
        interpret=_INTERPRET,
    )(xp, packed["wqkv"], packed["bqkv"], packed["wproj"], packed["bproj"],
      packed["w1"], packed["b1"], packed["w2"], packed["b2"],
      packed["ln1_s"], packed["ln1_b"], packed["ln2_s"], packed["ln2_b"], a)
    return out[:, :, :c]
