"""Fused window attention as a Pallas TPU kernel.

One kernel program computes scores -> bias/mask add -> softmax -> value matmul
for a *group* of windows without materialising the [N, N] attention tensor in
HBM (the XLA path writes B*nh*N*N floats between ops).

TPU mapping:
- head_dim is padded to a 128-lane multiple so q/k/v tiles sit on the MXU;
- windows are grouped G = 128//N at a time (N = win^2, e.g. 64 for the
  flagship window 8): the group's [G*N, G*N] score matrix is a full MXU tile;
  cross-window entries are forced to -1e30 pre-softmax so grouped attention is
  exactly per-window attention (block-diagonal);
- the additive term (relative-position bias + shifted-window mask,
  reference src/drct.py:284-293) is precomputed per distinct window pattern —
  nW*nh*N*N floats, kilobytes — and indexed by the kernel, not rebuilt per
  batch element.

Training: backward runs through the XLA einsum path via custom_vjp (a
flash-style Pallas backward is a later optimisation); forward inference and
the forward half of training use this kernel.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

# interpret mode lets the kernel run (slowly) on CPU for parity tests
_INTERPRET = os.environ.get("ADSR_TPU_PALLAS_INTERPRET", "0") == "1"

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu only exists on TPU-enabled builds
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _attn_kernel(q_ref, k_ref, v_ref, a_ref, o_ref, *, p: int, gn: int,
                 shared_a: bool):
    """One program: P window-groups x one head, statically unrolled.

    Blocks: q/k/v/o [1, 1, P*G*N, hd_p]; a [P or 1, 1, G*N, G*N] block-diag
    additive. Pure 2-D ops only (Mosaic rejects in-kernel 4-D reshapes)."""
    for j in range(p):
        sl = slice(j * gn, (j + 1) * gn)
        q = q_ref[0, 0, sl, :]
        k = k_ref[0, 0, sl, :]
        v = v_ref[0, 0, sl, :]
        a = a_ref[0 if shared_a else j, 0]
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) + a
        s = s - jnp.max(s, axis=-1, keepdims=True)
        w = jnp.exp(s)
        w = w / jnp.sum(w, axis=-1, keepdims=True)
        o_ref[0, 0, sl, :] = jnp.dot(
            w.astype(v.dtype), v,
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _block_diag_additive(a: jnp.ndarray, g: int) -> jnp.ndarray:
    """[W, nh, N, N] per-window additive -> [W//G, nh, G*N, G*N] block-diag
    group matrices with -1e30 off-diagonal (forces per-window softmax)."""
    w, nh, n, _ = a.shape
    wg = w // g
    a_r = a.reshape(wg, g, nh, n, n)
    out = jnp.full((wg, nh, g * n, g * n), -1e30, dtype=jnp.float32)
    for i in range(g):
        out = out.at[:, :, i * n:(i + 1) * n, i * n:(i + 1) * n].set(
            a_r[:, i].astype(jnp.float32))
    return out


def _forward(q, k, v, bias, mask):
    b, nh, n, hd = q.shape
    if n % 8 != 0:
        raise NotImplementedError(f"window tokens {n} not sublane-aligned")
    nw = mask.shape[0] if mask is not None else 1
    g = max(1, min(128 // n, nw)) if n < 128 else 1
    if mask is not None:
        while nw % g or (b % g):
            g -= 1
    elif b % g:
        g = 1
    hd_p = _round_up(hd, 128)

    dtype = q.dtype
    pad = [(0, 0), (0, 0), (0, 0), (0, hd_p - hd)]
    qp = jnp.pad(q, pad)
    kp = jnp.pad(k, pad)
    vp = jnp.pad(v, pad)

    # group G consecutive windows: [B/G, nh, G*N, hd_p]
    def group(x):
        x = x.reshape(b // g, g, nh, n, hd_p)
        return x.transpose(0, 2, 1, 3, 4).reshape(b // g, nh, g * n, hd_p)

    qg, kg, vg = group(qp), group(kp), group(vp)

    # additive term per (window-pattern group, head): [W//G, nh, G*N, G*N]
    n_groups = b // g
    if mask is not None:
        a = bias[None].astype(jnp.float32) + mask[:, None].astype(jnp.float32)
        ag = _block_diag_additive(a, g)          # [w_groups, nh, G*N, G*N]
        p_groups = nw // g                       # one image's groups / program
        shared_a = p_groups == 1
    else:
        a = jnp.broadcast_to(bias[None].astype(jnp.float32), (g, nh, n, n))
        ag = _block_diag_additive(a, g)          # [1, nh, G*N, G*N]
        p_groups = 1
        for cand in (8, 4, 2):                   # batch groups per program
            if n_groups % cand == 0:
                p_groups = cand
                break
        shared_a = True

    grid = (n_groups // p_groups, nh)
    pgn = p_groups * g * n
    blk = lambda: pl.BlockSpec((1, 1, pgn, hd_p),
                               lambda i, h: (i, h, 0, 0),
                               memory_space=pltpu.VMEM)

    def merge(x):  # [n_groups, nh, G*N, hd_p] -> [grid0, nh, P*G*N, hd_p]
        x = x.reshape(n_groups // p_groups, p_groups, nh, g * n, hd_p)
        return x.transpose(0, 2, 1, 3, 4).reshape(
            n_groups // p_groups, nh, pgn, hd_p)

    out = pl.pallas_call(
        functools.partial(_attn_kernel, p=p_groups, gn=g * n,
                          shared_a=shared_a),
        grid=grid,
        in_specs=[blk(), blk(), blk(),
                  pl.BlockSpec((1 if shared_a else p_groups, 1, g * n, g * n),
                               lambda i, h: (0, h, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=blk(),
        out_shape=jax.ShapeDtypeStruct((n_groups // p_groups, nh, pgn, hd_p),
                                       dtype),
        interpret=_INTERPRET,
    )(merge(qg), merge(kg), merge(vg), ag)
    out = out.reshape(n_groups // p_groups, nh, p_groups, g * n, hd_p)
    out = out.transpose(0, 2, 1, 3, 4).reshape(n_groups, nh, g * n, hd_p)

    # ungroup and strip padding
    out = out.reshape(b // g, nh, g, n, hd_p).transpose(0, 2, 1, 3, 4)
    return out.reshape(b, nh, n, hd_p)[..., :hd]


def _make_custom(with_mask: bool):
    from adsr_tpu.ops.window_attention import window_attention_xla

    if with_mask:
        @jax.custom_vjp
        def wa(q, k, v, bias, mask):
            return _forward(q, k, v, bias, mask)

        def fwd(q, k, v, bias, mask):
            return wa(q, k, v, bias, mask), (q, k, v, bias, mask)

        def bwd(res, gout):
            q, k, v, bias, mask = res
            _, vjp = jax.vjp(
                lambda q, k, v, bias: window_attention_xla(q, k, v, bias,
                                                           mask), q, k, v,
                bias)
            dq, dk, dv, dbias = vjp(gout)
            return dq, dk, dv, dbias, None

        wa.defvjp(fwd, bwd)
        return wa

    @jax.custom_vjp
    def wa_nm(q, k, v, bias):
        return _forward(q, k, v, bias, None)

    def fwd_nm(q, k, v, bias):
        return wa_nm(q, k, v, bias), (q, k, v, bias)

    def bwd_nm(res, gout):
        q, k, v, bias = res
        _, vjp = jax.vjp(
            lambda q, k, v, bias: window_attention_xla(q, k, v, bias, None),
            q, k, v, bias)
        return vjp(gout)

    wa_nm.defvjp(fwd_nm, bwd_nm)
    return wa_nm


_WA_MASK = None
_WA_NOMASK = None


def window_attention_pallas(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                            bias: jnp.ndarray,
                            mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    if not _HAS_PLTPU:
        raise NotImplementedError("pallas tpu backend unavailable")
    n = q.shape[2]
    if n % 8 != 0:
        raise NotImplementedError("unaligned window token count")
    global _WA_MASK, _WA_NOMASK
    if mask is not None:
        if _WA_MASK is None:
            _WA_MASK = _make_custom(True)
        return _WA_MASK(q, k, v, bias, mask)
    if _WA_NOMASK is None:
        _WA_NOMASK = _make_custom(False)
    return _WA_NOMASK(q, k, v, bias)
