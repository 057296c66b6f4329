"""Fused window attention — the hot op of DRCT (reference src/drct.py:277-302).

Two interchangeable implementations:
- ``window_attention_xla``: einsum + softmax batched GEMMs. DEFAULT on every
  backend: measured on v5e at the flagship DRCT shape (B=512, nh=6, N=64,
  hd=30) it runs 726 us/call (bf16) vs 1630 us for the Pallas kernel — XLA's
  internal MXU padding of the tiny irregular head dims beats a hand kernel
  that must pad hd 30->128 in HBM and relayout windows.
- ``window_attention_pallas``: fused Pallas TPU kernel (grouped
  block-diagonal windows, no [N,N] HBM materialisation); numerically verified
  on hardware (max err 7e-4 f32). Opt-in via ADSR_TPU_PALLAS=1 — the win
  case is larger windows (N >= 256) where the attention tensor dominates HBM.

Shapes: q, k, v are [B, nh, N, hd] where B = batch * num_windows, N = window
tokens (win^2 <= 1024), hd = head dim (irregular: 30..154 after DRCT's head
fix-up). bias is [nh, N, N]; mask is [nW, N, N] or None (B % nW == 0).
q is expected pre-scaled by head_dim**-0.5.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp


def window_attention_xla(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                         bias: jnp.ndarray,
                         mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    b, nh, n, hd = q.shape
    attn = jnp.einsum("bhnd,bhmd->bhnm", q, k)
    attn = attn + bias[None]
    if mask is not None:
        nw = mask.shape[0]
        attn = attn.reshape(b // nw, nw, nh, n, n)
        attn = attn + mask[None, :, None].astype(attn.dtype)
        attn = attn.reshape(b, nh, n, n)
    attn = jax.nn.softmax(attn, axis=-1)
    return jnp.einsum("bhnm,bhmd->bhnd", attn, v)


def _use_pallas() -> bool:
    flag = os.environ.get("ADSR_TPU_PALLAS", "auto")
    if flag in ("0", "auto"):   # XLA is faster at DRCT's window shapes
        return False
    if flag == "force":         # interpret-mode parity testing on CPU
        return True
    return jax.default_backend() not in ("cpu",)


def window_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                     bias: jnp.ndarray,
                     mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    if _use_pallas():
        from adsr_tpu.ops.window_attention_pallas import window_attention_pallas
        try:
            return window_attention_pallas(q, k, v, bias, mask)
        except NotImplementedError:
            pass
    return window_attention_xla(q, k, v, bias, mask)
