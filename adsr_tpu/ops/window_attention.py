"""Fused window attention — the hot op of DRCT (reference src/drct.py:277-302).

Two interchangeable implementations:
- ``window_attention_xla``: einsum + softmax, used on CPU and as the numeric
  reference. XLA fuses bias/mask/softmax into the matmuls adequately.
- ``window_attention_pallas``: one fused Pallas TPU kernel per block of
  windows: qk^T + bias (+mask) -> softmax -> @v without materialising the
  [N, N] attention matrix in HBM.

``window_attention`` dispatches by backend and the ADSR_TPU_PALLAS env flag.

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
    flag = os.environ.get("ADSR_TPU_PALLAS", "1")
    if flag == "0":
        return False
    if flag == "force":  # interpret-mode parity testing on CPU
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
