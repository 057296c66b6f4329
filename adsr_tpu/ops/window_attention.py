"""Window attention — the hot op of DRCT (reference src/drct.py:277-302).

``window_attention_xla`` (einsum + softmax batched GEMMs) is the production
implementation on every backend. A hand-written standalone Pallas kernel was
measured SLOWER at every reachable DRCT shape on v5e — flagship N=64
(B=512, nh=6, hd=30): 726 us (XLA) vs 1630 us; big-window N=256 (res-256
serving): 4.8 ms vs 8.8 ms — XLA's internal MXU padding of the tiny
irregular head dims beats a kernel that must pad hd 30->128 and relayout
windows, so the kernel was deleted (round 2). Its learnings live in the
fused whole-RDG serving kernel (ops/fused_rdg.py), which wins by fusing
attention with the surrounding block instead of competing op-for-op.

Shapes: q, k, v are [B, nh, N, hd] where B = batch * num_windows, N = window
tokens (win^2 <= 1024), hd = head dim (irregular: 30..154 after DRCT's head
fix-up). bias is [nh, N, N]; mask is [nW, N, N] or None (B % nW == 0).
q is expected pre-scaled by head_dim**-0.5.
"""

from __future__ import annotations

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


def window_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                     bias: jnp.ndarray,
                     mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    return window_attention_xla(q, k, v, bias, mask)
