"""Pallas TPU kernel for fused window attention (stub for now).

Filled in after the end-to-end slice works; until then every call raises
NotImplementedError and the dispatcher falls back to the XLA path.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def window_attention_pallas(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                            bias: jnp.ndarray,
                            mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    raise NotImplementedError
