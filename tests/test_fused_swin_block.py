"""Fused SwinBlock Pallas kernel parity vs the XLA SwinBlock module
(interpret mode on CPU; the same code path compiles on TPU)."""

import os

os.environ["ADSR_TPU_PALLAS_INTERPRET"] = "1"

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adsr_tpu.models.drct import SwinBlock, shift_attn_mask
from adsr_tpu.ops.fused_swin_block import fused_swin_block, pack_swin_weights
from adsr_tpu.models.factory import fast_init


@pytest.mark.parametrize("shift", [0, 2])
@pytest.mark.parametrize("c,nh", [(12, 2),
                                  pytest.param(20, 4,
                                               marks=pytest.mark.slow)])
def test_matches_swin_block(shift, c, nh):
    h = w = 8
    win = 4
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, h * w, c), jnp.float32)

    blk = SwinBlock(dim=c, input_resolution=(h, w), num_heads=nh,
                    window_size=win, shift_size=shift, mlp_ratio=2.0)
    params = fast_init(blk.init, jax.random.key(0), x, (h, w))["params"]
    want = np.asarray(blk.apply({"params": params}, x, (h, w)))

    packed = {k: jnp.asarray(v) for k, v in
              pack_swin_weights(params, c, nh, win).items()}
    mask = shift_attn_mask(h, w, win, shift) if shift else None
    got = np.asarray(fused_swin_block(x, packed, h, w, win, shift, nh, c,
                                      mask=mask))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)
