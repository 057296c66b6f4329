"""Numeric parity of DRCT building blocks against torch oracles.

The oracles are small torch implementations written from the W-MSA spec
(scaled qk^T + gathered relative-position bias + optional additive mask ->
softmax -> v, head split (3, nh, hd) after one fused qkv projection) — the
same math the reference model computes — fed the SAME weights as our Flax
modules via explicit transposition.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adsr_tpu.models.drct import (
    WindowAttention, relative_position_index, window_partition, window_reverse,
)
from adsr_tpu.models.factory import fast_init


class TestWindowPartition:
    def test_roundtrip(self):
        x = jnp.asarray(np.random.RandomState(0).rand(2, 8, 12, 5),
                        jnp.float32)
        w = window_partition(x, 4)
        assert w.shape == (2 * 2 * 3, 16, 5)
        back = window_reverse(w, 4, 8, 12)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))

    def test_window_contents(self):
        # token (0, 5) of a 4x4 grid lands in window 1 (columns 4-7)
        x = jnp.arange(64, dtype=jnp.float32).reshape(1, 8, 8, 1)
        w = window_partition(x, 4)
        assert float(w[1, 1, 0]) == float(x[0, 0, 5, 0])


def torch_window_attention(x, wqkv, bqkv, wproj, bproj, table, rpi, nh,
                           mask=None):
    """Torch W-MSA oracle; x [B, N, C], weights in torch layout."""
    import torch
    x = torch.from_numpy(x)
    b, n, c = x.shape
    hd = c // nh
    qkv = x @ torch.from_numpy(wqkv).T + torch.from_numpy(bqkv)
    qkv = qkv.reshape(b, n, 3, nh, hd).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0] * hd ** -0.5, qkv[1], qkv[2]
    attn = q @ k.transpose(-2, -1)
    bias = torch.from_numpy(table)[torch.from_numpy(rpi).reshape(-1)]
    attn = attn + bias.reshape(n, n, nh).permute(2, 0, 1)[None]
    if mask is not None:
        nw = mask.shape[0]
        attn = attn.view(b // nw, nw, nh, n, n) + \
            torch.from_numpy(mask)[None, :, None]
        attn = attn.view(b, nh, n, n)
    attn = torch.softmax(attn, dim=-1)
    out = (attn @ v).transpose(1, 2).reshape(b, n, c)
    return (out @ torch.from_numpy(wproj).T + torch.from_numpy(bproj)).numpy()


class TestWindowAttentionParity:
    @pytest.mark.parametrize("mask_on", [False, True])
    def test_matches_torch(self, mask_on):
        rng = np.random.RandomState(0)
        win, nh, c, b = 4, 2, 12, 8
        n = win * win
        x = rng.randn(b, n, c).astype(np.float32)

        mod = WindowAttention(dim=c, window_size=win, num_heads=nh)
        mask = None
        if mask_on:
            mask = rng.choice([0.0, -100.0], size=(4, n, n)).astype(np.float32)
        params = fast_init(mod.init, jax.random.key(0), jnp.asarray(x),
                          jnp.asarray(mask) if mask_on else None)["params"]

        wqkv = np.asarray(params["qkv"]["kernel"]).T      # [3C, C] torch layout
        bqkv = np.asarray(params["qkv"]["bias"])
        wproj = np.asarray(params["proj"]["kernel"]).T
        bproj = np.asarray(params["proj"]["bias"])
        table = np.asarray(params["relative_position_bias_table"])
        rpi = relative_position_index(win)

        want = torch_window_attention(x, wqkv, bqkv, wproj, bproj, table,
                                      rpi, nh, mask)
        got = np.asarray(mod.apply({"params": params}, jnp.asarray(x),
                                   jnp.asarray(mask) if mask_on else None))
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)
