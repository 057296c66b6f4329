"""Pallas window-attention kernel parity vs the XLA reference path.

Runs the kernel in interpret mode on CPU (ADSR_TPU_PALLAS_INTERPRET=1 is set
before importing the kernel module) — same code path the TPU compiles.
"""

import os

os.environ["ADSR_TPU_PALLAS_INTERPRET"] = "1"

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adsr_tpu.ops.window_attention import window_attention_xla
from adsr_tpu.ops.window_attention_pallas import window_attention_pallas


def make_inputs(b, nh, n, hd, nw=None, seed=0):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(b, nh, n, hd), jnp.float32) * 0.1
    k = jnp.asarray(rng.randn(b, nh, n, hd), jnp.float32) * 0.1
    v = jnp.asarray(rng.randn(b, nh, n, hd), jnp.float32)
    bias = jnp.asarray(rng.randn(nh, n, n), jnp.float32) * 0.05
    mask = None
    if nw:
        m = rng.choice([0.0, -100.0], size=(nw, n, n), p=[0.8, 0.2])
        mask = jnp.asarray(m, jnp.float32)
    return q, k, v, bias, mask


class TestPallasParity:
    @pytest.mark.parametrize("b,nh,n,hd", [
        (8, 2, 64, 16),    # grouped path (G=2)
        (4, 3, 16, 30),    # odd head dim, G capped by nw/b
        (2, 2, 128, 64),   # no grouping (N >= 128)
    ])
    def test_no_mask(self, b, nh, n, hd):
        q, k, v, bias, _ = make_inputs(b, nh, n, hd)
        want = window_attention_xla(q, k, v, bias, None)
        got = window_attention_pallas(q, k, v, bias, None)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=1e-4)

    def test_with_mask(self):
        b, nh, n, hd, nw = 8, 2, 64, 32, 4
        q, k, v, bias, mask = make_inputs(b, nh, n, hd, nw)
        want = window_attention_xla(q, k, v, bias, mask)
        got = window_attention_pallas(q, k, v, bias, mask)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=1e-4)

    def test_gradients_flow(self):
        b, nh, n, hd = 4, 2, 16, 16
        q, k, v, bias, _ = make_inputs(b, nh, n, hd)

        def loss_p(q, k, v, bias):
            return jnp.sum(window_attention_pallas(q, k, v, bias, None) ** 2)

        def loss_x(q, k, v, bias):
            return jnp.sum(window_attention_xla(q, k, v, bias, None) ** 2)

        gp = jax.grad(loss_p, argnums=(0, 1, 2, 3))(q, k, v, bias)
        gx = jax.grad(loss_x, argnums=(0, 1, 2, 3))(q, k, v, bias)
        for a, b_ in zip(gp, gx):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       atol=3e-5, rtol=1e-4)
