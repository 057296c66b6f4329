"""Fused DRCT serving forward parity vs the flax model (interpret mode)."""

import os

os.environ["ADSR_TPU_PALLAS_INTERPRET"] = "1"

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adsr_tpu.core.config import DRCTModelConfig
from adsr_tpu.models.drct import DRCT
from adsr_tpu.ops.fused_drct import fused_drct_forward
from adsr_tpu.models.factory import fast_init


@pytest.mark.slow
@pytest.mark.parametrize("upscale", [2, 8])
def test_matches_flax_model(upscale):
    # upscale=8 exercises the three-stage PixelShuffle tail through the
    # fused serving path (BASELINE.md's best-DRCT rows are x8)
    cfg = DRCTModelConfig(upscale=upscale, img_size=8, window_size=4,
                          in_chans=1, embed_dim=12, num_layers=2,
                          num_heads=2, gc=4, scan_layers=True)
    model = DRCT(cfg)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 8, 8, 1) * 255, jnp.float32)
    params = fast_init(model.init, jax.random.key(0), x)["params"]
    want = np.asarray(model.apply({"params": params}, x))
    got = np.asarray(fused_drct_forward(params, cfg, x, dtype=jnp.float32))
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)
