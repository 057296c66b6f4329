"""Overlapped-tile serving: seam-free blending + DRCT integration."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adsr_tpu.eval.tiled import feather_mask, tile_starts, tiled_sr_forward
from adsr_tpu.models.factory import fast_init


class TestPlan:
    def test_exact_cover(self):
        assert tile_starts(16, 16, 4) == [0]
        assert tile_starts(8, 16, 4) == [0]
        starts = tile_starts(64, 32, 8)
        assert starts[0] == 0 and starts[-1] == 64 - 32
        for a, b in zip(starts, starts[1:]):
            assert b - a <= 32 - 8  # at least `overlap` shared pixels

    def test_feather_unit_interior(self):
        m = feather_mask(32, 8)
        assert m.shape == (32, 32, 1)
        assert m[16, 16, 0] == 1.0
        assert m[0, 16, 0] < 0.2


class TestSeamFree:
    def test_resize_forward_matches_full(self):
        """With a (nearly) local SR op, tiled == full up to feathered
        boundary effects; assert > 40 dB agreement."""
        scale = 2
        rng = np.random.RandomState(0)
        lr = jnp.asarray(rng.rand(2, 48, 48, 3), jnp.float32)

        def fwd(t):
            return jax.image.resize(
                t, (t.shape[0], t.shape[1] * scale, t.shape[2] * scale,
                    t.shape[3]), "bicubic")

        full = np.asarray(fwd(lr))
        tiled = np.asarray(tiled_sr_forward(fwd, lr, tile=16, overlap=8,
                                            scale=scale))
        assert tiled.shape == full.shape
        mse = float(np.mean((tiled - full) ** 2))
        psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
        assert psnr > 40.0, psnr

    def test_single_tile_passthrough(self):
        lr = jnp.ones((1, 8, 8, 1))
        out = tiled_sr_forward(lambda t: t * 2.0, lr, tile=8, overlap=2,
                               scale=1)
        np.testing.assert_allclose(np.asarray(out), 2.0)

    def test_weights_normalise_constant(self):
        # constant image through identity forward stays exactly constant
        # across seams (weight normalisation correctness)
        lr = jnp.full((1, 40, 40, 1), 0.37)
        out = tiled_sr_forward(lambda t: t, lr, tile=16, overlap=8, scale=1)
        np.testing.assert_allclose(np.asarray(out), 0.37, atol=1e-6)


class TestDRCTTiled:
    def test_big_input_through_small_graph(self):
        from adsr_tpu.core.config import (DataConfig, DRCTModelConfig,
                                          Experiment)
        from adsr_tpu.models.drct import DRCT
        from adsr_tpu.train.trainer import make_tiled_serving_forward

        cfg = DRCTModelConfig(upscale=2, img_size=8, window_size=4,
                              in_chans=1, embed_dim=12, num_layers=2,
                              num_heads=2, gc=4, scan_layers=True)
        model = DRCT(cfg)
        lr8 = jnp.zeros((1, 8, 8, 1))
        params = fast_init(model.init, jax.random.key(0), lr8)["params"]
        exp = Experiment(model=cfg,
                         data=DataConfig(scale=(2,), n_colors=1,
                                         rgb_range=255.0))
        fwd = make_tiled_serving_forward(exp, params, tile=8, overlap=4)
        lr = jnp.asarray(np.random.RandomState(1).rand(2, 16, 16, 1) * 255,
                         jnp.float32)
        sr = np.asarray(fwd(lr))
        assert sr.shape == (2, 32, 32, 1)
        assert np.all(np.isfinite(sr))

    def test_tile_not_divisible_by_window_rejected(self):
        from adsr_tpu.core.config import (DataConfig, DRCTModelConfig,
                                          Experiment)
        from adsr_tpu.train.trainer import make_tiled_serving_forward

        cfg = DRCTModelConfig(upscale=2, img_size=8, window_size=4,
                              in_chans=1, embed_dim=12, num_layers=1,
                              num_heads=2, gc=4, scan_layers=True)
        exp = Experiment(model=cfg,
                         data=DataConfig(scale=(2,), n_colors=1,
                                         rgb_range=255.0))
        with pytest.raises(ValueError, match="window_size"):
            make_tiled_serving_forward(exp, {}, tile=10, overlap=4)


class TestDRNTiled:
    def test_big_input_through_small_graph(self):
        # DRN is a local CNN: the tiled path serves a 2x-train-size LR input
        # through the train-crop-compiled graph (VERDICT round-2 weak #6)
        from adsr_tpu.core.config import (DataConfig, DRNModelConfig,
                                          Experiment)
        from adsr_tpu.models.factory import init_sr_params
        from adsr_tpu.train.trainer import make_tiled_serving_forward

        cfg = DRNModelConfig(scale=(2,), n_blocks=2, n_feats=4, n_colors=1)
        exp = Experiment(model=cfg,
                         data=DataConfig(scale=(2,), n_colors=1,
                                         rgb_range=255.0, patch_size=16))
        params, _ = init_sr_params(cfg, jax.random.key(0))
        fwd = make_tiled_serving_forward(exp, params, tile=8, overlap=4)
        lr = jnp.asarray(np.random.RandomState(1).rand(2, 16, 16, 1) * 255,
                         jnp.float32)
        sr = np.asarray(fwd(lr))
        assert sr.shape == (2, 32, 32, 1)
        assert np.all(np.isfinite(sr))
