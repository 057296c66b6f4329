"""Multi-class serving graph tests."""

import numpy as np

import jax

from adsr_tpu.core.config import (DataConfig, DRCTModelConfig, DRNModelConfig,
                                  Experiment, OptimConfig)
from adsr_tpu.eval.serving import AnomalyServer
from adsr_tpu.models.factory import init_sr_params


def make_exp(model, scales, n_colors):
    data = DataConfig(resolution=16, patch_size=16, scale=scales,
                      n_colors=n_colors, batch_size=2, test_every=1)
    return Experiment(model=model, data=data, optim=OptimConfig(),
                      save="/tmp/t", precision="fp32")


class TestAnomalyServer:
    def test_two_classes_and_tail_padding(self):
        rng = np.random.RandomState(0)
        server = AnomalyServer(batch_size=4, ssim_window=5)

        grid = DRCTModelConfig(upscale=2, img_size=8, window_size=4,
                               in_chans=1, embed_dim=8, num_layers=1,
                               num_heads=2, gc=4)
        exp_g = make_exp(grid, (2,), 1)
        p_g, _ = init_sr_params(grid, jax.random.key(0))
        server.register("grid", exp_g, p_g)

        carpet = DRNModelConfig(scale=(2,), n_blocks=1, n_feats=8, n_colors=3)
        exp_c = make_exp(carpet, (2,), 3)
        p_c, _ = init_sr_params(carpet, jax.random.key(1))
        server.register("carpet", exp_c, p_c)

        assert set(server.classes()) == {"grid", "carpet"}

        # grid: gray pipeline from RGB uint8 inputs; 5 images -> tail pad
        lr = rng.randint(0, 256, (5, 8, 8, 3), np.uint8)
        hr = rng.randint(0, 256, (5, 16, 16, 3), np.uint8)
        scores = server.score("grid", lr, hr)
        assert scores.shape == (5, 3)
        assert np.all(np.isfinite(scores))
        # SSIM in [-1, 1] -> 1-SSIM in [0, 2]
        assert np.all(scores[:, 0] >= 0) and np.all(scores[:, 0] <= 2)

        # carpet: RGB DRN (multi-scale list output path)
        lr = rng.randint(0, 256, (3, 8, 8, 3), np.uint8)
        hr = rng.randint(0, 256, (3, 16, 16, 3), np.uint8)
        scores = server.score("carpet", lr, hr)
        assert scores.shape == (3, 3)
        assert np.all(np.isfinite(scores))

    def test_identical_images_score_zero(self):
        server = AnomalyServer(batch_size=2, ssim_window=5)
        grid = DRCTModelConfig(upscale=2, img_size=8, window_size=4,
                               in_chans=1, embed_dim=8, num_layers=1,
                               num_heads=2, gc=4)
        exp = make_exp(grid, (2,), 1)
        p, _ = init_sr_params(grid, jax.random.key(0))
        server.register("grid", exp, p)
        rng = np.random.RandomState(1)
        lr = rng.randint(0, 256, (2, 8, 8, 1), np.uint8)
        hr = rng.randint(0, 256, (2, 16, 16, 1), np.uint8)
        s1 = server.score("grid", lr, hr)
        s2 = server.score("grid", lr, hr)
        np.testing.assert_array_equal(s1, s2)  # deterministic serving
