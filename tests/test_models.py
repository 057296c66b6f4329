"""Shape/structure tests for the Flax models against reference architecture facts."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adsr_tpu.core.config import DRCTModelConfig, DRNModelConfig, progressive_scales
from adsr_tpu.models.common import pixel_shuffle, upsample_bicubic
from adsr_tpu.models.drct import DRCT, relative_position_index, shift_attn_mask
from adsr_tpu.models.drn import DRN, DownBlock
from adsr_tpu.models.efficientad import PDN, Autoencoder
from adsr_tpu.models.factory import fast_init


def n_params(tree):
    return sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(tree))


class TestCommon:
    def test_pixel_shuffle_matches_torch(self):
        import torch
        x = np.random.RandomState(0).rand(2, 3, 4, 12).astype(np.float32)
        got = np.asarray(pixel_shuffle(jnp.asarray(x), 2))
        want = torch.pixel_shuffle(
            torch.from_numpy(x).permute(0, 3, 1, 2), 2
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_bicubic_matches_torch(self):
        import torch
        import torch.nn.functional as F
        x = np.random.RandomState(1).rand(1, 8, 8, 1).astype(np.float32)
        got = np.asarray(upsample_bicubic(jnp.asarray(x), 4))
        want = F.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2), scale_factor=4,
            mode="bicubic", align_corners=False
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_progressive_scales(self):
        assert progressive_scales(4) == (2, 4)
        assert progressive_scales(8) == (2, 4, 8)
        assert progressive_scales(2) == (2,)


class TestDRN:
    @pytest.mark.parametrize("scale", [2, 4])
    def test_multiscale_outputs(self, scale):
        cfg = DRNModelConfig(scale=progressive_scales(scale), n_blocks=1,
                             n_feats=4, n_colors=1)
        model = DRN(cfg)
        lr = jnp.zeros((2, 8, 8, 1))
        params = fast_init(model.init, jax.random.key(0), lr)
        outs = model.apply(params, lr)
        phase = len(cfg.scale)
        assert len(outs) == phase + 1
        hr_size = 8 * scale
        # lowest resolution first: H/2^phase ... H (drn.py:255-270)
        for i, o in enumerate(outs):
            s = hr_size // 2 ** (phase - i)
            assert o.shape == (2, s, s, 1)

    def test_dual_downblock(self):
        blk = DownBlock(scale=2, n_feat=4, in_channels=1, out_channels=1)
        x = jnp.zeros((2, 16, 16, 1))
        params = fast_init(blk.init, jax.random.key(0), x)
        assert blk.apply(params, x).shape == (2, 8, 8, 1)


class TestDRCT:
    def test_forward_shape(self):
        cfg = DRCTModelConfig(upscale=4, img_size=16, window_size=4,
                              in_chans=1, embed_dim=12, num_layers=2,
                              num_heads=2, gc=4)
        model = DRCT(cfg)
        lr = jnp.zeros((1, 16, 16, 1))
        params = fast_init(model.init, jax.random.key(0), lr)
        out = model.apply(params, lr)
        assert out.shape == (1, 64, 64, 1)

    def test_head_fixup_arithmetic(self):
        # embed 180, gc 32, heads 6 -> dims 180/212/244/276/308, heads 6/4/2/6/4
        d, gc, nh = 180, 32, 6
        dims = [d + k * gc for k in range(5)]
        heads = [nh] + [nh - ((d + k * gc) % nh) for k in range(1, 5)]
        assert dims == [180, 212, 244, 276, 308]
        assert heads == [6, 4, 2, 6, 4]
        for dim, h in zip(dims, heads):
            assert dim % h == 0

    def test_relative_position_index(self):
        idx = relative_position_index(3)
        assert idx.shape == (9, 9)
        assert idx.max() == 24 and idx.min() == 0
        assert idx[0, 0] == idx[4, 4]  # zero displacement maps to same entry

    def test_shift_mask(self):
        m = shift_attn_mask(8, 8, 4, 2)
        assert m.shape == (4, 16, 16)
        assert set(np.unique(m)) <= {0.0, -100.0}
        # the top-left window is contiguous: no masking
        assert np.all(m[0] == 0)

    @pytest.mark.slow
    def test_reference_param_count(self):
        """Full-size DRCT (grid x4@128) parameter count ~ the reference's 27.6M."""
        cfg = DRCTModelConfig(upscale=4, img_size=32, window_size=8,
                              in_chans=1, embed_dim=180, num_layers=12,
                              num_heads=6, gc=32)
        model = DRCT(cfg)
        params = fast_init(model.init, jax.random.key(0), jnp.zeros((1, 32, 32, 1)))
        n = n_params(params)
        assert 25e6 < n < 31e6, n


class TestEfficientAD:
    def test_pdn_small_output(self):
        m = PDN(out_channels=384, size="small")
        x = jnp.zeros((1, 256, 256, 3))
        params = fast_init(m.init, jax.random.key(0), x)
        out = m.apply(params, x)
        # 256 -> (k4) 253 -> pool 126 -> (k4) 123 -> pool 61 -> (k3) 59 -> (k4) 56
        assert out.shape == (1, 56, 56, 384)

    def test_pdn_medium_output(self):
        m = PDN(out_channels=384, size="medium")
        x = jnp.zeros((1, 256, 256, 3))
        params = fast_init(m.init, jax.random.key(0), x)
        assert m.apply(params, x).shape == (1, 56, 56, 384)

    def test_autoencoder_output(self):
        m = Autoencoder(out_channels=384)
        x = jnp.zeros((1, 256, 256, 3))
        params = fast_init(m.init, jax.random.key(0), x)
        assert m.apply(params, x).shape == (1, 56, 56, 384)


class TestDRCTScanLayers:
    @pytest.mark.slow
    def test_scan_equals_loop(self):
        """nn.scan-stacked RDGs compute the same function as the unrolled loop
        when fed the same (stacked) parameters."""
        import dataclasses
        import jax.tree_util as jtu
        cfg = DRCTModelConfig(upscale=2, img_size=8, window_size=4, in_chans=1,
                              embed_dim=12, num_layers=3, num_heads=2, gc=4,
                              scan_layers=False)
        x = jnp.asarray(np.random.RandomState(0).rand(2, 8, 8, 1) * 255,
                        jnp.float32)
        m_loop = DRCT(cfg)
        p_loop = fast_init(m_loop.init, jax.random.key(0), x)["params"]
        rdgs = [p_loop[f"rdg_{i}"] for i in range(3)]
        stacked = jtu.tree_map(lambda *xs: jnp.stack(xs), *rdgs)
        p_scan = {k: v for k, v in p_loop.items() if not k.startswith("rdg_")}
        p_scan["rdgs"] = {"rdg": stacked}
        m_scan = DRCT(dataclasses.replace(cfg, scan_layers=True))
        o_loop = m_loop.apply({"params": p_loop}, x)
        o_scan = m_scan.apply({"params": p_scan}, x)
        np.testing.assert_allclose(np.asarray(o_loop), np.asarray(o_scan),
                                   atol=1e-4)

    @pytest.mark.slow
    def test_remat_policy_dots_same_grads(self):
        """remat_policy='dots' (save matmul outputs, recompute elementwise)
        computes the same value and gradients as full remat."""
        import dataclasses
        cfg = DRCTModelConfig(upscale=2, img_size=8, window_size=4, in_chans=1,
                              embed_dim=12, num_layers=2, num_heads=2, gc=4,
                              scan_layers=True, remat=True)
        x = jnp.asarray(np.random.RandomState(1).rand(2, 8, 8, 1) * 255,
                        jnp.float32)
        m_full = DRCT(cfg)
        p = fast_init(m_full.init, jax.random.key(0), x)["params"]
        m_dots = DRCT(dataclasses.replace(cfg, remat_policy="dots"))

        def loss(m):
            return lambda p: jnp.mean(m.apply({"params": p}, x) ** 2)

        v_full, g_full = jax.value_and_grad(loss(m_full))(p)
        v_dots, g_dots = jax.value_and_grad(loss(m_dots))(p)
        np.testing.assert_allclose(float(v_full), float(v_dots), rtol=1e-6)
        flat_f = jax.tree_util.tree_leaves(g_full)
        flat_d = jax.tree_util.tree_leaves(g_dots)
        for a, b in zip(flat_f, flat_d):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5, rtol=1e-4)

    def test_scan_trains(self):
        """drop_path rates flow through scan during training (rngs needed)."""
        cfg = DRCTModelConfig(upscale=2, img_size=8, window_size=4, in_chans=1,
                              embed_dim=12, num_layers=2, num_heads=2, gc=4,
                              scan_layers=True)
        m = DRCT(cfg)
        x = jnp.zeros((2, 8, 8, 1))
        p = fast_init(m.init, jax.random.key(0), x)["params"]
        out = m.apply({"params": p}, x, deterministic=False,
                      rngs={"dropout": jax.random.key(1)})
        assert out.shape == (2, 16, 16, 1)


class TestDRNScanBlocks:
    def test_scan_equals_loop(self):
        import dataclasses
        import jax.tree_util as jtu
        cfg = DRNModelConfig(scale=(2, 4), n_blocks=3, n_feats=8, n_colors=1,
                             scan_blocks=False)
        x = jnp.asarray(np.random.RandomState(0).rand(2, 4, 4, 1) * 255,
                        jnp.float32)
        m_loop = DRN(cfg)
        p_loop = fast_init(m_loop.init, jax.random.key(0), x)["params"]
        p_scan = dict(p_loop)
        for i in range(2):
            blocks = [p_scan.pop(f"up{i}_rcab{j}") for j in range(3)]
            p_scan[f"up{i}_rcabs"] = {
                "rcab": jtu.tree_map(lambda *xs: jnp.stack(xs), *blocks)}
        m_scan = DRN(dataclasses.replace(cfg, scan_blocks=True))
        o_loop = m_loop.apply({"params": p_loop}, x)
        o_scan = m_scan.apply({"params": p_scan}, x)
        for a, b in zip(o_loop, o_scan):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4)
