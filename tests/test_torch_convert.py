"""Torch-checkpoint converter: structure/shape round-trip vs our param trees.

Builds a synthetic torch-style state_dict (the reference's module names and
[O,I,kH,kW]/[O,I] layouts) from our own param template, converts it, and
checks the result matches the template tree exactly — validating every mapping
branch without needing real reference weights.
"""

import re

import numpy as np
import pytest

import jax

from adsr_tpu.core.config import DRCTModelConfig, DRNModelConfig
from adsr_tpu.io.torch_convert import convert_drct, convert_drn
from adsr_tpu.models.factory import init_sr_params


def flatten(tree):
    return {"/".join(str(getattr(k, "key", k)) for k in path): np.asarray(leaf)
            for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]}


def torchify(shape, kind):
    """Random array in torch layout for a flax param of the given shape."""
    rng = np.random.RandomState(hash(kind) % 2 ** 31)
    if kind == "conv":      # flax [kH,kW,I,O] -> torch [O,I,kH,kW]
        kh, kw, i, o = shape
        return rng.randn(o, i, kh, kw).astype(np.float32)
    if kind == "linear":    # flax [I,O] -> torch [O,I]
        i, o = shape
        return rng.randn(o, i).astype(np.float32)
    return rng.randn(*shape).astype(np.float32)


def drct_torch_key(path):
    """Inverse of the converter's DRCT mapping for a flax param path."""
    m = re.match(r"rdg_(\d+)/(.*)", path)
    if m:
        layer, rest = m.group(1), m.group(2)
        rest = rest.replace("/scale", ".weight").replace("/bias", ".bias")
        rest = rest.replace("/kernel", ".weight").replace("/", ".")
        return f"layers.{layer}.{rest}"
    table = {
        "conv_first": "conv_first", "conv_after_body": "conv_after_body",
        "conv_before_upsample": "conv_before_upsample.0",
        "conv_last": "conv_last", "norm": "norm",
        "patch_norm": "patch_embed.norm",
    }
    for ours, theirs in table.items():
        if path.startswith(ours + "/"):
            suffix = path.split("/")[-1]
            suffix = {"kernel": "weight", "scale": "weight"}.get(suffix, suffix)
            return f"{theirs}.{suffix}"
    m = re.match(r"upsample_conv(\d+)/(kernel|bias)", path)
    if m:
        return f"upsample.{int(m.group(1)) * 2}." + (
            "weight" if m.group(2) == "kernel" else "bias")
    raise KeyError(path)


class TestConvertDRCT:
    def _roundtrip(self, scan_layers):
        cfg = DRCTModelConfig(upscale=4, img_size=8, window_size=4, in_chans=1,
                              embed_dim=12, num_layers=2, num_heads=2, gc=4,
                              scan_layers=False)
        template, _ = init_sr_params(cfg, jax.random.key(0))
        flat = flatten(template)
        sd = {}
        for path, arr in flat.items():
            key = drct_torch_key(path)
            if arr.ndim == 4:
                kind = "conv"
            elif arr.ndim == 2 and path.endswith("kernel"):
                kind = "linear"
            else:
                kind = "other"
            sd[key] = torchify(arr.shape, kind)
        converted = convert_drct(sd)
        if scan_layers:
            from adsr_tpu.io.torch_convert import stack_scan_layers
            from adsr_tpu.core.config import DRCTModelConfig as C
            import dataclasses
            converted = stack_scan_layers(converted, 2)
            scan_cfg = dataclasses.replace(cfg, scan_layers=True)
            template, _ = init_sr_params(scan_cfg, jax.random.key(0))
            flat = flatten(template)
        got = flatten(converted)
        assert set(got) == set(flat)
        for k in flat:
            assert got[k].shape == flat[k].shape, k

    def test_structure_roundtrip(self):
        self._roundtrip(scan_layers=False)

    def test_structure_roundtrip_scan(self):
        self._roundtrip(scan_layers=True)

    def test_value_transposition(self):
        w = np.arange(24, dtype=np.float32).reshape(2, 3, 2, 2)  # O,I,kH,kW
        out = convert_drct({"conv_first.weight": w})
        got = out["conv_first"]["kernel"]
        assert got.shape == (2, 2, 3, 2)
        assert got[0, 1, 2, 1] == w[1, 2, 0, 1]


class TestConvertDRN:
    def test_structure_roundtrip(self, scan=False):
        cfg = DRNModelConfig(scale=(2, 4), n_blocks=2, n_feats=16, n_colors=1,
                             scan_blocks=False)
        template, _ = init_sr_params(cfg, jax.random.key(0))
        flat = flatten(template)
        sd = {}
        for path, arr in flat.items():
            key = self._torch_key(path, cfg.n_blocks)
            kind = "conv" if arr.ndim == 4 else "other"
            sd[key] = torchify(arr.shape, kind)
        converted = convert_drn(sd, phase=2, n_blocks=cfg.n_blocks)
        if scan:
            import dataclasses
            from adsr_tpu.io.torch_convert import stack_drn_rcabs
            converted = stack_drn_rcabs(converted, phase=2,
                                        n_blocks=cfg.n_blocks)
            template, _ = init_sr_params(
                dataclasses.replace(cfg, scan_blocks=True), jax.random.key(0))
            flat = flatten(template)
        got = flatten(converted)
        assert set(got) == set(flat)
        for k in flat:
            assert got[k].shape == flat[k].shape, k

    def test_structure_roundtrip_scan(self):
        self.test_structure_roundtrip(scan=True)

    @staticmethod
    def _torch_key(path, n_blocks):
        suffix = "weight" if path.endswith("kernel") else "bias"
        if path.startswith(("sub_mean", "add_mean")):
            return path.split("/")[0] + "." + suffix
        if path.startswith("head/"):
            return "head." + suffix
        if (m := re.match(r"down_(\d+)/down(\d+)/(kernel|bias)", path)):
            return f"down.{m.group(1)}.dual_module.{m.group(2)}.0.{suffix}"
        if (m := re.match(r"down_(\d+)/proj/(kernel|bias)", path)):
            return f"down.{m.group(1)}.dual_module.1.{suffix}"
        if (m := re.match(r"tail_(\d+)/(kernel|bias)", path)):
            return f"tail.{m.group(1)}.{suffix}"
        if (m := re.match(r"up(\d+)_rcab(\d+)/conv(\d)/(kernel|bias)", path)):
            body_idx = {0: 0, 1: 2}[int(m.group(3))]
            return (f"up_blocks.{m.group(1)}.{m.group(2)}.body."
                    f"{body_idx}.{suffix}")
        if (m := re.match(r"up(\d+)_rcab(\d+)/ca/du_(reduce|expand)/(kernel|bias)",
                          path)):
            du_idx = {"reduce": 0, "expand": 2}[m.group(3)]
            return (f"up_blocks.{m.group(1)}.{m.group(2)}.body.3.conv_du."
                    f"{du_idx}.{suffix}")
        if (m := re.match(r"up(\d+)_upsampler/conv(\d+)/(kernel|bias)", path)):
            return (f"up_blocks.{m.group(1)}.{n_blocks}."
                    f"{int(m.group(2)) * 2}.{suffix}")
        if (m := re.match(r"up(\d+)_proj/(kernel|bias)", path)):
            return f"up_blocks.{m.group(1)}.{n_blocks + 1}.{suffix}"
        raise KeyError(path)


# --------------------------------------------------------------------------- #
# Numeric parity against the REAL reference torch models
# --------------------------------------------------------------------------- #

def _import_reference():
    """Import the reference torch models (reference src/drct.py:716-898,
    src/drn.py:160-270); skip when the reference tree is unavailable."""
    from reference_compat import import_reference
    try:
        TorchDRCT = import_reference("drct").DRCT
        TorchDRN = import_reference("drn").DRN
    except Exception as e:  # pragma: no cover - environment-dependent
        pytest.skip(f"reference import unavailable: {e}")
    return TorchDRCT, TorchDRN


class TestNumericParityVsReference:
    """Convert state_dicts of randomly-initialised REFERENCE torch models and
    assert our Flax forward reproduces the torch forward (VERDICT #5)."""

    def _drct_pair(self, embed_dim, num_layers, num_heads, gc, img_size,
                   window, in_chans, upscale, mlp_ratio=2.0):
        import types
        import torch
        TorchDRCT, _ = _import_reference()
        opt = types.SimpleNamespace(
            img_size=img_size, n_colors=in_chans, embed_dim=embed_dim,
            depths=(6,) * num_layers, num_heads=(num_heads,) * num_layers,
            window_size=window, compress_ratio=3, squeeze_factor=30,
            conv_scale=0.01, overlap_ratio=0.5, mlp_ratio=mlp_ratio,
            upscale=upscale, img_range=1.0, upsampler="pixelshuffle",
            resi_connection="1conv")
        torch.manual_seed(0)
        tm = TorchDRCT(opt, gc=gc)
        tm.eval()
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

        from adsr_tpu.io.torch_convert import stack_scan_layers
        params = stack_scan_layers(convert_drct(sd), num_layers)
        cfg = DRCTModelConfig(upscale=upscale, img_size=img_size,
                              window_size=window, in_chans=in_chans,
                              embed_dim=embed_dim, num_layers=num_layers,
                              num_heads=num_heads, gc=gc,
                              mlp_ratio=mlp_ratio, scan_layers=True)
        return tm, params, cfg

    def _assert_drct_close(self, tm, params, cfg, atol):
        import torch
        from adsr_tpu.models.drct import DRCT as FlaxDRCT
        rng = np.random.RandomState(1)
        x = rng.rand(2, cfg.img_size, cfg.img_size, cfg.in_chans) \
            .astype(np.float32)
        with torch.no_grad():
            want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        got = np.asarray(FlaxDRCT(cfg).apply(
            {"params": jax.tree_util.tree_map(np.asarray, params)},
            x)).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, want, atol=atol, rtol=1e-4)

    def test_drct_forward_parity_tiny(self):
        tm, params, cfg = self._drct_pair(
            embed_dim=12, num_layers=2, num_heads=2, gc=4, img_size=8,
            window=4, in_chans=1, upscale=2)
        self._assert_drct_close(tm, params, cfg, atol=1e-5)

    def test_drct_forward_parity_heads_fixup(self):
        # embed 18, gc 6 -> per-block head fix-up (src/drct.py:337-367)
        tm, params, cfg = self._drct_pair(
            embed_dim=18, num_layers=2, num_heads=2, gc=6, img_size=16,
            window=4, in_chans=3, upscale=4)
        self._assert_drct_close(tm, params, cfg, atol=1e-5)

    @pytest.mark.slow
    def test_drct_forward_parity_fullsize(self):
        # the real serving config: embed 180, 12 RDGs, window 8, LR 32
        tm, params, cfg = self._drct_pair(
            embed_dim=180, num_layers=12, num_heads=6, gc=32, img_size=32,
            window=8, in_chans=1, upscale=4)
        self._assert_drct_close(tm, params, cfg, atol=5e-4)

    def test_drct_forward_parity_x8(self):
        # x8: three chained 2x PixelShuffle stages (the BASELINE.md
        # best-DRCT rows are x8 — grid 512/x8, carpet 256/x8;
        # /root/reference/src/main.py:144-205 wires scale 8)
        tm, params, cfg = self._drct_pair(
            embed_dim=12, num_layers=2, num_heads=2, gc=4, img_size=8,
            window=4, in_chans=1, upscale=8)
        self._assert_drct_close(tm, params, cfg, atol=1e-5)

    def _drn_pair(self, scale, n_blocks, n_feats, n_colors):
        import types
        import torch
        _, TorchDRN = _import_reference()
        opt = types.SimpleNamespace(scale=list(scale), n_blocks=n_blocks,
                                    n_feats=n_feats, n_colors=n_colors,
                                    negval=0.2, rgb_range=255.0)
        torch.manual_seed(0)
        tm = TorchDRN(opt)
        tm.eval()
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

        from adsr_tpu.io.torch_convert import stack_drn_rcabs
        params = stack_drn_rcabs(
            convert_drn(sd, phase=len(scale), n_blocks=n_blocks),
            phase=len(scale), n_blocks=n_blocks)
        cfg = DRNModelConfig(scale=tuple(scale), n_blocks=n_blocks,
                             n_feats=n_feats, n_colors=n_colors,
                             scan_blocks=True)
        return tm, params, cfg

    def _assert_drn_close(self, tm, params, cfg, atol):
        import torch
        from adsr_tpu.models.factory import make_model
        lr_size = 16 // cfg.max_scale * 2
        rng = np.random.RandomState(2)
        x = (rng.rand(2, lr_size, lr_size, cfg.n_colors) * 255) \
            .astype(np.float32)
        with torch.no_grad():
            want = [t.numpy()
                    for t in tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))]
        got = make_model(cfg).apply(
            {"params": jax.tree_util.tree_map(np.asarray, params)}, x)
        assert len(got) == len(want)
        for g, t in zip(got, want):
            np.testing.assert_allclose(
                np.asarray(g).transpose(0, 3, 1, 2), t, atol=atol, rtol=1e-4)

    def test_drn_forward_parity_tiny(self):
        # n_feats >= 16 so CALayer's channels//16 squeeze stays non-empty
        tm, params, cfg = self._drn_pair(scale=(2,), n_blocks=2, n_feats=16,
                                         n_colors=1)
        self._assert_drn_close(tm, params, cfg, atol=1e-4)

    def test_drn_forward_parity_x4_rgb(self):
        tm, params, cfg = self._drn_pair(scale=(2, 4), n_blocks=3, n_feats=16,
                                         n_colors=3)
        self._assert_drn_close(tm, params, cfg, atol=1e-4)

    @pytest.mark.slow
    def test_drn_forward_parity_fullsize(self):
        # DRN-L x4: 40 blocks, 20 feats (reference main.py:172-182)
        tm, params, cfg = self._drn_pair(scale=(2, 4), n_blocks=40,
                                         n_feats=20, n_colors=1)
        self._assert_drn_close(tm, params, cfg, atol=5e-4)
