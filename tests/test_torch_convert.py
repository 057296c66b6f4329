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
