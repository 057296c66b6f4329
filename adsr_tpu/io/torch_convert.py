"""Convert reference PyTorch checkpoints into this framework's params.

The reference ships pretrained weights (DRNL{s}x.pt, net_g_latest.pth —
reference src/main.py:455-468) that its `--pretrain` rows depend on. This
module maps a torch ``state_dict`` into the Flax param trees of
``adsr_tpu.models.drn.DRN`` / ``adsr_tpu.models.drct.DRCT``:

- conv weights [O, I, kH, kW]  -> kernels [kH, kW, I, O]
- linear weights [O, I]        -> kernels [I, O]
- MeanShift conv + bias        -> sub_mean/add_mean shift conv
- torch module paths           -> flax module names (tables below)

Use: ``python -m adsr_tpu.cli.convert --model-type drct --torch-ckpt x.pth
--out x.msgpack``. Shape mismatches raise with the offending key.
"""

from __future__ import annotations

import re
from typing import Any, Dict

import numpy as np


def _conv_w(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _linear_w(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def _set(tree: Dict[str, Any], path: str, value: np.ndarray) -> None:
    keys = path.split("/")
    node = tree
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = value


def convert_drct(state_dict: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Map a reference-DRCT state_dict (src/drct.py:716-849 module names)."""
    out: Dict[str, Any] = {}
    for key, val in state_dict.items():
        v = np.asarray(val)
        m = re.match(r"layers\.(\d+)\.(.*)", key)
        if key.startswith("conv_first"):
            _set(out, f"conv_first/{_pk(key)}", _cv(key, v))
        elif key.startswith("conv_after_body"):
            _set(out, f"conv_after_body/{_pk(key)}", _cv(key, v))
        elif key.startswith("conv_before_upsample.0"):
            _set(out, f"conv_before_upsample/{_pk(key)}", _cv(key, v))
        elif key.startswith("conv_last"):
            _set(out, f"conv_last/{_pk(key)}", _cv(key, v))
        elif key.startswith("upsample."):
            # Upsample Sequential: conv indices 0, 2, ... per 2x stage
            idx = int(key.split(".")[1])
            _set(out, f"upsample_conv{idx // 2}/{_pk(key)}", _cv(key, v))
        elif key == "norm.weight":
            _set(out, "norm/scale", v)
        elif key == "norm.bias":
            _set(out, "norm/bias", v)
        elif key == "patch_embed.norm.weight":
            _set(out, "patch_norm/scale", v)
        elif key == "patch_embed.norm.bias":
            _set(out, "patch_norm/bias", v)
        elif m:
            layer, rest = int(m.group(1)), m.group(2)
            _set_drct_rdg(out, f"rdg_{layer}", rest, key, v)
        elif key in ("mean", "absolute_pos_embed", "relative_position_index",
                     "attn_mask") or key.endswith(
                         ("relative_position_index", "attn_mask")):
            continue  # constants, rebuilt statically
        else:
            raise KeyError(f"unmapped DRCT key: {key}")
    return out


def _set_drct_rdg(out, prefix: str, rest: str, key: str, v: np.ndarray):
    m = re.match(r"swin(\d)\.(.*)", rest)
    if m:
        swin, sub = m.group(1), m.group(2)
        base = f"{prefix}/swin{swin}"
        table = {
            "norm1.weight": ("norm1/scale", None),
            "norm1.bias": ("norm1/bias", None),
            "norm2.weight": ("norm2/scale", None),
            "norm2.bias": ("norm2/bias", None),
            "attn.relative_position_bias_table":
                ("attn/relative_position_bias_table", None),
            "attn.qkv.weight": ("attn/qkv/kernel", _linear_w),
            "attn.qkv.bias": ("attn/qkv/bias", None),
            "attn.proj.weight": ("attn/proj/kernel", _linear_w),
            "attn.proj.bias": ("attn/proj/bias", None),
            "mlp.fc1.weight": ("mlp/fc1/kernel", _linear_w),
            "mlp.fc1.bias": ("mlp/fc1/bias", None),
            "mlp.fc2.weight": ("mlp/fc2/kernel", _linear_w),
            "mlp.fc2.bias": ("mlp/fc2/bias", None),
        }
        if sub in ("attn.relative_position_index", "attn_mask"):
            return
        if sub not in table:
            raise KeyError(f"unmapped swin key: {key}")
        dst, fn = table[sub]
        _set(out, f"{base}/{dst}", fn(v) if fn else v)
        return
    m = re.match(r"adjust(\d)\.(weight|bias)", rest)
    if m:
        idx, kind = m.group(1), m.group(2)
        _set(out, f"{prefix}/adjust{idx}/" +
             ("kernel" if kind == "weight" else "bias"),
             _conv_w(v) if kind == "weight" else v)
        return
    if rest.startswith(("pe.", "pue.")):
        return  # patch (un)embed has no params with patch_norm=None
    raise KeyError(f"unmapped RDG key: {key}")


def convert_drn(state_dict: Dict[str, np.ndarray],
                phase: int, n_blocks: int) -> Dict[str, Any]:
    """Map a reference-DRN state_dict (src/drn.py:160-237 module names)."""
    out: Dict[str, Any] = {}
    for key, val in state_dict.items():
        v = np.asarray(val)
        if key.startswith(("sub_mean", "add_mean")):
            which = key.split(".")[0]
            _set(out, f"{which}/shift/" + _pk(key), _cv(key, v))
        elif key.startswith("head."):
            _set(out, f"head/{_pk(key)}", _cv(key, v))
        elif (m := re.match(r"down\.(\d+)\.dual_module\.(\d+)(?:\.0)?\.(weight|bias)", key)):
            p, seq, kind = int(m.group(1)), int(m.group(2)), m.group(3)
            # sequential: 0..log2-1 are (conv,lrelu) pairs, last is proj conv
            name = "proj" if _is_last_dual(state_dict, key) else f"down{seq}"
            _set(out, f"down_{p}/{name}/" +
                 ("kernel" if kind == "weight" else "bias"),
                 _conv_w(v) if kind == "weight" else v)
        elif (m := re.match(r"up_blocks\.(\d+)\.(\d+)\.(.*)", key)):
            _set_drn_up(out, int(m.group(1)), int(m.group(2)), m.group(3),
                        key, v, n_blocks)
        elif (m := re.match(r"tail\.(\d+)\.(weight|bias)", key)):
            idx, kind = int(m.group(1)), m.group(2)
            _set(out, f"tail_{idx}/" +
                 ("kernel" if kind == "weight" else "bias"),
                 _conv_w(v) if kind == "weight" else v)
        elif key.startswith("upsample"):
            continue  # parameter-free bicubic
        else:
            raise KeyError(f"unmapped DRN key: {key}")
    return out


def _is_last_dual(state_dict, key: str) -> bool:
    """True if this dual_module index is the final projection conv."""
    prefix = key.rsplit(".", 2)[0] if key.count(".") >= 2 else key
    m = re.match(r"(down\.\d+\.dual_module)\.(\d+)", key)
    assert m
    base, idx = m.group(1), int(m.group(2))
    indices = {int(re.match(rf"{re.escape(base)}\.(\d+)", k).group(1))
               for k in state_dict if k.startswith(base + ".")}
    return idx == max(indices)


def _set_drn_up(out, blk: int, seq: int, rest: str, key: str, v: np.ndarray,
                n_blocks: int):
    kind = "kernel" if rest.endswith("weight") or key.endswith("weight") \
        else "bias"
    w = _conv_w(v) if v.ndim == 4 else v
    if seq < n_blocks:
        # RCAB: body.{0,2} convs, body.3 CALayer conv_du.{0,2}
        m = re.match(r"body\.(\d+)\.(weight|bias)", rest)
        if m:
            conv_idx = {0: "conv0", 2: "conv1"}[int(m.group(1))]
            _set(out, f"up{blk}_rcab{seq}/{conv_idx}/{kind}", w)
            return
        m = re.match(r"body\.3\.conv_du\.(\d+)\.(weight|bias)", rest)
        if m:
            du = {0: "du_reduce", 2: "du_expand"}[int(m.group(1))]
            _set(out, f"up{blk}_rcab{seq}/ca/{du}/{kind}", w)
            return
        raise KeyError(f"unmapped RCAB key: {key}")
    if seq == n_blocks:
        # Upsampler: sequential convs at even indices
        m = re.match(r"(\d+)\.(weight|bias)", rest)
        if m:
            _set(out, f"up{blk}_upsampler/conv{int(m.group(1)) // 2}/{kind}", w)
            return
        raise KeyError(f"unmapped Upsampler key: {key}")
    # final 1x1 projection conv
    _set(out, f"up{blk}_proj/{kind}", w)


def convert_pdn(state_dict: Dict[str, np.ndarray],
                size: str = "small") -> Dict[str, Any]:
    """Map a reference PDN teacher/student state_dict to our ``PDN`` params.

    The reference PDNs are plain nn.Sequential stacks
    (src/efficientAD.py:90-127): parameterised convs sit at indices
    0/3/6/8 (small) or 0/3/6/8/10/12 (medium); ReLU/AvgPool layers carry no
    params. Our flax ``PDN`` names them conv0..convN in order.
    """
    conv_at = {"small": (0, 3, 6, 8),
               "medium": (0, 3, 6, 8, 10, 12)}[size]
    index = {seq: f"conv{i}" for i, seq in enumerate(conv_at)}
    out: Dict[str, Any] = {}
    for key, val in state_dict.items():
        v = np.asarray(val)
        m = re.match(r"(\d+)\.(weight|bias)", key)
        if not m or int(m.group(1)) not in index:
            raise KeyError(f"unmapped PDN key: {key}")
        name = index[int(m.group(1))]
        if m.group(2) == "weight":
            _set(out, f"{name}/kernel", _conv_w(v))
        else:
            _set(out, f"{name}/bias", v)
    return out


def convert_autoencoder(state_dict: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Map the reference EfficientAD autoencoder state_dict to our
    ``Autoencoder`` params (src/efficientAD.py:32-88: parameterised convs at
    Sequential indices 0/2/4/6/8 (enc0-4), 10 (enc5), 12/16/20/24/28/32
    (dec0-5 between bilinear Upsamples), 36 (dec6), 38 (dec7))."""
    index = {0: "enc0", 2: "enc1", 4: "enc2", 6: "enc3", 8: "enc4",
             10: "enc5", 12: "dec0", 16: "dec1", 20: "dec2", 24: "dec3",
             28: "dec4", 32: "dec5", 36: "dec6", 38: "dec7"}
    out: Dict[str, Any] = {}
    for key, val in state_dict.items():
        v = np.asarray(val)
        m = re.match(r"(\d+)\.(weight|bias)", key)
        if not m or int(m.group(1)) not in index:
            raise KeyError(f"unmapped autoencoder key: {key}")
        name = index[int(m.group(1))]
        if m.group(2) == "weight":
            _set(out, f"{name}/kernel", _conv_w(v))
        else:
            _set(out, f"{name}/bias", v)
    return out


def stack_scan_layers(params: Dict[str, Any], num_layers: int
                      ) -> Dict[str, Any]:
    """Re-pack per-layer ``rdg_{i}`` subtrees into the nn.scan layout
    (``rdgs/rdg`` with a leading [num_layers] axis on every leaf)."""
    import jax.tree_util as jtu
    layers = [params[f"rdg_{i}"] for i in range(num_layers)]
    stacked = jtu.tree_map(lambda *xs: np.stack(xs), *layers)
    out = {k: v for k, v in params.items() if not k.startswith("rdg_")}
    out["rdgs"] = {"rdg": stacked}
    return out


def stack_drn_rcabs(params: Dict[str, Any], phase: int, n_blocks: int
                    ) -> Dict[str, Any]:
    """Re-pack per-block ``up{i}_rcab{j}`` subtrees into the nn.scan layout
    (``up{i}_rcabs/rcab`` with a leading [n_blocks] axis)."""
    import jax.tree_util as jtu
    out = dict(params)
    for i in range(phase):
        blocks = [out.pop(f"up{i}_rcab{j}") for j in range(n_blocks)]
        out[f"up{i}_rcabs"] = {
            "rcab": jtu.tree_map(lambda *xs: np.stack(xs), *blocks)}
    return out


def _pk(key: str) -> str:
    return "kernel" if key.endswith("weight") else "bias"


def _cv(key: str, v: np.ndarray) -> np.ndarray:
    return _conv_w(v) if key.endswith("weight") and v.ndim == 4 else v
