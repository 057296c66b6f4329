"""Typed, frozen experiment configuration.

The reference threads one mutable `opt` dataclass through every constructor and
mutates it in `setup_opt_drn` / `setup_opt_drct` (reference src/main.py:35-294).
Here the same option surface is decomposed into small frozen dataclasses with
explicit derivation functions, so a config can be traced into jit without
aliasing surprises and dumped losslessly to the run dir (`config.txt` parity —
reference src/checkpoint.py:24-28 / src/evaluate.py:84-120).

Derivation rules reproduced:
- DRN progressive scale list ``[2, 4, ...]`` and the scale->(n_blocks, n_feats)
  table x2->(44,40), x4->(40,20), x8->(36,10)   (main.py:170-182)
- DRCT ``img_size = resolution // scale``, ``window_size = img_size // 4``
  (main.py:286, 417)
- channel rule: mvtec carpet -> RGB(3), anything else -> gray(1) (main.py:414)
- mvtec ``test_every = dataset_length // batch_size`` with dataset_length 256
  (main.py:438-448)
- data/save path conventions (main.py:423-435)
"""

from __future__ import annotations

import dataclasses
import datetime
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple, Union


# --------------------------------------------------------------------------- #
# Leaf configs
# --------------------------------------------------------------------------- #

@dataclass(frozen=True)
class DRNModelConfig:
    """DRN-L dual-regression SR network (reference src/drn.py:160-270)."""
    model_name: str = "drn-l"
    scale: Tuple[int, ...] = (2, 4)  # progressive: [2,4] for x4, [2,4,8] for x8
    n_blocks: int = 40
    n_feats: int = 20
    n_colors: int = 1
    negval: float = 0.2
    rgb_range: float = 255.0
    dual: bool = True
    # compile each up-phase's n_blocks identical RCABs as ONE nn.scan body
    # (n_blocks is 36-44: unrolled compiles are ~40x larger). Params carry a
    # leading [n_blocks] axis under up{i}_rcabs.
    scan_blocks: bool = True

    @property
    def max_scale(self) -> int:
        return max(self.scale)


@dataclass(frozen=True)
class DRCTModelConfig:
    """DRCT Swin-style transformer SR network (reference src/drct.py:716-898)."""
    model_name: str = "drct"
    upscale: int = 4
    img_size: int = 32           # LR input size
    window_size: int = 8         # img_size // 4
    in_chans: int = 1
    embed_dim: int = 180
    num_layers: int = 12         # number of RDGs (len(depths) in the reference)
    num_heads: int = 6
    mlp_ratio: float = 2.0
    gc: int = 32                 # dense growth channels inside an RDG
    num_feat: int = 64           # pre-upsample feature width
    img_range: float = 1.0
    rgb_range: float = 255.0
    qkv_bias: bool = True
    ape: bool = False
    # compile the 12 identical RDGs as ONE nn.scan body instead of 12 unrolled
    # copies: ~12x less XLA code (remote compiles drop from ~13min to ~2min).
    # Params gain a leading [num_layers] axis; the torch converter stacks.
    scan_layers: bool = True
    # tanh-approximate GELU: measured 13% faster forward on v5e (exact erf is
    # VPU-expensive); default False for numeric parity with the reference.
    gelu_approx: bool = False
    # rematerialize each RDG in the backward pass (jax.checkpoint over the
    # scan body): trades ~2x RDG recompute for ~12x less activation memory —
    # required to train 256px inputs (4096 tokens) within 16GB HBM.
    remat: bool = True
    # remat granularity: "full" recomputes everything (min memory);
    # "dots" saves matmul outputs and recomputes only elementwise ops
    # (jax.checkpoint_policies.dots_with_no_batch_dims_saveable).
    # Measured on v5e (DRCT x4 @128, batch 16): full 97 img/s, dots 92.6 —
    # streaming ~7 GB of saved dot outputs through HBM costs more than the
    # recompute it avoids, so "full" stays the default; the knob matters on
    # parts with spare bandwidth or smaller activation footprints.
    remat_policy: str = "full"

    @property
    def scale(self) -> Tuple[int, ...]:
        return (self.upscale,)

    @property
    def n_colors(self) -> int:
        return self.in_chans


@dataclass(frozen=True)
class EfficientADModelConfig:
    """EfficientAD student-teacher baseline (reference src/efficientAD.py)."""
    model_name: str = "efficientad"
    model_size: str = "small"    # 'small' | 'medium'
    out_channels: int = 384
    image_size: int = 256
    rgb_range: float = 255.0
    n_colors: int = 3


ModelConfig = Union[DRNModelConfig, DRCTModelConfig, EfficientADModelConfig]


@dataclass(frozen=True)
class DataConfig:
    dataset: str = "mvtec"
    classe: str = "grid"
    data_dir: str = "data/mvtec_128/grid/train/good"
    data_root: str = "data/mvtec_128"
    data_test: str = ""
    resolution: int = 128        # HR image size
    patch_size: int = 128        # training crop size (== resolution by default)
    scale: Tuple[int, ...] = (2, 4)
    n_colors: int = 1
    rgb_range: float = 255.0
    batch_size: int = 4
    test_every: int = 64         # batches per epoch (epoch len = test_every*batch)
    no_augment: bool = False


@dataclass(frozen=True)
class OptimConfig:
    lr: float = 1e-4
    eta_min: float = 1e-7
    beta1: float = 0.9
    beta2: float = 0.999
    epsilon: float = 1e-8
    weight_decay: float = 0.0
    epochs: int = 10
    loss: str = "1*L1"
    dual_weight: float = 0.1
    # skip updates when loss > skip_threshold * last_epoch_loss. The reference
    # defines this (main.py:69, 113) but comments the check out
    # (trainer.py:190, 207-210); 0 disables, reproducing shipped behavior.
    skip_threshold: float = 0.0


@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout: (dcn x) dp x tp. dp shards the batch over ICI; tp
    shards the attention/MLP channel dimension of DRCT; dcn is an optional
    outer data-parallel axis for multi-host pod slices (dcn=1 collapses to the
    2-D mesh). Sizes of -1 mean "all devices on the dp axis" (the workload's
    natural default — see SURVEY.md section 2.9)."""
    dp: int = -1
    tp: int = 1
    dcn: int = 1


@dataclass(frozen=True)
class Experiment:
    model: ModelConfig
    data: DataConfig
    optim: OptimConfig = OptimConfig()
    mesh: MeshConfig = MeshConfig()
    save: str = "./workspace/experiment/run"
    seed: int = 1
    precision: str = "bf16"      # 'bf16' | 'fp32' compute under jit
    print_every: int = 64
    save_results: bool = True
    test_only: bool = False
    pre_train: str = "."
    pre_train_dual: str = "."
    # full-train-state checkpoint cadence in epochs (device->host fetch of
    # params+moments is expensive through a TPU tunnel; 0 = only at the end)
    ckpt_every: int = 1

    # ---------------- serialization (config.txt parity) ---------------- #

    def to_flat_dict(self) -> Dict[str, Any]:
        """Flatten to the reference's config.txt key set where names overlap."""
        out: Dict[str, Any] = {}
        for section in ("model", "data", "optim", "mesh"):
            cfg = getattr(self, section)
            for f in dataclasses.fields(cfg):
                out[f.name] = getattr(cfg, f.name)
        for f in dataclasses.fields(self):
            if f.name not in ("model", "data", "optim", "mesh"):
                out[f.name] = getattr(self, f.name)
        # keys the reference evaluator greps for (evaluate.py:84-120)
        out["model_name"] = self.model.model_name
        out["dataset"] = self.data.dataset
        out["classe"] = self.data.classe
        out["patch_size"] = self.data.patch_size
        out["scale"] = list(self.data.scale)
        if isinstance(self.model, DRCTModelConfig):
            out["upscale"] = self.model.upscale
        return out


# --------------------------------------------------------------------------- #
# Derivations (setup_opt_* parity)
# --------------------------------------------------------------------------- #

_DRN_SCALE_TABLE = {2: (44, 40), 4: (40, 20), 8: (36, 10)}


def progressive_scales(scale: int) -> Tuple[int, ...]:
    """x4 -> (2, 4); x8 -> (2, 4, 8)  (main.py:170)."""
    n = int(scale).bit_length() - 1
    return tuple(2 ** (s + 1) for s in range(n))


def _dataset_paths(dataset: str, classe: str, resolution: int, data_root: str,
                   save_dir: str, model_name: str, run_tag: Optional[str]
                   ) -> Tuple[str, str, str]:
    """Data/save path conventions (main.py:423-435)."""
    tag = run_tag if run_tag is not None else datetime.datetime.now().strftime("%H:%M:%S")
    if dataset == "mvtec":
        root = data_root if data_root != "auto" else f"data/mvtec_{resolution}"
        data_dir = f"{root}/{classe}/train/good"
    elif dataset in ("gkd", "gkd_large"):
        root = data_root if data_root != "auto" else f"workspace/{dataset}"
        data_dir = f"{root}/{classe}/train/HR_{resolution}"
    else:
        raise ValueError(f"Unknown dataset: {dataset}")
    save = (f"{save_dir}/{model_name}/"
            f"{'mvtec' if dataset == 'mvtec' else dataset}_{classe}_"
            f"{resolution}_X{{scale}}{tag}/")
    return root, data_dir, save


def _mvtec_paths(classe: str, resolution: int, data_root: str, save_dir: str,
                 model_name: str, run_tag: Optional[str]) -> Tuple[str, str, str]:
    return _dataset_paths("mvtec", classe, resolution, data_root, save_dir,
                          model_name, run_tag)


def _mvtec_cadence(classe: str, batch_size: int) -> int:
    dataset_length = 256  # main.py:440
    return max(1, dataset_length // batch_size)


def drn_experiment(classe: str = "grid", resolution: int = 128, scale: int = 4,
                   epochs: int = 2, batch_size: int = 4, lr: float = 1e-4,
                   data_root: str = "auto", save_dir: str = "./workspace/experiment",
                   no_augment: bool = False, loss: str = "1*L1",
                   pre_train: str = ".", pre_train_dual: str = ".",
                   seed: int = 1, mesh: MeshConfig = MeshConfig(),
                   precision: str = "bf16", run_tag: Optional[str] = None,
                   weight_decay: float = 1e-8,
                   dataset: str = "mvtec") -> Experiment:
    n_colors = 3 if (dataset == "mvtec" and classe == "carpet") else 1
    n_blocks, n_feats = _DRN_SCALE_TABLE[scale]
    scales = progressive_scales(scale)
    root, data_dir, save = _dataset_paths(dataset, classe, resolution,
                                          data_root, save_dir, "drn-l",
                                          run_tag)
    test_every = _mvtec_cadence(classe, batch_size)
    model = DRNModelConfig(scale=scales, n_blocks=n_blocks, n_feats=n_feats,
                           n_colors=n_colors)
    data = DataConfig(dataset=dataset, classe=classe, data_dir=data_dir,
                      data_root=root,
                      resolution=resolution, patch_size=resolution,
                      scale=scales, n_colors=n_colors, batch_size=batch_size,
                      test_every=test_every, no_augment=no_augment)
    optim = OptimConfig(lr=lr, epochs=epochs, loss=loss,
                        weight_decay=weight_decay)
    return Experiment(model=model, data=data, optim=optim, mesh=mesh,
                      save=save.format(scale=scale), seed=seed,
                      precision=precision, print_every=test_every,
                      pre_train=pre_train, pre_train_dual=pre_train_dual)


def drct_experiment(classe: str = "grid", resolution: int = 128, scale: int = 4,
                    epochs: int = 2, batch_size: int = 4, lr: float = 1e-4,
                    data_root: str = "auto", save_dir: str = "./workspace/experiment",
                    no_augment: bool = False, loss: str = "1*L1",
                    pre_train: str = ".", seed: int = 1,
                    mesh: MeshConfig = MeshConfig(), precision: str = "bf16",
                    run_tag: Optional[str] = None,
                    embed_dim: int = 180, num_layers: int = 12,
                    num_heads: int = 6, gc: int = 32,
                    dataset: str = "mvtec",
                    remat_policy: str = "full") -> Experiment:
    n_colors = 3 if (dataset == "mvtec" and classe == "carpet") else 1
    img_size = resolution // scale
    window_size = max(1, img_size // 4)
    root, data_dir, save = _dataset_paths(dataset, classe, resolution,
                                          data_root, save_dir, "drct",
                                          run_tag)
    test_every = _mvtec_cadence(classe, batch_size)
    model = DRCTModelConfig(upscale=scale, img_size=img_size,
                            window_size=window_size, in_chans=n_colors,
                            embed_dim=embed_dim, num_layers=num_layers,
                            num_heads=num_heads, gc=gc,
                            remat_policy=remat_policy)
    data = DataConfig(dataset=dataset, classe=classe, data_dir=data_dir,
                      data_root=root,
                      resolution=resolution, patch_size=resolution,
                      scale=(scale,), n_colors=n_colors, batch_size=batch_size,
                      test_every=test_every, no_augment=no_augment)
    optim = OptimConfig(lr=lr, epochs=epochs, loss=loss)
    return Experiment(model=model, data=data, optim=optim, mesh=mesh,
                      save=save.format(scale=scale), seed=seed,
                      precision=precision, print_every=test_every,
                      pre_train=pre_train)
