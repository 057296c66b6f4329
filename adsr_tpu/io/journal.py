"""Experiment I/O: run dirs, logging, checkpoints, image export, history plots.

The run-dir layout mirrors the reference's Checkpoint (src/checkpoint.py:9-28)
so downstream tools (run-dir inference in the evaluator, evaluate.py:48-135)
keep working:

    <save>/
      log.txt                     append-only run log (tee'd to stdout)
      config.txt                  timestamp + flat `key: value` config dump
      model/
        model_latest.msgpack      primal params (model_best.msgpack when best)
        dual_model_latest.msgpack DRN dual params
        train_state_latest.msgpack  params+opt_state+step -> TRUE resume,
                                    a superset of the reference's save-only
                                    checkpointing (SURVEY.md section 5.4)
      results/<data_test>/x<s>/   SR PNG dumps

Params are serialized with flax msgpack (framework-portable); the full train
state uses the same container keyed by pytree structure.
"""

from __future__ import annotations

import datetime
import json
import os
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

import jax
from flax import serialization

from adsr_tpu.core.config import Experiment


def save_params(path: str, params: Any) -> None:
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(params))


def load_params(path: str, target: Any) -> Any:
    """Deserialize into the structure of ``target`` (shape-checked).

    Transparently adapts between the unrolled (``rdg_{i}`` / ``up{i}_rcab{j}``)
    and nn.scan-stacked (``rdgs`` / ``up{i}_rcabs``) parameter layouts so
    checkpoints stay loadable across the scan_layers/scan_blocks flags.
    """
    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    raw = _adapt_layout(raw, target)
    return serialization.from_state_dict(target, raw)


def _adapt_layout(raw: Any, target: Any) -> Any:
    import re

    import numpy as np

    if not isinstance(raw, dict) or not isinstance(target, dict):
        return raw
    tkeys = set(target.keys())
    out = dict(raw)

    def stack_group(prefix_re: str, dest: str, inner: str) -> None:
        names = sorted((k for k in out if re.fullmatch(prefix_re, k)),
                       key=lambda s: int(re.findall(r"\d+", s)[-1]))
        if names and dest in tkeys and dest not in out:
            layers = [out.pop(n) for n in names]
            out[dest] = {inner: jax.tree_util.tree_map(
                lambda *xs: np.stack(xs), *layers)}

    def unstack_group(src: str, prefix: str, inner: str) -> None:
        if src in out and src not in tkeys:
            stacked = out.pop(src)[inner]
            n = jax.tree_util.tree_leaves(stacked)[0].shape[0]
            for i in range(n):
                out[f"{prefix}{i}"] = jax.tree_util.tree_map(
                    lambda x: x[i], stacked)

    stack_group(r"rdg_\d+", "rdgs", "rdg")
    unstack_group("rdgs", "rdg_", "rdg")
    for i in range(8):
        stack_group(rf"up{i}_rcab\d+", f"up{i}_rcabs", "rcab")
        unstack_group(f"up{i}_rcabs", f"up{i}_rcab", "rcab")
    return out


class Journal:
    """Run-dir manager; the TPU build's Checkpoint equivalent."""

    def __init__(self, exp: Experiment, save_dir: Optional[str] = None):
        self.exp = exp
        self.dir = Path(save_dir or exp.save)
        self.dir.mkdir(parents=True, exist_ok=True)
        (self.dir / "model").mkdir(exist_ok=True)
        (self.dir / "results").mkdir(exist_ok=True)
        mode = "a" if (self.dir / "log.txt").exists() else "w"
        self._log_file = open(self.dir / "log.txt", mode)
        now = datetime.datetime.now().strftime("%Y-%m-%d-%H:%M:%S")
        with open(self.dir / "config.txt", mode) as f:
            f.write(now + "\n\n")
            for k, v in exp.to_flat_dict().items():
                f.write(f"{k}: {v}\n")
            f.write("\n")

    # ------------------------------ logging ---------------------------- #

    def write_log(self, msg: str, refresh: bool = False) -> None:
        print(msg)
        self._log_file.write(msg + "\n")
        if refresh:
            self._log_file.flush()

    def log_metrics(self, record: Dict[str, Any]) -> None:
        """Append one JSON line to metrics.jsonl (structured observability)."""
        with open(self.dir / "metrics.jsonl", "a") as f:
            f.write(json.dumps(record) + "\n")

    def done(self) -> None:
        if not self._log_file.closed:
            self._log_file.close()

    # ---------------------------- checkpoints --------------------------- #

    def save_model(self, params: Dict[str, Any], is_best: bool = False) -> None:
        save_params(str(self.dir / "model" / "model_latest.msgpack"),
                    params["primal"])
        if is_best:
            save_params(str(self.dir / "model" / "model_best.msgpack"),
                        params["primal"])
        if "duals" in params:
            save_params(str(self.dir / "model" / "dual_model_latest.msgpack"),
                        {str(i): p for i, p in enumerate(params["duals"])})
            if is_best:
                save_params(str(self.dir / "model" / "dual_model_best.msgpack"),
                            {str(i): p for i, p in enumerate(params["duals"])})

    def save_train_state(self, state: Any) -> None:
        """Full-state checkpoint (params + optimizer + step) for true resume."""
        save_params(str(self.dir / "model" / "train_state_latest.msgpack"),
                    state)

    def load_train_state(self, target: Any) -> Any:
        return load_params(
            str(self.dir / "model" / "train_state_latest.msgpack"), target)

    def save(self, trainer, is_best: bool = False) -> None:
        """End-of-training save bundle (src/checkpoint.py:30-48 equivalent)."""
        self.save_model(trainer.state.params, is_best=is_best)
        self.save_train_state(trainer.state)
        with open(self.dir / "loss_log.json", "w") as f:
            json.dump(trainer.loss_history, f)
        with open(self.dir / "psnr_ssim_log.json", "w") as f:
            json.dump(trainer.psnr_ssim_history, f)
        self.plot_loss(trainer.loss_history)
        self.plot_psnr_ssim(trainer.psnr_ssim_history)

    # ----------------------------- artifacts ---------------------------- #

    def save_result_image(self, filename: str, sr: np.ndarray, scale: int,
                          data_test: str = "") -> None:
        """SR PNG export (src/checkpoint.py:107-125 layout)."""
        from PIL import Image
        out_dir = self.dir / "results" / data_test / f"x{scale}"
        out_dir.mkdir(parents=True, exist_ok=True)
        arr = np.asarray(sr)
        u8 = np.clip(arr * (255.0 / self.exp.data.rgb_range), 0, 255
                     ).astype(np.uint8)
        if u8.ndim == 3 and u8.shape[2] == 1:
            u8 = u8[:, :, 0]
        Image.fromarray(u8).save(out_dir / f"{filename}.png")

    def plot_loss(self, history: List[Dict[str, float]]) -> None:
        if not history:
            return
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        keys = sorted(history[0])
        axis = np.arange(1, len(history) + 1)
        for k in keys:
            fig = plt.figure()
            plt.title(f"{k} Loss")
            plt.plot(axis, [h[k] for h in history], label=f"{k} Loss")
            plt.legend(); plt.xlabel("Epochs"); plt.ylabel("Loss")
            plt.grid(True)
            plt.savefig(self.dir / f"loss_{k}.pdf")
            plt.close(fig)

    def plot_psnr_ssim(self, history: List[Tuple[float, float]]) -> None:
        if not history:
            self.write_log("No evaluation logs available; skipping PSNR/SSIM plot")
            return
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        axis = np.arange(1, len(history) + 1)
        fig = plt.figure(figsize=(10, 5))
        for i, name in enumerate(("PSNR", "SSIM")):
            plt.subplot(1, 2, i + 1)
            plt.title(f"SR on {self.exp.data.data_test} - {name}")
            plt.plot(axis, [h[i] for h in history],
                     label=f"Scale {max(self.exp.data.scale)}")
            plt.legend(); plt.xlabel("Epochs"); plt.ylabel(name)
            plt.grid(True)
        plt.tight_layout()
        plt.savefig(self.dir /
                    f"test_{self.exp.data.data_test}_psnr_ssim.pdf")
        plt.close(fig)
