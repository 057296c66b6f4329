"""Evaluation visual artifacts: ROC curves and difference/SSIM heatmaps.

Completes the reference's research-helper tail: ``plot_roc_curve``
(reference src/helpers.py:436-451 — computed there but the plotting is
commented out; we actually save the figure) and the difference/SSIM heatmap
visualisation from the reference's notebooks/test.ipynb cells 11-21, saved
as run-dir artifacts next to the loss/PSNR plots.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Sequence

import numpy as np

from adsr_tpu.eval.auc import roc_auc, roc_curve
from adsr_tpu.utils.image import min_max_scaling


def save_roc_curves(path: str, y_true: Sequence[int],
                    score_sets: Dict[str, Sequence[float]]) -> str:
    """One ROC figure with a curve per score set (AUC in the legend).

    Mirrors the reference plot layout (helpers.py:440-449): diagonal
    chance line, [0,1]x[0,1.05] limits, FPR/TPR axes, lower-right legend.
    """
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 5))
    for name, scores in score_sets.items():
        fpr, tpr, _ = roc_curve(y_true, scores)
        auc = roc_auc(y_true, scores)
        ax.plot(fpr, tpr, lw=2, label=f"{name} (AUC = {auc:.2f})")
    ax.plot([0, 1], [0, 1], color="navy", lw=2, linestyle="--")
    ax.set_xlim(0.0, 1.0)
    ax.set_ylim(0.0, 1.05)
    ax.set_xlabel("False Positive Rate")
    ax.set_ylabel("True Positive Rate")
    ax.set_title("Receiver Operating Characteristic (ROC) Curve")
    ax.legend(loc="lower right")
    fig.tight_layout()
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(path)
    plt.close(fig)
    return path


def save_heatmaps(out_dir: str, hr_u8: np.ndarray, sr_u8: np.ndarray,
                  filenames: Sequence[str], splits: Sequence[str],
                  window: int = 11, max_images: int = 16) -> int:
    """Per-image |HR-SR| difference and 1-SSIM heatmaps (test.ipynb 11-21).

    Each image gets a 3-panel figure: SR reconstruction, min-max-scaled
    absolute difference, and the per-pixel 1-SSIM map at ``window`` (the
    best sweep window) — the same views the reference's notebook builds
    interactively. Saves at most ``max_images`` per split; returns count.
    """
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    import jax.numpy as jnp

    from adsr_tpu.metrics import ssim_map, to_luma

    hr = hr_u8.astype(np.float32) / 255.0
    sr = sr_u8.astype(np.float32) / 255.0
    smap = np.asarray(ssim_map(to_luma(jnp.asarray(hr)),
                               to_luma(jnp.asarray(sr)),
                               window, 0.01 ** 2, 0.03 ** 2, "reflect"))

    budget = {s: max_images for s in set(splits)}
    count = 0
    for i, (name, split) in enumerate(zip(filenames, splits)):
        if budget[split] <= 0:
            continue
        budget[split] -= 1
        diff = min_max_scaling(np.abs(hr[i] - sr[i]).mean(axis=-1))
        fig, axes = plt.subplots(1, 3, figsize=(12, 4))
        shown = sr_u8[i][:, :, 0] if sr_u8.shape[-1] == 1 else sr_u8[i]
        axes[0].imshow(shown, cmap="gray" if sr_u8.shape[-1] == 1 else None)
        axes[0].set_title("SR reconstruction")
        im1 = axes[1].imshow(diff, cmap="jet")
        axes[1].set_title("|HR - SR| (min-max scaled)")
        fig.colorbar(im1, ax=axes[1], fraction=0.046)
        im2 = axes[2].imshow(1.0 - smap[i, :, :, 0], cmap="jet")
        axes[2].set_title(f"1 - SSIM map (ws={window})")
        fig.colorbar(im2, ax=axes[2], fraction=0.046)
        for ax in axes:
            ax.axis("off")
        d = Path(out_dir) / "heatmaps" / split
        d.mkdir(parents=True, exist_ok=True)
        fig.tight_layout()
        fig.savefig(d / f"{name}.png", dpi=100)
        plt.close(fig)
        count += 1
    return count
