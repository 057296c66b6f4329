"""Disk-based research analysis pipelines (reference src/helpers.py:158-434 and
src/recall_1.py:365-435).

These operate on *saved* SR/HR image folders (the output of the evaluator's
PNG export) rather than a live model, reproducing the thesis workflows:
window-size sweep over saved reconstructions, patch-grouped part scoring, and
specificity at the perfect-recall threshold.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from adsr_tpu.eval.auc import (perfect_recall_threshold, roc_auc,
                               specificity_at)
from adsr_tpu.eval.evaluate import grouped_max_scores, sweep_best_window
from adsr_tpu.metrics import psnr_np


def _load_pairs(sr_dir: str, hr_dir: str
                ) -> Tuple[np.ndarray, np.ndarray, List[str]]:
    from PIL import Image
    sr_files = sorted(Path(sr_dir).glob("*.png"))
    if not sr_files:
        raise FileNotFoundError(f"no PNGs in {sr_dir}")
    srs, hrs, names = [], [], []
    for f in sr_files:
        hr_f = Path(hr_dir) / f.name
        if not hr_f.exists():
            continue
        with Image.open(f) as a, Image.open(hr_f) as b:
            sr = np.asarray(a)
            hr = np.asarray(b)
        if sr.ndim == 2:
            sr, hr = sr[..., None], hr[..., None]
        srs.append(sr)
        hrs.append(hr)
        names.append(f.stem)
    return np.stack(srs), np.stack(hrs), names


def analyze_window_sizes(good_sr: str, good_hr: str, bad_sr: str,
                         bad_hr: str,
                         window_sizes: Optional[Sequence[int]] = None,
                         group_div: Optional[int] = None) -> Dict[str, object]:
    """Window-size sweep + final AUCs over saved image folders
    (helpers.py:158-319). group_div enables patch-grouped part scoring."""
    sr_g, hr_g, names_g = _load_pairs(good_sr, good_hr)
    sr_b, hr_b, names_b = _load_pairs(bad_sr, bad_hr)
    sr = np.concatenate([sr_g, sr_b])
    hr = np.concatenate([hr_g, hr_b])
    y_true = [0] * len(sr_g) + [1] * len(sr_b)
    names = names_g + names_b

    best_ws, best_auc, per_ws = sweep_best_window(sr, hr, y_true,
                                                  window_sizes)
    scores_ssim = per_ws[best_ws]
    sr_f = sr.astype(np.float32) / 255.0
    hr_f = hr.astype(np.float32) / 255.0
    scores_mse = [float(np.mean((a - b) ** 2)) for a, b in zip(sr_f, hr_f)]
    scores_psnr = [psnr_np(b, a) for a, b in zip(sr_f, hr_f)]

    if group_div:
        y_true_g, scores_ssim_g = grouped_max_scores(names, scores_ssim,
                                                     y_true, group_div)
        _, scores_mse_g = grouped_max_scores(names, scores_mse, y_true,
                                             group_div)
        _, scores_negpsnr_g = grouped_max_scores(
            names, [-p for p in scores_psnr], y_true, group_div)
        return {
            "best_ws": best_ws,
            "auc_ssim": roc_auc(y_true_g, scores_ssim_g),
            "auc_mse": roc_auc(y_true_g, scores_mse_g),
            "auc_psnr": roc_auc(y_true_g, scores_negpsnr_g),
            "grouped": True, "n_groups": len(y_true_g),
        }

    return {
        "best_ws": best_ws,
        "auc_ssim": roc_auc(y_true, scores_ssim),
        "auc_mse": roc_auc(y_true, scores_mse),
        "auc_psnr": roc_auc(y_true, [-p for p in scores_psnr]),
        "y_true": y_true, "names": names,
        "scores_ssim": list(map(float, scores_ssim)),
        "scores_mse": scores_mse, "scores_psnr": scores_psnr,
    }


def specificity_report(y_true: Sequence[int],
                       scores: Dict[str, Sequence[float]]
                       ) -> Dict[str, Dict[str, float]]:
    """Specificity at the perfect-recall threshold per metric
    (recall_1.py:419-435)."""
    out = {}
    for name, s in scores.items():
        thr = perfect_recall_threshold(y_true, s)
        out[name] = {"threshold": thr,
                     "specificity": specificity_at(y_true, s, thr)}
    return out
