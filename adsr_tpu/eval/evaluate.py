"""Anomaly evaluation: SR reconstruction error -> ROC-AUC.

Single compiled pipeline per batch (reference runs this image-by-image on
host numpy — src/evaluate.py:204-267): forward -> crop -> uint8 round-trip ->
per-image SSIM/MSE/PSNR on device, batched over the whole test set. The SSIM
window-size sweep (odd sizes ``range(3, min_dim-3, 10)``, pick the
AUC-maximising window — evaluate.py:233-248) evaluates every window size on
device from the same image arrays; only the tiny AUC rank computation runs on
host.

Score conventions (evaluate.py:250-267): anomaly score = 1 - SSIM, MSE, and
-PSNR on [0,1] uint8-quantised images, with the reference's truncating (not
rounding) byte conversion reproduced.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from adsr_tpu.core.config import Experiment
from adsr_tpu.data.pipeline import SRDataset, load_sr_dataset
from adsr_tpu.eval.auc import roc_auc
from adsr_tpu.metrics import mse_eval, psnr_eval
from adsr_tpu.train.trainer import make_serving_forward


def _forward_split(forward, exp: Experiment, ds: SRDataset, batch: int = 8,
                   mesh=None) -> Tuple[np.ndarray, np.ndarray]:
    """Run SR over a split; returns (sr_u8, hr_u8) as [N,H,W,C] uint8.

    ``forward`` is a single-arg closure from make_serving_forward — built
    ONCE per evaluation so the good/bad splits share one compiled graph and
    one prepacked weight tree.

    With a mesh, eval batches are dp-sharded over ICI (batch-parallel eval —
    the multi-chip path the reference has no analogue for)."""
    put = None
    if mesh is not None:
        from adsr_tpu.core.mesh import batch_sharding
        sharding = batch_sharding(mesh)
        put = lambda x: jax.device_put(x, sharding)
    lr = ds.lrs[0]
    n = lr.shape[0]
    outs = []
    for i in range(0, n, batch):
        chunk = lr[i:i + batch]
        pad = batch - chunk.shape[0]
        if pad:
            chunk = np.concatenate([chunk, np.repeat(chunk[-1:], pad, 0)])
        dev = jnp.asarray(chunk) if put is None else put(jnp.asarray(chunk))
        sr = np.asarray(forward(dev))
        outs.append(sr[:sr.shape[0] - pad] if pad else sr)
    sr = np.concatenate(outs)
    h, w = ds.hr.shape[1], ds.hr.shape[2]
    sr = sr[:, :h, :w, :]
    # truncating byte conversion, as the reference's .byte() (evaluate.py:214)
    scale = 255.0 / exp.data.rgb_range
    sr_u8 = np.clip(sr * scale, 0, 255).astype(np.uint8)
    hr_u8 = np.clip(ds.hr * scale, 0, 255).astype(np.uint8)
    return sr_u8, hr_u8


def window_size_candidates(min_dim: int) -> List[int]:
    """Odd sizes 3, 13, 23, ... up to min_dim-3 (evaluate.py:233-236)."""
    max_w = max(3, min_dim - 3)
    return [w for w in range(3, max_w + 1, 10) if w % 2 == 1] or [3]


from functools import partial as _partial


@_partial(jax.jit, static_argnames=("window_sizes",))
def _ssim_sweep_graph(hr: jnp.ndarray, sr: jnp.ndarray,
                      window_sizes: Tuple[int, ...]) -> jnp.ndarray:
    """[len(ws), N] per-image SSIM at every window size, ONE compiled graph
    (13 separate compiles would each pay the remote-compile round trip)."""
    from adsr_tpu.metrics import ssim_map, to_luma
    a = to_luma(hr.astype(jnp.float32))
    b = to_luma(sr.astype(jnp.float32))
    rows = []
    for ws in window_sizes:
        m = ssim_map(a, b, ws, 0.01 ** 2, 0.03 ** 2, "reflect")
        rows.append(jnp.mean(m, axis=(1, 2, 3)))
    return jnp.stack(rows)


def sweep_best_window(sr_u8: np.ndarray, hr_u8: np.ndarray,
                      y_true: Sequence[int],
                      window_sizes: Optional[Sequence[int]] = None
                      ) -> Tuple[int, float, Dict[int, np.ndarray]]:
    """Device-batched SSIM at every window size; AUC per size on host."""
    if window_sizes is None:
        window_sizes = window_size_candidates(min(hr_u8.shape[1], hr_u8.shape[2]))
    hr = jnp.asarray(hr_u8.astype(np.float32) / 255.0)
    sr = jnp.asarray(sr_u8.astype(np.float32) / 255.0)
    all_ssim = np.asarray(_ssim_sweep_graph(hr, sr, tuple(window_sizes)))
    best_ws, best_auc = window_sizes[0], -1.0
    per_ws: Dict[int, np.ndarray] = {}
    for i, ws in enumerate(window_sizes):
        scores = 1.0 - all_ssim[i]
        per_ws[ws] = scores
        auc = roc_auc(y_true, scores)
        if auc > best_auc:
            best_auc, best_ws = auc, ws
    return best_ws, best_auc, per_ws


def evaluate_anomaly(exp: Experiment, params, data_root: str,
                     classe: str, out_dir: Optional[str] = None,
                     save_images: bool = True, batch: int = 8,
                     mesh=None, log=print, tile: int = 0,
                     tile_overlap: int = 8,
                     sweep_windows: int = 0) -> Dict[str, object]:
    """Full anomaly pass over test/good + test/bad (evaluate.py:138-267).

    ``tile > 0`` forces overlapped-tile serving with that LR tile size;
    tile == 0 auto-enables it when the test LR exceeds the DRCT train size
    (the reference instead recompiles masks + clamps windows,
    src/drct.py:426-429 — tiling avoids the full-size compile).

    ``sweep_windows > 0`` caps the SSIM window sweep to that many sizes
    (evenly subsampled from the reference's full 3..min_dim-3 ladder —
    evaluate.py:233-236): at 512px HR the full ladder is ~51 window sizes
    whose separable convs reach 509 taps, and the single compiled sweep
    graph takes tens of minutes to build; 0 keeps exact reference
    parity."""
    scale = max(exp.data.scale)

    def load(split: str) -> SRDataset:
        return load_sr_dataset(f"{data_root}/{classe}/test/{split}",
                               (scale,), exp.data.n_colors,
                               exp.data.rgb_range)

    ds_good, ds_bad = load("good"), load("bad")

    from adsr_tpu.core.config import DRCTModelConfig
    lr_size = max(ds_good.lrs[0].shape[1], ds_good.lrs[0].shape[2])
    # auto-tile whenever the test LR exceeds the compiled train-shape tile:
    # DRCT's token geometry is img_size; DRN is a local CNN, so its tile is
    # the train-crop LR size (patch_size/scale) — both serve big images
    # through the already-compiled tile graph instead of a full-size
    # recompile (the reference recompiles masks + clamps windows instead,
    # src/drct.py:426-429)
    train_tile = exp.model.img_size if isinstance(exp.model, DRCTModelConfig) \
        else max(1, exp.data.patch_size // scale)
    auto_tile = lr_size > train_tile
    if tile > 0 or auto_tile:
        from adsr_tpu.train.trainer import make_tiled_serving_forward
        forward = make_tiled_serving_forward(exp, params, tile or train_tile,
                                             overlap=tile_overlap,
                                             quantize_out=False)
        log(f"Tiled serving: tile={tile or train_tile} "
            f"overlap={tile_overlap} for {lr_size}px LR input")
    else:
        # raw float SR: the uint8 conversion below TRUNCATES like the
        # reference's .byte() (src/evaluate.py:214); serving's quantize()
        # rounds, which would bias ~half the pixels vs the reference scores
        forward = make_serving_forward(exp, params, mesh=mesh,
                                       quantize_out=False)
    sr_g, hr_g = _forward_split(forward, exp, ds_good, batch, mesh)
    sr_b, hr_b = _forward_split(forward, exp, ds_bad, batch, mesh)
    sr_u8 = np.concatenate([sr_g, sr_b])
    hr_u8 = np.concatenate([hr_g, hr_b])
    y_true = [0] * len(sr_g) + [1] * len(sr_b)
    filenames = ds_good.filenames + ds_bad.filenames
    splits = ["good"] * len(sr_g) + ["bad"] * len(sr_b)

    if save_images and out_dir:
        from PIL import Image
        for img, name, split in zip(sr_u8, filenames, splits):
            d = Path(out_dir) / split / f"x{scale}"
            d.mkdir(parents=True, exist_ok=True)
            arr = img[:, :, 0] if img.shape[2] == 1 else img
            Image.fromarray(arr).save(d / f"{name}.png")

    if len(set(y_true)) < 2:
        log("Test set lacks both classes; AUC not available")
        return {"error": "single-class"}

    cands = window_size_candidates(min(hr_u8.shape[1], hr_u8.shape[2]))
    if sweep_windows and len(cands) > sweep_windows:
        idx = np.linspace(0, len(cands) - 1, sweep_windows).round()
        cands = [cands[int(i)] for i in idx]
        log(f"Window sweep capped to {len(cands)} sizes: {cands}")
    elif not sweep_windows and len(cands) > 16:
        log(f"WARNING: the full reference window ladder has {len(cands)} "
            "sizes at this image size; the single compiled sweep graph "
            "over all of them can take tens of minutes to BUILD (measured "
            ">20 min at 512px). Pass --sweep-windows 9 (or similar) to "
            "subsample the ladder evenly — the best-window choice rarely "
            "moves.")
    best_ws, _, per_ws = sweep_best_window(sr_u8, hr_u8, y_true,
                                           window_sizes=cands)

    hr_f = jnp.asarray(hr_u8.astype(np.float32) / 255.0)
    sr_f = jnp.asarray(sr_u8.astype(np.float32) / 255.0)
    scores_ssim = per_ws[best_ws]
    scores_mse = np.asarray(mse_eval(sr_f, hr_f))
    scores_psnr = np.asarray(psnr_eval(hr_f, sr_f))

    auc_ssim = roc_auc(y_true, scores_ssim)
    auc_mse = roc_auc(y_true, scores_mse)
    auc_psnr = roc_auc(y_true, [-p for p in scores_psnr])

    log(f"Test AUCs - SSIM(best ws={best_ws}): {auc_ssim:.4f}, "
        f"MSE: {auc_mse:.4f}, PSNR: {auc_psnr:.4f}")

    # specificity at the perfect-recall threshold (recall_1.py:419-435)
    from adsr_tpu.eval.disk import specificity_report
    spec = specificity_report(y_true, {
        "ssim": list(map(float, scores_ssim)),
        "mse": list(map(float, scores_mse)),
        "psnr": [-float(p) for p in scores_psnr],
    })

    if out_dir:
        # ROC curves + difference/SSIM heatmaps (helpers.py:436-451;
        # notebooks/test.ipynb cells 11-21)
        from adsr_tpu.eval.visual import save_heatmaps, save_roc_curves
        save_roc_curves(str(Path(out_dir) / "roc_curve.pdf"), y_true, {
            "1-SSIM": scores_ssim,
            "MSE": scores_mse,
            "-PSNR": [-float(p) for p in scores_psnr],
        })
        n = save_heatmaps(out_dir, hr_u8, sr_u8, filenames, splits,
                          window=best_ws)
        log(f"Saved ROC curve and {n} heatmap figures to {out_dir}")

    return {
        "specificity": spec,
        "auc_ssim": auc_ssim, "auc_mse": auc_mse, "auc_psnr": auc_psnr,
        "best_ws": best_ws, "y_true": y_true,
        "scores_ssim": scores_ssim.tolist(),
        "scores_mse": scores_mse.tolist(),
        "scores_psnr": scores_psnr.tolist(),
        "filenames": filenames, "splits": splits,
    }


def grouped_max_scores(filenames: Sequence[str], scores: Sequence[float],
                       y_true: Sequence[int], group_div: int = 14
                       ) -> Tuple[List[int], List[float]]:
    """Patch-grouped scoring: group by int(name.split('_')[0]) // group_div and
    take the max patch score per physical part (src/helpers.py:232-319)."""
    groups: Dict[Tuple[int, int], float] = {}
    for name, score, label in zip(filenames, scores, y_true):
        try:
            gid = int(name.split("_")[0]) // group_div
        except ValueError:
            gid = hash(name.split("_")[0]) % (2 ** 31)
        key = (gid, label)
        groups[key] = max(groups.get(key, -np.inf), float(score))
    labels = [k[1] for k in groups]
    return labels, [groups[k] for k in groups]
