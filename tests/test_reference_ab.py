"""Same-data A/B against the ACTUAL reference code (torch, /root/reference).

VERDICT r3 item 4: "AUC 1.0 on synthetic" is only a parity statement if the
reference code path produces the same scores on the same inputs. This module
runs the reference's own eval loop numerics (src/evaluate.py:204-267 —
per-image torch forward, truncating .byte() uint8 conversion, calculate_ssim
window sweep, MSE/PSNR score lists) next to our evaluate_anomaly on an
IDENTICAL synthetic fixture tree with an IDENTICAL model (reference torch
init converted through io/torch_convert), and asserts SCORE-LEVEL agreement,
not just AUC equality.

Train-side deltas are documented in ARCHITECTURE.md ("Reference A/B"):
optimizer-step numerics are covered by tests/test_train.py's torch-Adam
semantics tests; the stochastic pieces (dropout/drop-path RNG, data shuffle
order) are framework-native and intentionally NOT bit-matched.
"""

import numpy as np
import pytest

import jax

from adsr_tpu.core.config import (
    DataConfig, DRCTModelConfig, Experiment, OptimConfig,
)


def _build_fixture(tmp_path, hr=32, scale=2):
    from adsr_tpu.data.prepare import prepare_mvtec_dataset
    from adsr_tpu.data.synthetic import generate_synthetic_mvtec
    src, tgt = str(tmp_path / "src"), str(tmp_path / "mvtec_32")
    generate_synthetic_mvtec(src, classes=("grid",), n_train=2,
                             n_test_good=4, n_test_bad_per_defect=2,
                             size=48, seed=0)
    prepare_mvtec_dataset(src, tgt, classes=("grid",),
                          scale_factors=(scale,), target_hr=(hr, hr))
    return tgt


def _model_pair(img_size=16, window=4, upscale=2, num_layers=2):
    """Reference torch DRCT (random torch init) + the converted jax tree."""
    import types

    import torch

    from reference_compat import import_reference
    try:
        TorchDRCT = import_reference("drct").DRCT
    except Exception as e:  # pragma: no cover - environment-dependent
        pytest.skip(f"reference import unavailable: {e}")
    opt = types.SimpleNamespace(
        img_size=img_size, n_colors=1, embed_dim=12, depths=(6,) * num_layers,
        num_heads=(2,) * num_layers, window_size=window, compress_ratio=3,
        squeeze_factor=30, conv_scale=0.01, overlap_ratio=0.5, mlp_ratio=2.0,
        upscale=upscale, img_range=1.0, upsampler="pixelshuffle",
        resi_connection="1conv")
    torch.manual_seed(0)
    tm = TorchDRCT(opt, gc=4)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    from adsr_tpu.io.torch_convert import convert_drct, stack_scan_layers
    params = jax.tree_util.tree_map(
        np.asarray, stack_scan_layers(convert_drct(sd), num_layers))
    cfg = DRCTModelConfig(upscale=upscale, img_size=img_size,
                          window_size=window, in_chans=1, embed_dim=12,
                          num_layers=num_layers, num_heads=2, gc=4,
                          scan_layers=True)
    return tm, params, cfg


def _reference_eval(tm, root, classe, scale, helpers):
    """The reference eval loop's numerics (src/evaluate.py:204-267), fed the
    SAME loaded LR/HR arrays as our pipeline (identical inputs is the point
    of the A/B): per-image torch forward, truncating byte conversion,
    window-swept 1-SSIM + MSE + PSNR score lists via the reference's OWN
    calculate_ssim/calculate_psnr."""
    import torch
    from sklearn.metrics import roc_auc_score

    from adsr_tpu.data.pipeline import load_sr_dataset

    recs = []
    for split, label in (("good", 0), ("bad", 1)):
        ds = load_sr_dataset(f"{root}/{classe}/test/{split}", (scale,), 1)
        for i, name in enumerate(ds.filenames):
            lr = ds.lrs[0][i]                      # [H, W, 1] float 0..255
            with torch.no_grad():
                sr = tm(torch.from_numpy(lr.transpose(2, 0, 1)[None]))
            h, w = ds.hr.shape[1:3]
            sr = sr[..., :h, :w]
            # .mul(255/rgb_range).clamp().byte() with rgb_range=255
            sr_u8 = sr[0, 0].mul(1.0).clamp(0, 255).byte().numpy()
            hr_u8 = np.clip(ds.hr[i, :, :, 0], 0, 255).astype(np.uint8)
            recs.append((split, name, label, hr_u8, sr_u8))

    y_true = [r[2] for r in recs]
    min_dim = min(min(r[3].shape[:2]) for r in recs)
    max_w = max(3, min_dim - 3)
    window_sizes = [w for w in range(3, max_w + 1, 10) if w % 2 == 1] or [3]
    best_ws, best_auc = window_sizes[0], -1.0
    for ws in window_sizes:
        scores = [1 - helpers.calculate_ssim(
            r[3].astype(np.float32) / 255.0, r[4].astype(np.float32) / 255.0,
            ws) for r in recs]
        auc = roc_auc_score(y_true, scores)
        if auc > best_auc:
            best_auc, best_ws = auc, ws

    out = {"y_true": y_true, "best_ws": best_ws, "filenames": [],
           "splits": [], "ssim": [], "mse": [], "psnr": []}
    for split, name, _, hr_u8, sr_u8 in recs:
        hr_f = hr_u8.astype(np.float32) / 255.0
        sr_f = sr_u8.astype(np.float32) / 255.0
        out["filenames"].append(name)
        out["splits"].append(split)
        out["ssim"].append(1 - helpers.calculate_ssim(hr_f, sr_f, best_ws))
        out["mse"].append(float(np.mean((sr_f - hr_f) ** 2)))
        out["psnr"].append(helpers.calculate_psnr(hr_f, sr_f))
    out["auc_ssim"] = roc_auc_score(y_true, out["ssim"])
    out["auc_mse"] = roc_auc_score(y_true, out["mse"])
    out["auc_psnr"] = roc_auc_score(y_true, [-p for p in out["psnr"]])
    return out


@pytest.mark.slow
class TestEvalScoreParityVsReference:
    def test_score_lists_match_reference_eval(self, tmp_path, monkeypatch):
        scale = 2
        root = _build_fixture(tmp_path, hr=32, scale=scale)
        tm, params, cfg = _model_pair(img_size=16, window=4, upscale=scale)

        # --- our pipeline: one device-batched compiled eval graph ---------
        from adsr_tpu.eval.evaluate import evaluate_anomaly
        data = DataConfig(resolution=32, patch_size=32, scale=(scale,),
                          n_colors=1, batch_size=4, test_every=1)
        exp = Experiment(model=cfg, data=data, optim=OptimConfig(),
                         save=str(tmp_path / "run"), precision="fp32",
                         print_every=100)
        ours = evaluate_anomaly(exp, params, root, "grid",
                                out_dir=None, save_images=False, batch=4,
                                log=lambda *_: None)

        # --- the reference's eval numerics on the same tree/model ---------
        from reference_compat import import_reference
        helpers = import_reference("helpers")
        # skimage is absent in this env; its import stub would silently
        # return class objects from ssim()/psnr() — force the reference's
        # own numpy fallback (src/metrics.py) deterministically
        try:
            from skimage.metrics import structural_similarity as _real
            float(_real(np.zeros((8, 8)), np.zeros((8, 8)), win_size=3,
                        data_range=1.0))
        except Exception:
            def _raise(*a, **k):
                raise RuntimeError("forced unified fallback")
            monkeypatch.setattr(helpers, "ssim", _raise)
            monkeypatch.setattr(helpers, "psnr", _raise)
        ref = _reference_eval(tm, root, "grid", scale, helpers)

        # --- alignment + SCORE-LEVEL agreement ----------------------------
        assert ours["filenames"] == ref["filenames"]
        assert ours["splits"] == ref["splits"]
        assert ours["y_true"] == ref["y_true"]
        assert ours["best_ws"] == ref["best_ws"]
        # per-image score lists (the actual parity statement): fp32
        # jax-vs-torch forward deltas land under ~1e-5; a borderline pixel
        # straddling a truncation boundary moves one grey level, which at
        # 32x32 shifts SSIM/MSE by < ~1e-3
        np.testing.assert_allclose(ours["scores_ssim"], ref["ssim"],
                                   atol=2e-3)
        np.testing.assert_allclose(ours["scores_mse"], ref["mse"], atol=1e-5)
        np.testing.assert_allclose(ours["scores_psnr"], ref["psnr"],
                                   atol=0.05)
        # AUCs are rank statistics over agreeing score lists
        for k in ("auc_ssim", "auc_mse", "auc_psnr"):
            assert ours[k] == pytest.approx(ref[k], abs=0.01), k


@pytest.mark.slow
class TestTrainStepParityVsReference:
    """Same-data TRAINING A/B against the reference's own torch train loop
    (src/trainer.py:141-240): identical converted init, identical fixed
    batch sequence, identical optimizer/scheduler settings — per-step loss
    curves and the final val PSNR must agree within f32 jax-vs-torch
    tolerance.

    Determinism: num_layers=1 makes the single RDG's stochastic-depth rate
    dpr[0] = 0 (the reference applies drop_path[0] per RDG,
    src/drct.py:332), so BOTH train-mode forwards are deterministic and the
    comparison needs no RNG matching; multi-layer stochastic-depth
    schedules are unit-tested elsewhere (test_fused_rdg_train)."""

    def test_loss_curve_matches_reference_trainer(self):
        import torch

        tm, params, cfg = _model_pair(img_size=16, window=4, upscale=2,
                                      num_layers=1)
        # deep-copy: the converted tree holds views of the torch parameter
        # memory (state_dict -> detach().numpy() shares buffers), and the
        # torch loop below trains tm IN PLACE
        params = jax.tree_util.tree_map(np.array, params)
        epochs, batches, bsz = 2, 3, 2
        lr0, eta_min = 2e-4, 1e-7
        rng = np.random.RandomState(7)
        lrs_np = rng.rand(epochs * batches, bsz, 16, 16, 1).astype(
            np.float32) * 255.0
        hrs_np = rng.rand(epochs * batches, bsz, 32, 32, 1).astype(
            np.float32) * 255.0

        # --- the reference trainer's step sequence (eager torch) ---------
        tm.train()
        optimizer = torch.optim.Adam(tm.parameters(), lr=lr0,
                                     betas=(0.9, 0.999), eps=1e-8,
                                     weight_decay=0.0)
        scheduler = torch.optim.lr_scheduler.CosineAnnealingLR(
            optimizer, float(epochs), eta_min=eta_min)
        l1 = torch.nn.L1Loss(reduction="mean")
        ref_losses = []
        for e in range(epochs):
            for b in range(batches):
                i = e * batches + b
                lr_t = torch.from_numpy(
                    lrs_np[i].transpose(0, 3, 1, 2)).contiguous()
                hr_t = torch.from_numpy(
                    hrs_np[i].transpose(0, 3, 1, 2)).contiguous()
                optimizer.zero_grad()
                loss = l1(tm(lr_t), hr_t)
                loss.backward()
                optimizer.step()
                ref_losses.append(float(loss))
            scheduler.step()

        # --- our jitted train step on the identical batches --------------
        from adsr_tpu.train.trainer import (TrainState, cosine_lr,
                                            make_train_step)
        data = DataConfig(resolution=32, patch_size=32, scale=(2,),
                          n_colors=1, batch_size=bsz, test_every=1)
        optim = OptimConfig(lr=lr0, eta_min=eta_min, epochs=epochs,
                            loss="1*L1", weight_decay=0.0)
        exp = Experiment(model=cfg, data=data, optim=optim,
                         save="", precision="fp32", print_every=100)
        bundle = make_train_step(exp)
        p = {"primal": jax.tree_util.tree_map(jax.numpy.asarray, params)}
        state = TrainState(step=jax.numpy.asarray(0), params=p,
                           opt_state=bundle.optimizer.init(p))
        our_losses = []
        for e in range(epochs):
            lr_rate = cosine_lr(e, lr0, eta_min, epochs)
            for b in range(batches):
                i = e * batches + b
                state, metrics = bundle.step(
                    state, [jax.numpy.asarray(lrs_np[i])],
                    jax.numpy.asarray(hrs_np[i]), lr_rate,
                    jax.random.key(0))
                our_losses.append(float(metrics["total"]))

        # per-step agreement: f32 forward deltas are ~1e-5; ~6 Adam steps
        # compound them but the curves must track to ~0.1% of the loss
        # magnitude (random-init L1 on 0..255 data sits around 40-90)
        np.testing.assert_allclose(our_losses, ref_losses,
                                   rtol=2e-3, atol=0.05)

        # final-params val PSNR (the trainer's own quality metric,
        # src/trainer.py:242-304) on a held-out batch
        from adsr_tpu.metrics import psnr_shave4, quantize
        val_lr = rng.rand(bsz, 16, 16, 1).astype(np.float32) * 255.0
        val_hr = rng.rand(bsz, 32, 32, 1).astype(np.float32) * 255.0
        tm.eval()
        with torch.no_grad():
            sr_t = tm(torch.from_numpy(
                val_lr.transpose(0, 3, 1, 2)).contiguous())
        sr_t = np.clip(np.round(sr_t.numpy()), 0, 255).transpose(0, 2, 3, 1)
        model = bundle.model
        sr_j = model.apply({"params": state.params["primal"]},
                           jax.numpy.asarray(val_lr), deterministic=True)
        sr_j = np.asarray(quantize(sr_j, 255.0))
        hr_j = jax.numpy.asarray(val_hr)
        p_ref = float(np.mean(np.asarray(psnr_shave4(
            jax.numpy.asarray(sr_t), hr_j, 255.0))))
        p_ours = float(np.mean(np.asarray(psnr_shave4(
            jax.numpy.asarray(sr_j), hr_j, 255.0))))
        assert p_ours == pytest.approx(p_ref, abs=0.05)
