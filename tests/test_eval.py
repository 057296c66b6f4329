"""Evaluator tests: ROC-AUC vs sklearn oracle, run-dir inference, thresholds."""

import numpy as np
import pytest

from adsr_tpu.eval.auc import (
    min_distance_threshold, perfect_recall_threshold, roc_auc, roc_curve,
    specificity_at, youden_threshold,
)
from adsr_tpu.eval.evaluate import grouped_max_scores, window_size_candidates
from adsr_tpu.eval.rundir import infer_from_run_dir, resolve_checkpoint


class TestAuc:
    def test_matches_sklearn(self):
        from sklearn.metrics import roc_auc_score
        rng = np.random.RandomState(0)
        for _ in range(10):
            y = rng.randint(0, 2, 50)
            if y.min() == y.max():
                continue
            s = rng.rand(50)
            assert roc_auc(y, s) == pytest.approx(roc_auc_score(y, s),
                                                  abs=1e-12)

    def test_matches_sklearn_with_ties(self):
        from sklearn.metrics import roc_auc_score
        rng = np.random.RandomState(1)
        y = rng.randint(0, 2, 100)
        s = rng.randint(0, 5, 100).astype(float)  # heavy ties
        assert roc_auc(y, s) == pytest.approx(roc_auc_score(y, s), abs=1e-12)

    def test_perfect_separation(self):
        y = [0, 0, 1, 1]
        assert roc_auc(y, [0.1, 0.2, 0.8, 0.9]) == 1.0
        assert roc_auc(y, [0.9, 0.8, 0.2, 0.1]) == 0.0

    def test_single_class_raises(self):
        with pytest.raises(ValueError):
            roc_auc([1, 1], [0.1, 0.2])


class TestThresholds:
    def test_perfect_recall(self):
        y = [0, 1, 0, 1]
        s = [0.1, 0.5, 0.3, 0.9]
        assert perfect_recall_threshold(y, s) == 0.5

    def test_youden_and_distance(self):
        y = [0, 0, 0, 1, 1, 1]
        s = [0.1, 0.2, 0.3, 0.7, 0.8, 0.9]
        t = youden_threshold(y, s)
        assert 0.3 < t <= 0.7
        t2 = min_distance_threshold(y, s)
        assert 0.3 < t2 <= 0.7

    def test_specificity(self):
        y = [0, 0, 1, 1]
        s = [0.1, 0.6, 0.7, 0.9]
        assert specificity_at(y, s, 0.65) == 1.0
        assert specificity_at(y, s, 0.5) == 0.5


class TestWindowSweep:
    def test_candidates(self):
        assert window_size_candidates(32) == [3, 13, 23]
        assert window_size_candidates(128) == list(range(3, 126, 10))
        assert window_size_candidates(5) == [3]

    def test_grouped_scores(self):
        names = ["0_a", "7_b", "14_c", "20_d"]
        scores = [0.1, 0.9, 0.5, 0.2]
        y = [0, 0, 1, 1]
        labels, out = grouped_max_scores(names, scores, y, group_div=14)
        # group 0 (good): max(0.1, 0.9); group 1 (bad): max(0.5, 0.2)
        assert labels == [0, 1]
        assert out == [0.9, 0.5]


class TestRunDir:
    def test_name_pattern(self, tmp_path):
        d = tmp_path / "drct" / "mvtec_grid_128_X4_tag"
        d.mkdir(parents=True)
        r = infer_from_run_dir(str(d))
        assert r["model_type"] == "drct"
        assert r["dataset"] == "mvtec"
        assert r["classe"] == "grid"
        assert r["resolution"] == 128
        assert r["scale"] == 4

    def test_config_txt_overrides(self, tmp_path):
        d = tmp_path / "run"
        d.mkdir()
        (d / "config.txt").write_text(
            "model_name: drn-l\ndataset: mvtec\nclasse: carpet\n"
            "patch_size: 256\nscale: [2, 4]\n")
        r = infer_from_run_dir(str(d))
        assert r["model_type"] == "drn-l"
        assert r["classe"] == "carpet"
        assert r["resolution"] == 256
        assert r["scale"] == 4  # last int in the list

    def test_resolve_checkpoint(self, tmp_path):
        d = tmp_path / "run" / "model"
        d.mkdir(parents=True)
        (d / "model_latest.msgpack").write_bytes(b"x")
        assert resolve_checkpoint(str(tmp_path / "run")).endswith(
            "model_latest.msgpack")
        (d / "model_best.msgpack").write_bytes(b"x")
        assert resolve_checkpoint(str(tmp_path / "run")).endswith(
            "model_best.msgpack")
        with pytest.raises(FileNotFoundError):
            resolve_checkpoint(str(tmp_path / "nope"))


class TestVisualArtifacts:
    def test_roc_curve_pdf(self, tmp_path):
        from adsr_tpu.eval.visual import save_roc_curves
        y = [0, 0, 1, 1]
        path = save_roc_curves(str(tmp_path / "roc.pdf"), y, {
            "a": [0.1, 0.2, 0.8, 0.9], "b": [0.3, 0.1, 0.4, 0.2]})
        import os
        assert os.path.getsize(path) > 0

    def test_heatmaps_written(self, tmp_path):
        from adsr_tpu.eval.visual import save_heatmaps
        rng = np.random.RandomState(0)
        hr = (rng.rand(3, 24, 24, 1) * 255).astype(np.uint8)
        sr = (rng.rand(3, 24, 24, 1) * 255).astype(np.uint8)
        n = save_heatmaps(str(tmp_path), hr, sr, ["a", "b", "c"],
                          ["good", "bad", "bad"], window=5, max_images=1)
        assert n == 2  # one per split
        assert (tmp_path / "heatmaps" / "good" / "a.png").exists()
        assert (tmp_path / "heatmaps" / "bad" / "b.png").exists()
