"""Disk-based analysis pipeline tests (helpers.py / recall_1.py parity)."""

import numpy as np
import pytest
from PIL import Image

from adsr_tpu.eval.disk import analyze_window_sizes, specificity_report
from adsr_tpu.utils.image import histogram_equalization, min_max_scaling


@pytest.fixture(scope="module")
def saved_images(tmp_path_factory):
    """good pairs are near-identical; bad pairs differ strongly."""
    root = tmp_path_factory.mktemp("disk")
    rng = np.random.RandomState(0)
    for split, n, noise in (("good", 4, 3), ("bad", 4, 60)):
        (root / f"{split}_sr").mkdir()
        (root / f"{split}_hr").mkdir()
        for i in range(n):
            hr = rng.randint(40, 200, (24, 24), np.uint8)
            sr = np.clip(hr.astype(int) +
                         rng.randint(-noise, noise + 1, hr.shape), 0,
                         255).astype(np.uint8)
            Image.fromarray(hr).save(root / f"{split}_hr" / f"{i}_{i:03d}.png")
            Image.fromarray(sr).save(root / f"{split}_sr" / f"{i}_{i:03d}.png")
    return root


class TestAnalyzeWindowSizes:
    def test_separates_classes(self, saved_images):
        r = analyze_window_sizes(
            str(saved_images / "good_sr"), str(saved_images / "good_hr"),
            str(saved_images / "bad_sr"), str(saved_images / "bad_hr"),
            window_sizes=[3, 13])
        assert r["auc_ssim"] > 0.9
        assert r["auc_mse"] > 0.9
        assert r["auc_psnr"] > 0.9
        assert r["best_ws"] in (3, 13)

    def test_grouped(self, saved_images):
        r = analyze_window_sizes(
            str(saved_images / "good_sr"), str(saved_images / "good_hr"),
            str(saved_images / "bad_sr"), str(saved_images / "bad_hr"),
            window_sizes=[3], group_div=2)
        assert r["grouped"] and r["n_groups"] >= 2
        assert 0.0 <= r["auc_ssim"] <= 1.0


class TestSpecificityReport:
    def test_report(self):
        y = [0, 0, 1, 1]
        rep = specificity_report(y, {"m": [0.1, 0.6, 0.7, 0.9]})
        assert rep["m"]["threshold"] == 0.7
        assert rep["m"]["specificity"] == 1.0


class TestImageUtils:
    def test_min_max(self):
        x = np.array([2.0, 4.0, 6.0])
        np.testing.assert_allclose(min_max_scaling(x), [0, 0.5, 1.0])
        assert np.all(min_max_scaling(np.ones(3)) == 0)

    def test_hist_eq(self):
        img = np.random.RandomState(0).randint(100, 120, (16, 16), np.uint8)
        out = histogram_equalization(img)
        assert out.shape == img.shape
        assert out.max() > 200  # stretched to full range
