"""Data layer tests: synthetic fixtures -> prep tool -> pipeline semantics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adsr_tpu.data.pipeline import (
    EpochSampler, load_sr_dataset, rgb_to_ycbcr_y, sample_batch, set_channel,
)
from adsr_tpu.data.prepare import expand_scales, prepare_mvtec_dataset, \
    verify_dataset_structure
from adsr_tpu.data.synthetic import generate_synthetic_mvtec


@pytest.fixture(scope="module")
def prepared(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    src = root / "mvtec"
    dst = root / "mvtec_32"
    generate_synthetic_mvtec(str(src), classes=("grid",), n_train=6,
                             n_test_good=3, n_test_bad_per_defect=2, size=64)
    prepare_mvtec_dataset(str(src), str(dst), classes=("grid",),
                          scale_factors=(2, 4), target_hr=(32, 32))
    return dst


class TestPrepare:
    def test_expand_scales(self):
        assert expand_scales([4]) == (2, 4)
        assert expand_scales([8]) == (2, 4, 8)
        assert expand_scales([4, 8]) == (2, 4, 8)

    def test_structure(self, prepared):
        rep = verify_dataset_structure(str(prepared), classes=("grid",))["grid"]
        # 6 train images, 10% val (min 1) -> 5 train, 1 val
        assert rep["train/good"] == 5
        assert rep["val/good"] == 1
        assert rep["test/good"] == 3
        assert rep["test/bad"] == 4  # 2 defects x 2 images, merged
        # bad names carry the defect prefix
        bad = sorted(p.name for p in
                     (prepared / "grid/test/bad/HR").glob("*.png"))
        assert all("_" in n for n in bad)

    def test_lr_sizes(self, prepared):
        from PIL import Image
        lr4 = next((prepared / "grid/train/good/LR_4").glob("*.png"))
        assert Image.open(lr4).size == (8, 8)
        lr2 = next((prepared / "grid/train/good/LR_2").glob("*.png"))
        assert Image.open(lr2).size == (16, 16)


class TestChannels:
    def test_luma_range(self):
        img = np.zeros((4, 4, 3), np.uint8)
        assert np.allclose(rgb_to_ycbcr_y(img), 16.0)
        img255 = np.full((4, 4, 3), 255, np.uint8)
        assert np.allclose(rgb_to_ycbcr_y(img255), 235.0, atol=0.01)

    def test_matches_itu_oracle(self):
        # pin the luma transform against the ITU-R BT.601 definition
        # directly — the SAME formula skimage.color.rgb2ycbcr implements
        # (Y' = 16 + (65.481 R + 128.553 G + 24.966 B), R/G/B in [0,1]);
        # skimage itself is absent in this image, so the definition IS the
        # oracle (a skimage cross-check lived here through round 4 but had
        # never executed anywhere — deleted as a dead skip)
        img = np.random.RandomState(0).randint(0, 256, (16, 16, 3), np.uint8)
        rgb = img.astype(np.float64) / 255.0
        want = (16.0 + 65.481 * rgb[..., 0] + 128.553 * rgb[..., 1]
                + 24.966 * rgb[..., 2])
        np.testing.assert_allclose(rgb_to_ycbcr_y(img), want, atol=1e-3)

    def test_set_channel_rules(self):
        rgb = np.random.RandomState(0).randint(0, 256, (8, 8, 3), np.uint8)
        assert set_channel(rgb, 1).shape == (8, 8, 1)
        gray = rgb[..., :1]
        assert set_channel(gray, 3).shape == (8, 8, 3)
        assert set_channel(rgb[..., 0], 1).shape == (8, 8, 1)


class TestPipeline:
    def test_load_and_order(self, prepared):
        ds = load_sr_dataset(str(prepared / "grid/train/good"), (2, 4), 1)
        assert ds.scales_desc == (4, 2)
        assert ds.hr.shape == (5, 32, 32, 1)
        assert ds.lrs[0].shape == (5, 8, 8, 1)   # smallest first = model input
        assert ds.lrs[1].shape == (5, 16, 16, 1)
        # luma range sanity
        assert 16.0 <= ds.hr.min() and ds.hr.max() <= 235.5

    def test_epoch_semantics(self, prepared):
        ds = load_sr_dataset(str(prepared / "grid/train/good"), (2, 4), 1)
        s = EpochSampler(ds, batch_size=2, test_every=4, patch_size=32,
                         no_augment=True, seed=1)
        assert s.dataset_length == 8
        assert s.batches_per_epoch == 4
        batches = list(s.epoch(0))
        assert len(batches) == 4
        lrs, hr = batches[0]
        assert hr.shape == (2, 32, 32, 1)
        assert lrs[0].shape == (2, 8, 8, 1)
        assert lrs[1].shape == (2, 16, 16, 1)

    def test_determinism(self, prepared):
        ds = load_sr_dataset(str(prepared / "grid/train/good"), (4,), 1)
        s = EpochSampler(ds, 2, 2, 32, no_augment=False, seed=7)
        a = [np.asarray(h) for _, h in s.epoch(3)]
        b = [np.asarray(h) for _, h in s.epoch(3)]
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)
        c = [np.asarray(h) for _, h in s.epoch(4)]
        assert any(not np.array_equal(x, y) for x, y in zip(a, c))

    def test_aligned_crop(self):
        # patch smaller than image: crops must be aligned and consistent
        rng = np.random.RandomState(0)
        hr = rng.rand(3, 16, 16, 1).astype(np.float32)
        lr4 = hr[:, ::4, ::4, :]  # fake LR by subsampling: crop alignment check
        lr2 = hr[:, ::2, ::2, :]
        out_lrs, out_hr = sample_batch(
            jnp.asarray(hr), (jnp.asarray(lr4), jnp.asarray(lr2)),
            jnp.asarray([0, 1, 2]), jax.random.key(0), 8, (4, 2), False)
        assert out_hr.shape == (3, 8, 8, 1)
        assert out_lrs[0].shape == (3, 2, 2, 1)
        assert out_lrs[1].shape == (3, 4, 4, 1)
        # alignment: lr crop pixels must be the subsampled hr crop pixels
        np.testing.assert_allclose(np.asarray(out_lrs[0]),
                                   np.asarray(out_hr)[:, ::4, ::4, :])

    def test_augment_consistency(self):
        # with augmentation on, LR and HR transform identically. Use 2x2
        # block-average LR (pooling commutes with flips/transpose, unlike
        # subsampling) so the consistency check is exact.
        rng = np.random.RandomState(1)
        hr = rng.rand(4, 8, 8, 1).astype(np.float32)
        lr = hr.reshape(4, 4, 2, 4, 2, 1).mean(axis=(2, 4))
        out_lrs, out_hr = sample_batch(
            jnp.asarray(hr), (jnp.asarray(lr),), jnp.asarray([0, 1, 2, 3]),
            jax.random.key(3), 8, (2,), True)
        pooled = np.asarray(out_hr).reshape(4, 4, 2, 4, 2, 1).mean(axis=(2, 4))
        np.testing.assert_allclose(np.asarray(out_lrs[0]), pooled, atol=1e-6)


class TestScanFallbacks:
    """LR path candidates: LR_bicubic/X{s}, LR_{s}, LR (data.py:109-134)."""

    def _make(self, tmp_path, style):
        from PIL import Image
        rng = np.random.RandomState(0)
        hr_dir = tmp_path / "HR"
        hr_dir.mkdir(parents=True)
        for i in range(2):
            Image.fromarray(rng.randint(0, 255, (16, 16, 3), np.uint8)
                            ).save(hr_dir / f"img{i}.png")
            lr = rng.randint(0, 255, (8, 8, 3), np.uint8)
            if style == "bicubic":
                d = tmp_path / "LR_bicubic" / "X2"
                d.mkdir(parents=True, exist_ok=True)
                Image.fromarray(lr).save(d / f"img{i}x2.png")
            elif style == "simple":
                d = tmp_path / "LR_2"
                d.mkdir(exist_ok=True)
                Image.fromarray(lr).save(d / f"img{i}.png")
            else:
                d = tmp_path / "LR"
                d.mkdir(exist_ok=True)
                Image.fromarray(lr).save(d / f"img{i}.png")

    @pytest.mark.parametrize("style", ["bicubic", "simple", "plain"])
    def test_styles(self, tmp_path, style):
        self._make(tmp_path, style)
        ds = load_sr_dataset(str(tmp_path), (2,), 1)
        assert ds.n == 2
        assert ds.lrs[0].shape == (2, 8, 8, 1)

    def test_missing_lr_raises(self, tmp_path):
        from PIL import Image
        (tmp_path / "HR").mkdir()
        Image.fromarray(np.zeros((8, 8), np.uint8)).save(
            tmp_path / "HR" / "a.png")
        with pytest.raises(FileNotFoundError):
            load_sr_dataset(str(tmp_path), (2,), 1)

    def test_hr_cropped_to_lr_multiple(self, tmp_path):
        """HR larger than lr*scale is cropped (data.py:176-181)."""
        from PIL import Image
        (tmp_path / "HR").mkdir()
        (tmp_path / "LR_2").mkdir()
        rng = np.random.RandomState(0)
        Image.fromarray(rng.randint(0, 255, (19, 17), np.uint8)).save(
            tmp_path / "HR" / "a.png")
        Image.fromarray(rng.randint(0, 255, (8, 8), np.uint8)).save(
            tmp_path / "LR_2" / "a.png")
        ds = load_sr_dataset(str(tmp_path), (2,), 1)
        assert ds.hr.shape == (1, 16, 16, 1)
