"""Native C++ loader tests: build, decode parity vs PIL, Lanczos parity,
threaded batch correctness."""

import numpy as np
import pytest
from PIL import Image

from adsr_tpu.data import native_loader as nl

pytestmark = pytest.mark.skipif(not nl.available(),
                                reason="native library unavailable")


@pytest.fixture(scope="module")
def pngs(tmp_path_factory):
    root = tmp_path_factory.mktemp("pngs")
    rng = np.random.RandomState(0)
    paths = []
    for i, (h, w) in enumerate([(64, 48), (33, 57), (128, 128)]):
        arr = rng.randint(0, 256, (h, w, 3), np.uint8)
        p = root / f"img{i}.png"
        Image.fromarray(arr).save(p)
        paths.append((str(p), arr))
    gray = rng.randint(0, 256, (40, 40), np.uint8)
    gp = root / "gray.png"
    Image.fromarray(gray).save(gp)
    return paths, (str(gp), gray)


class TestDecode:
    def test_rgb_exact(self, pngs):
        for path, arr in pngs[0]:
            got = nl.decode_png(path)
            np.testing.assert_array_equal(got, arr)

    def test_gray_preserved(self, pngs):
        path, gray = pngs[1]
        got = nl.decode_png(path)
        assert got.shape == (40, 40)  # PIL-equivalent channel semantics
        np.testing.assert_array_equal(got, gray)

    def test_gray_force_rgb(self, pngs):
        path, gray = pngs[1]
        got = nl.decode_png(path, force_rgb=True)
        assert got.shape == (40, 40, 3)
        np.testing.assert_array_equal(got[..., 0], gray)
        np.testing.assert_array_equal(got[..., 1], gray)


class TestLanczosParity:
    @pytest.mark.parametrize("out_size", [(32, 32), (16, 24), (100, 80)])
    def test_matches_pil(self, pngs, out_size):
        _, arr = pngs[0][2]  # 128x128
        want = np.asarray(Image.fromarray(arr).resize(
            (out_size[1], out_size[0]), Image.LANCZOS))
        got = nl.resize_lanczos(arr, *out_size)
        diff = np.abs(want.astype(int) - got.astype(int))
        # fixed-point algorithm parity: nearly all bytes exact, none off by >1
        assert diff.max() <= 1
        assert (diff == 0).mean() > 0.98

    def test_upscale(self, pngs):
        _, arr = pngs[0][0]
        want = np.asarray(Image.fromarray(arr).resize((96, 128),
                                                      Image.LANCZOS))
        got = nl.resize_lanczos(arr, 128, 96)
        assert np.abs(want.astype(int) - got.astype(int)).max() <= 1


class TestBatch:
    def test_threaded_batch(self, pngs):
        paths = [p for p, _ in pngs[0]] * 3
        out = nl.load_batch(paths, 32, 32, threads=4)
        assert out.shape == (9, 32, 32, 3)
        # each output equals the single-image path
        one = nl.resize_lanczos(pngs[0][0][1], 32, 32)
        np.testing.assert_array_equal(out[0], one)
        np.testing.assert_array_equal(out[3], one)

    def test_no_resize_when_same_size(self, pngs):
        path, arr = pngs[0][2]
        out = nl.load_batch([path], 128, 128)
        np.testing.assert_array_equal(out[0], arr)

    def test_missing_file_errors(self):
        with pytest.raises(IOError):
            nl.load_batch(["/nonexistent.png"], 8, 8)


class TestNativePrepare:
    def test_native_prep_close_to_pil(self, tmp_path):
        from adsr_tpu.data.prepare import prepare_mvtec_dataset
        from adsr_tpu.data.synthetic import generate_synthetic_mvtec
        src = tmp_path / "mvtec"
        generate_synthetic_mvtec(str(src), classes=("grid",), n_train=3,
                                 n_test_good=1, n_test_bad_per_defect=1,
                                 size=64)
        prepare_mvtec_dataset(str(src), str(tmp_path / "pil"),
                              classes=("grid",), scale_factors=(2,),
                              target_hr=(32, 32))
        prepare_mvtec_dataset(str(src), str(tmp_path / "nat"),
                              classes=("grid",), scale_factors=(2,),
                              target_hr=(32, 32), use_native=True)
        a = sorted((tmp_path / "pil" / "grid/train/good/HR").glob("*.png"))
        b = sorted((tmp_path / "nat" / "grid/train/good/HR").glob("*.png"))
        assert [p.name for p in a] == [p.name for p in b]
        for pa, pb in zip(a, b):
            ia = np.asarray(Image.open(pa)).astype(int)
            ib = np.asarray(Image.open(pb)).astype(int)
            assert np.abs(ia - ib).max() <= 1
