"""Offline MVTec -> SR-layout converter.

Semantics parity with the reference prep tool
(reference scripts/prepare_mvtec_data.py):
- LANCZOS resize every image to the HR size; LR = HR // s LANCZOS downscale
  (prepare_mvtec_data.py:22-33);
- train/val split: RandomState(seed).shuffle, first ``val_ratio`` fraction is
  val (min 1) (prepare_mvtec_data.py:70-75);
- test: good -> test/good; every defect dir merged into test/bad with
  ``{defect}_{name}.png`` names (prepare_mvtec_data.py:132-152);
- progressive LR: always include LR_2; scale 8 additionally ensures LR_4
  (prepare_mvtec_data.py:286-291).

Output layout per class:
    <target>/<classe>/{train,val}/good/{HR,LR_s}/*.png
    <target>/<classe>/test/{good,bad}/{HR,LR_s}/*.png
"""

from __future__ import annotations

import shutil
from pathlib import Path
from typing import Iterable, Sequence, Tuple

import numpy as np
from PIL import Image


def resize_image(path: Path, target: Tuple[int, int]) -> Image.Image:
    with Image.open(path) as img:
        if img.mode != "RGB":
            img = img.convert("RGB")
        return img.resize(target, Image.LANCZOS)


def lr_from_hr(hr: Image.Image, scale: int) -> Image.Image:
    return hr.resize((hr.size[0] // scale, hr.size[1] // scale), Image.LANCZOS)


def expand_scales(user_scales: Iterable[int]) -> Tuple[int, ...]:
    """Progressive-LR rule: always LR_2; 8 implies 4 (prepare_mvtec_data.py:286-291)."""
    scales = set(int(s) for s in user_scales)
    scales.add(2)
    if 8 in scales:
        scales.add(4)
    return tuple(sorted(scales))


def _save_pairs(files: Sequence[Path], base: Path, scales: Sequence[int],
                target_hr: Tuple[int, int], rename=None,
                use_native: bool = False) -> None:
    if use_native:
        from adsr_tpu.data import native_loader as nl
        use_native = nl.available()
    for f in files:
        name = rename(f) if rename else f.name
        hr_path = base / "HR" / name
        hr_path.parent.mkdir(parents=True, exist_ok=True)
        if use_native:
            from PIL import Image
            from adsr_tpu.data import native_loader as nl
            src = nl.decode_png(str(f), force_rgb=True)
            hr_arr = nl.resize_lanczos(src, target_hr[1], target_hr[0])
            Image.fromarray(hr_arr).save(hr_path)
            for s in scales:
                lr_path = base / f"LR_{s}" / name
                lr_path.parent.mkdir(parents=True, exist_ok=True)
                lr = nl.resize_lanczos(hr_arr, target_hr[1] // s,
                                       target_hr[0] // s)
                Image.fromarray(lr).save(lr_path)
            continue
        hr = resize_image(f, target_hr)
        hr.save(hr_path)
        for s in scales:
            lr_path = base / f"LR_{s}" / name
            lr_path.parent.mkdir(parents=True, exist_ok=True)
            lr_from_hr(hr, s).save(lr_path)


def prepare_mvtec_dataset(source_base: str = "data/mvtec",
                          target_base: str = "data/mvtec_128",
                          classes: Sequence[str] = ("carpet", "grid"),
                          scale_factors: Sequence[int] = (2, 4),
                          target_hr: Tuple[int, int] = (128, 128),
                          val_ratio: float = 0.1, seed: int = 42,
                          clean: bool = True,
                          use_native: bool = False,
                          layout: str = "mvtec") -> None:
    """use_native switches to the C++ decode+Lanczos path (threadable, within
    1 LSB of PIL); default stays PIL for byte parity with reference prep.

    ``layout='gkd'`` writes the train split under the GKD path convention
    the train CLI derives for ``--dataset gkd`` —
    ``{classe}/train/HR_{resolution}/{HR,LR_s}`` (core/config.py
    _dataset_paths; reference notebooks/test.ipynb "GKD Dataset
    Preparation" builds this tree from the private part scans). val/test
    keep the shared {split}/{good,bad} convention every evaluator reads."""
    src, dst = Path(source_base), Path(target_base)
    if clean and dst.exists():
        shutil.rmtree(dst)

    for classe in classes:
        train_src = src / classe / "train" / "good"
        test_src = src / classe / "test"

        if train_src.exists():
            files = sorted(train_src.glob("*.png"))
            files = list(files)
            rng = np.random.RandomState(seed)
            rng.shuffle(files)
            val_size = int(len(files) * float(val_ratio))
            if len(files) > 1 and val_ratio > 0:
                val_size = max(1, val_size)
            val_files, train_files = files[:val_size], files[val_size:]
            train_dst = (dst / classe / "train" / "good"
                         if layout == "mvtec"
                         else dst / classe / "train" / f"HR_{target_hr[0]}")
            _save_pairs(train_files, train_dst,
                        scale_factors, target_hr, use_native=use_native)
            _save_pairs(val_files, dst / classe / "val" / "good",
                        scale_factors, target_hr, use_native=use_native)

        if test_src.exists():
            good = sorted((test_src / "good").glob("*.png")) \
                if (test_src / "good").exists() else []
            _save_pairs(good, dst / classe / "test" / "good",
                        scale_factors, target_hr, use_native=use_native)
            defect_dirs = sorted(d for d in test_src.iterdir()
                                 if d.is_dir() and d.name != "good")
            for d in defect_dirs:
                _save_pairs(sorted(d.glob("*.png")),
                            dst / classe / "test" / "bad",
                            scale_factors, target_hr,
                            rename=lambda f, dn=d.name: f"{dn}_{f.name}",
                            use_native=use_native)


def verify_dataset_structure(base_dir: str,
                             classes: Sequence[str] = ("carpet", "grid"),
                             layout: str = "mvtec",
                             hr_size: int = 128) -> dict:
    """Count images per split; returns {classe: {split: count}}."""
    base = Path(base_dir)
    train_split = ("train/good" if layout == "mvtec"
                   else f"train/HR_{hr_size}")
    report = {}
    for classe in classes:
        counts = {}
        for split in (train_split, "val/good", "test/good", "test/bad"):
            hr = base / classe / split / "HR"
            counts[split] = len(list(hr.glob("*.png"))) if hr.exists() else 0
        report[classe] = counts
    return report
