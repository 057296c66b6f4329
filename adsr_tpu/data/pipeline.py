"""Data pipeline: host-side dataset container + jitted device-side sampler.

The reference streams single images through DataLoader worker processes
(reference src/data.py:195-219). MVTec-scale datasets are a few hundred small
images, so the TPU-native design loads each split ONCE into dense arrays and
keeps them resident on device; per-batch work (gather, aligned random crop,
flip/transpose augmentation) is a single jitted graph — no host<->device
traffic in the epoch hot loop.

Reproduced reference semantics:
- filesystem scan candidates ``LR_bicubic/X{s}/{name}x{s}.png`` |
  ``LR_{s}/{name}.png`` | ``LR/{name}.png`` (data.py:109-134);
- channel rule: n_colors=1 converts RGB via the BT.601 YCbCr luma used by
  skimage (Y = 16 + 65.481R + 128.553G + 24.966B on [0,1] inputs, giving
  [16, 235]) (data.py:52-65); n_colors=3 repeats gray channels;
- pixel scaling ``* rgb_range / 255`` (data.py:11-19);
- epoch length ``test_every * batch_size`` with wraparound + random-tail
  indexing (data.py:101-107, 144-151);
- aligned multi-scale patch crop (align to the largest scale factor) and
  hflip/vflip/transpose augmentation, each with p=0.5 (data.py:21-50);
- test-time HR crop to ``lr_size * scale`` (data.py:176-181);
- LR list ordering: *descending* scale factor — lr[0] is the smallest image,
  the model input (data.py:75-76 reverses the scale list).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from pathlib import Path
from typing import Iterator, List, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


def rgb_to_ycbcr_y(img: np.ndarray) -> np.ndarray:
    """uint8 HxWx3 -> float32 HxW luma in [16, 235] (skimage rgb2ycbcr Y)."""
    x = img.astype(np.float32) / 255.0
    return 16.0 + 65.481 * x[..., 0] + 128.553 * x[..., 1] + 24.966 * x[..., 2]


def set_channel(img: np.ndarray, n_colors: int) -> np.ndarray:
    """Reference channel handling (data.py:52-65); returns float32 HxWxC."""
    if img.ndim == 2:
        img = img[..., None]
    c = img.shape[2]
    if n_colors == 1 and c >= 3:
        img = rgb_to_ycbcr_y(img[..., :3])[..., None]
    elif n_colors == 3 and c == 1:
        img = np.concatenate([img] * 3, axis=2)
    elif c == 4:
        img = img[..., :3]
    return np.ascontiguousarray(img, dtype=np.float32)


def _scan(data_dir: Path, scales_desc: Sequence[int]
          ) -> Tuple[List[Path], List[List[Path]]]:
    hr_files = sorted((data_dir / "HR").glob("*.png"))
    if not hr_files:
        raise FileNotFoundError(f"no HR images under {data_dir}/HR")
    lr_files: List[List[Path]] = [[] for _ in scales_desc]
    for f in hr_files:
        stem = f.stem
        for si, s in enumerate(scales_desc):
            cands = [
                data_dir / "LR_bicubic" / f"X{s}" / f"{stem}x{s}.png",
                data_dir / f"LR_{s}" / f"{stem}.png",
                data_dir / "LR" / f"{stem}.png",
            ]
            for cand in cands:
                if cand.exists():
                    lr_files[si].append(cand)
                    break
            else:
                raise FileNotFoundError(
                    f"LR image not found for {stem} at scale {s}: tried {cands}")
    return hr_files, lr_files


@dataclass
class SRDataset:
    """One split fully loaded: hr [N,H,W,C]; lrs[i] [N,H/s_i,W/s_i,C],
    scales_desc descending (lrs[0] = model input)."""
    hr: np.ndarray
    lrs: List[np.ndarray]
    scales_desc: Tuple[int, ...]
    filenames: List[str]
    rgb_range: float = 255.0

    @property
    def n(self) -> int:
        return self.hr.shape[0]

    def device_arrays(self) -> Tuple[List[jnp.ndarray], jnp.ndarray]:
        return [jnp.asarray(l) for l in self.lrs], jnp.asarray(self.hr)


def load_sr_dataset(data_dir: str, scales: Sequence[int], n_colors: int,
                    rgb_range: float = 255.0) -> SRDataset:
    """Load a split directory (train/good, val/good, test/bad, ...).

    ``scales`` ascending as configured; stored descending per the reference.

    PNG decode goes through the native C++ loader when available (bit-exact
    with PIL, threaded); PIL otherwise.
    """
    from PIL import Image

    scales_desc = tuple(sorted(set(int(s) for s in scales), reverse=True))
    root = Path(data_dir)
    hr_files, lr_files = _scan(root, scales_desc)

    from adsr_tpu.data import native_loader as nl
    use_native = nl.available()

    def read(path: Path) -> np.ndarray:
        if use_native:
            return nl.decode_png(str(path))
        with Image.open(path) as im:
            return np.asarray(im)

    pixel_scale = rgb_range / 255.0
    hr = np.stack([set_channel(read(f), n_colors) for f in hr_files])
    hr *= pixel_scale
    max_s = scales_desc[0]
    # test-time HR crop to lr_size * max_scale (data.py:176-181)
    lh, lw = None, None
    lrs = []
    for si, s in enumerate(scales_desc):
        arr = np.stack([set_channel(read(f), n_colors) for f in lr_files[si]])
        arr *= pixel_scale
        lrs.append(arr)
        if si == 0:
            lh, lw = arr.shape[1], arr.shape[2]
    hr = hr[:, :lh * max_s, :lw * max_s]
    return SRDataset(hr=hr, lrs=lrs, scales_desc=scales_desc,
                     filenames=[f.stem for f in hr_files],
                     rgb_range=rgb_range)


# --------------------------------------------------------------------------- #
# Jitted per-batch crop + augment
# --------------------------------------------------------------------------- #

def _augment_one(img: jnp.ndarray, hflip, vflip, rot) -> jnp.ndarray:
    img = jnp.where(hflip, img[:, ::-1, :], img)
    img = jnp.where(vflip, img[::-1, :, :], img)
    return jnp.where(rot, jnp.swapaxes(img, 0, 1), img)


@partial(jax.jit, static_argnames=("patch_size", "scales_desc", "augment"))
def sample_batch(hr: jnp.ndarray, lrs: Tuple[jnp.ndarray, ...],
                 idx: jnp.ndarray, key: jax.Array, patch_size: int,
                 scales_desc: Tuple[int, ...], augment: bool
                 ) -> Tuple[List[jnp.ndarray], jnp.ndarray]:
    """Gather a batch, take aligned random crops, apply augmentation.

    Returns (list of LR batches descending scale, HR batch), float32.
    """
    hrb = jnp.take(hr, idx, axis=0)
    lrbs = [jnp.take(l, idx, axis=0) for l in lrs]
    b = idx.shape[0]
    th, tw = hr.shape[1], hr.shape[2]
    tp = patch_size
    align = scales_desc[0]

    keys = jax.random.split(key, b)

    def one(args):
        h_img, l_imgs, k = args
        kx, ky, kh, kv, kr = jax.random.split(k, 5)
        tx = jax.random.randint(kx, (), 0, tw - tp + 1)
        ty = jax.random.randint(ky, (), 0, th - tp + 1)
        tx = tx - tx % align
        ty = ty - ty % align
        h_crop = lax.dynamic_slice(h_img, (ty, tx, 0),
                                   (tp, tp, h_img.shape[-1]))
        l_crops = [
            lax.dynamic_slice(li, (ty // s, tx // s, 0),
                              (tp // s, tp // s, li.shape[-1]))
            for li, s in zip(l_imgs, scales_desc)
        ]
        if augment:
            hf = jax.random.bernoulli(kh)
            vf = jax.random.bernoulli(kv)
            rt = jax.random.bernoulli(kr)
            h_crop = _augment_one(h_crop, hf, vf, rt)
            l_crops = [_augment_one(c, hf, vf, rt) for c in l_crops]
        return h_crop, tuple(l_crops)

    h_out, l_out = jax.vmap(one)((hrb, tuple(lrbs), keys))
    return list(l_out), h_out


class EpochSampler:
    """Reproduces the reference's epoch indexing + shuffling on top of the
    jitted sampler. Deterministic given (seed, epoch)."""

    def __init__(self, dataset: SRDataset, batch_size: int, test_every: int,
                 patch_size: int, no_augment: bool, seed: int = 1):
        self.ds = dataset
        self.batch_size = batch_size
        self.patch_size = patch_size
        self.augment = not no_augment
        self.seed = seed
        n = dataset.n
        self.dataset_length = test_every * batch_size
        repeat = self.dataset_length // n
        self.random_border = n * repeat
        self._lrs, self._hr = dataset.device_arrays()

    @property
    def batches_per_epoch(self) -> int:
        return self.dataset_length // self.batch_size

    def epoch(self, epoch_idx: int) -> Iterator[Tuple[List[jnp.ndarray], jnp.ndarray]]:
        n = self.ds.n
        rng = np.random.RandomState((self.seed * 9973 + epoch_idx) % (2 ** 31))
        base = np.arange(self.random_border) % n
        tail = rng.randint(0, n, size=self.dataset_length - self.random_border)
        order = np.concatenate([base, tail])
        rng.shuffle(order)
        key = jax.random.fold_in(jax.random.key(self.seed), epoch_idx)
        for b in range(self.batches_per_epoch):
            idx = jnp.asarray(order[b * self.batch_size:(b + 1) * self.batch_size])
            bkey = jax.random.fold_in(key, b)
            yield sample_batch(self._hr, tuple(self._lrs), idx, bkey,
                               self.patch_size, self.ds.scales_desc,
                               self.augment)
