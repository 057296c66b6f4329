"""EfficientAD student-teacher training pipeline (reference src/efficientAD.py).

TPU-native re-implementation of the legacy/experimental baseline:
- dataset: raw MVTec-style tree (train/good, test/<defect>), images resized to
  256 and ImageNet-normalised (efficientAD.py:688-693); the autoencoder branch
  sees a color-jittered copy (RandomChoice of brightness/contrast/saturation
  +-0.2 — efficientAD.py:694-698) applied on device;
- teacher channel normalization: two passes over the train set for channel
  mean/std (efficientAD.py:152-178);
- train step (efficientAD.py:460-496): hard-feature loss at the 0.999 quantile
  of (teacher - student)^2, plus AE reconstruction and student-AE losses,
  Adam(lr 1e-4, wd 1e-5) with StepLR x0.1 at 95% of train_steps — all one
  jitted graph;
- map normalization via 0.9/0.995 quantiles on validation maps
  (efficientAD.py:311-333); combined map = 0.5*st + 0.5*ae
  (efficientAD.py:292-309); image score = max of the combined map;
- AUC-plateau early stopping (efficientAD.py:335-350) and final metrics:
  optimal threshold, accuracy/precision/recall/F1 (efficientAD.py:644-659).

The reference requires pretrained teacher weights (efficientAD.py:429-430);
in this environment none are shipped, so the teacher either loads a converted
msgpack checkpoint or starts random — flagged in logs, AUC comparisons against
the reference's pretrained-teacher numbers only hold with real weights.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from pathlib import Path
from typing import Dict, List, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax
from flax import struct

from adsr_tpu.eval.auc import min_distance_threshold, roc_auc
from adsr_tpu.models.efficientad import Autoencoder, PDN

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


@dataclasses.dataclass(frozen=True)
class EADConfig:
    train_steps: int = 70000
    batch_size: int = 12
    lr: float = 1e-4
    weight_decay: float = 1e-5
    out_channels: int = 384
    image_size: int = 256
    model_size: str = "small"
    patience: int = 3
    min_delta: float = 0.004
    eval_every: int = 10        # intermediate eval cadence after warmup
    eval_after: int = 700
    seed: int = 1
    # opt-in ImageNet pretraining penalty: student features on out-of-domain
    # images are pushed to zero (efficientAD.py:362-364, 475-480)
    pretrain_penalty: bool = False


# --------------------------------------------------------------------------- #
# Data
# --------------------------------------------------------------------------- #

def load_image_folder(root: str, image_size: int
                      ) -> Tuple[np.ndarray, List[str], List[str]]:
    """Load every PNG under root/<subdir>/ as [N,H,W,3] float32 in [0,1].

    Returns (images, subdir_labels, paths) sorted for determinism.
    """
    from PIL import Image
    rootp = Path(root)
    files = sorted(p for p in rootp.glob("*/*") if p.suffix.lower()
                   in (".png", ".jpg", ".jpeg", ".bmp", ".tif", ".tiff"))
    if not files:
        raise FileNotFoundError(f"no images under {root}/*/")
    imgs, labels, paths = [], [], []
    for f in files:
        with Image.open(f) as im:
            im = im.convert("RGB").resize((image_size, image_size),
                                          Image.BILINEAR)
            imgs.append(np.asarray(im, np.float32) / 255.0)
        labels.append(f.parent.name)
        paths.append(str(f))
    return np.stack(imgs), labels, paths


def normalize_imagenet(x: jnp.ndarray) -> jnp.ndarray:
    return (x - IMAGENET_MEAN) / IMAGENET_STD


def color_jitter_ae(x: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
    """RandomChoice of brightness/contrast/saturation jitter +-0.2 per image,
    applied to [B,H,W,3] images in [0,1] (efficientAD.py:694-698)."""
    b = x.shape[0]
    kc, kf = jax.random.split(key)
    choice = jax.random.randint(kc, (b,), 0, 3)
    factor = jax.random.uniform(kf, (b,), minval=0.8, maxval=1.2)
    gray_w = jnp.asarray([0.299, 0.587, 0.114], x.dtype)
    gray = jnp.tensordot(x, gray_w, axes=([3], [0]))[..., None]

    f = factor[:, None, None, None]
    brightness = jnp.clip(x * f, 0.0, 1.0)
    mean_gray = jnp.mean(gray, axis=(1, 2, 3), keepdims=True)
    contrast = jnp.clip((x - mean_gray) * f + mean_gray, 0.0, 1.0)
    saturation = jnp.clip(gray + (x - gray) * f, 0.0, 1.0)

    c = choice[:, None, None, None]
    return jnp.where(c == 0, brightness,
                     jnp.where(c == 1, contrast, saturation))


def random_grayscale(x: jnp.ndarray, key: jax.Array,
                     p: float = 0.3) -> jnp.ndarray:
    """Per-image RandomGrayscale(p) on [B,H,W,3] in [0,1] — the penalty
    transform's torchvision.RandomGrayscale(0.3) (efficientAD.py:404-410)."""
    gray_w = jnp.asarray([0.299, 0.587, 0.114], x.dtype)
    gray = jnp.tensordot(x, gray_w, axes=([3], [0]))[..., None]
    pick = jax.random.bernoulli(key, p, (x.shape[0], 1, 1, 1))
    return jnp.where(pick, jnp.broadcast_to(gray, x.shape), x)


def load_penalty_folder(root: str, image_size: int,
                        max_images: int = 4096,
                        seed: int = 0) -> "np.ndarray":
    """Load ImageNet-penalty images: Resize(2s) + CenterCrop(s)
    (efficientAD.py:402-410); the per-draw RandomGrayscale(0.3) runs inside
    the train step via :func:`random_grayscale`.

    The decoded pool is device-resident float32 (~s*s*12 bytes per image —
    0.75 MB at 256px), so pointing this at a full ImageNet train split would
    exhaust host RAM; instead a deterministic sample of ``max_images`` files
    (seeded shuffle of the sorted list) is decoded. The reference streams
    one penalty image per step via a DataLoader (efficientAD.py:455-458), so
    a few thousand distinct images reproduce the penalty statistics;
    ``max_images<=0`` disables the cap."""
    from PIL import Image
    rootp = Path(root)
    files = sorted(p for p in rootp.rglob("*") if p.suffix.lower()
                   in (".png", ".jpg", ".jpeg", ".bmp"))
    if not files:
        raise FileNotFoundError(f"no penalty images under {root}")
    if max_images and max_images > 0 and len(files) > max_images:
        files = list(np.random.RandomState(seed)
                     .permutation(np.asarray(files, dtype=object))
                     [:max_images])
    s = image_size
    imgs = []
    for f in files:
        with Image.open(f) as im:
            im = im.convert("RGB").resize((2 * s, 2 * s), Image.BILINEAR)
            arr = np.asarray(im, np.float32) / 255.0
        imgs.append(arr[s // 2:s // 2 + s, s // 2:s // 2 + s])
    return np.stack(imgs)


# --------------------------------------------------------------------------- #
# Trainer
# --------------------------------------------------------------------------- #

class EADState(struct.PyTreeNode):
    step: jnp.ndarray
    student: dict
    autoencoder: dict
    opt_state: tuple


class EfficientADTrainer:
    def __init__(self, cfg: EADConfig, log=print):
        self.cfg = cfg
        self.log = log
        self.teacher = PDN(cfg.out_channels, cfg.model_size)
        self.student = PDN(2 * cfg.out_channels, cfg.model_size)
        self.autoencoder = Autoencoder(cfg.out_channels)

        key = jax.random.key(cfg.seed)
        dummy = jnp.zeros((1, cfg.image_size, cfg.image_size, 3))
        from adsr_tpu.models.factory import fast_init
        self.teacher_params = fast_init(
            self.teacher.init, jax.random.fold_in(key, 0), dummy)["params"]
        student_params = fast_init(
            self.student.init, jax.random.fold_in(key, 1), dummy)["params"]
        ae_params = fast_init(
            self.autoencoder.init, jax.random.fold_in(key, 2),
            dummy)["params"]

        self.optimizer = optax.chain(
            optax.add_decayed_weights(cfg.weight_decay),
            optax.scale_by_adam(),
        )
        opt_state = self.optimizer.init(
            {"student": student_params, "autoencoder": ae_params})
        self.state = EADState(step=jnp.asarray(0), student=student_params,
                              autoencoder=ae_params, opt_state=opt_state)
        self.teacher_mean = jnp.zeros((1, 1, 1, cfg.out_channels))
        self.teacher_std = jnp.ones((1, 1, 1, cfg.out_channels))
        self._build_jits()

    # ------------------------------------------------------------------ #

    def load_teacher(self, path: str) -> None:
        from adsr_tpu.io.journal import load_params
        self.teacher_params = load_params(path, self.teacher_params)
        self.log(f"Loaded teacher weights from {path}")

    def _build_jits(self):
        cfg = self.cfg
        teacher, student, ae = self.teacher, self.student, self.autoencoder

        @jax.jit
        def teacher_fwd(tp, x):
            return teacher.apply({"params": tp}, normalize_imagenet(x))

        def make_train_step(with_penalty: bool):
            @partial(jax.jit, donate_argnums=(0,))
            def train_step(state: EADState, tp, t_mean, t_std, img_st,
                           img_ae, lr_rate, rng, *penalty):
                t_out_st = teacher.apply({"params": tp},
                                         normalize_imagenet(img_st))
                t_out_st = (t_out_st - t_mean) / t_std
                img_ae_j = color_jitter_ae(img_ae, rng)
                t_out_ae = teacher.apply({"params": tp},
                                         normalize_imagenet(img_ae_j))
                t_out_ae = (t_out_ae - t_mean) / t_std
                if with_penalty:
                    img_pen = random_grayscale(
                        penalty[0], jax.random.fold_in(rng, 7))

                def loss_fn(params):
                    s_out = student.apply({"params": params["student"]},
                                          normalize_imagenet(img_st))
                    d_st = (t_out_st - s_out[..., :cfg.out_channels]) ** 2
                    d_hard = jnp.quantile(d_st.reshape(-1), 0.999)
                    mask = d_st >= d_hard
                    loss_hard = jnp.sum(jnp.where(mask, d_st, 0.0)) \
                        / jnp.maximum(jnp.sum(mask), 1)
                    metrics = {"hard": loss_hard}
                    if with_penalty:
                        # push student features on out-of-domain images to
                        # zero (efficientAD.py:475-480)
                        s_pen = student.apply(
                            {"params": params["student"]},
                            normalize_imagenet(img_pen))
                        loss_penalty = jnp.mean(
                            s_pen[..., :cfg.out_channels] ** 2)
                        loss_st = loss_hard + loss_penalty
                        metrics["penalty"] = loss_penalty
                    else:
                        loss_st = loss_hard

                    ae_out = ae.apply({"params": params["autoencoder"]},
                                      normalize_imagenet(img_ae_j),
                                      deterministic=True)
                    s_out_ae = student.apply({"params": params["student"]},
                                             normalize_imagenet(img_ae_j))
                    loss_ae = jnp.mean((t_out_ae - ae_out) ** 2)
                    loss_stae = jnp.mean(
                        (ae_out - s_out_ae[..., cfg.out_channels:]) ** 2)
                    total = loss_st + loss_ae + loss_stae
                    metrics.update(total=total, ae=loss_ae, stae=loss_stae)
                    return total, metrics

                params = {"student": state.student,
                          "autoencoder": state.autoencoder}
                (_, metrics), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params)
                updates, opt_state = self.optimizer.update(
                    grads, state.opt_state, params)
                updates = jax.tree_util.tree_map(lambda u: -lr_rate * u,
                                                 updates)
                new = optax.apply_updates(params, updates)
                return EADState(step=state.step + 1, student=new["student"],
                                autoencoder=new["autoencoder"],
                                opt_state=opt_state), metrics
            return train_step

        train_step = make_train_step(False)
        self._train_step_pen = make_train_step(True)

        @jax.jit
        def predict_maps(state: EADState, tp, t_mean, t_std, img):
            """Raw (unnormalised) st/ae maps for a batch (efficientAD.py:292-309)."""
            x = normalize_imagenet(img)
            t_out = (teacher.apply({"params": tp}, x) - t_mean) / t_std
            s_out = student.apply({"params": state.student}, x)
            ae_out = ae.apply({"params": state.autoencoder}, x,
                              deterministic=True)
            map_st = jnp.mean((t_out - s_out[..., :cfg.out_channels]) ** 2,
                              axis=-1, keepdims=True)
            map_ae = jnp.mean((ae_out - s_out[..., cfg.out_channels:]) ** 2,
                              axis=-1, keepdims=True)
            return map_st, map_ae

        self._teacher_fwd = teacher_fwd
        self._train_step = train_step
        self._predict_maps = predict_maps

    # ------------------------------------------------------------------ #

    def teacher_normalization(self, train_imgs: np.ndarray,
                              batch: int = 8) -> None:
        """Channel mean/std of teacher features over the train set
        (efficientAD.py:152-178)."""
        means = []
        for i in range(0, len(train_imgs), batch):
            out = self._teacher_fwd(self.teacher_params,
                                    jnp.asarray(train_imgs[i:i + batch]))
            means.append(np.asarray(jnp.mean(out, axis=(0, 1, 2))))
        channel_mean = np.mean(np.stack(means), axis=0)
        mean_dev = []
        cm = jnp.asarray(channel_mean)[None, None, None, :]
        for i in range(0, len(train_imgs), batch):
            out = self._teacher_fwd(self.teacher_params,
                                    jnp.asarray(train_imgs[i:i + batch]))
            mean_dev.append(np.asarray(jnp.mean((out - cm) ** 2,
                                                axis=(0, 1, 2))))
        channel_std = np.sqrt(np.mean(np.stack(mean_dev), axis=0))
        self.teacher_mean = cm
        self.teacher_std = jnp.asarray(channel_std)[None, None, None, :]

    def step_lr(self, step: int) -> float:
        cfg = self.cfg
        return cfg.lr * (0.1 if step >= int(0.95 * cfg.train_steps) else 1.0)

    def train_step(self, img_st: jnp.ndarray, img_ae: jnp.ndarray,
                   rng: jax.Array,
                   img_penalty: jnp.ndarray = None) -> Dict[str, float]:
        lr_rate = self.step_lr(int(self.state.step))
        if img_penalty is not None:
            self.state, metrics = self._train_step_pen(
                self.state, self.teacher_params, self.teacher_mean,
                self.teacher_std, img_st, img_ae, lr_rate, rng, img_penalty)
        else:
            self.state, metrics = self._train_step(
                self.state, self.teacher_params, self.teacher_mean,
                self.teacher_std, img_st, img_ae, lr_rate, rng)
        return {k: float(v) for k, v in metrics.items()}

    def map_normalization(self, val_imgs: np.ndarray, batch: int = 8
                          ) -> Tuple[float, float, float, float]:
        """0.9/0.995 quantiles of validation maps (efficientAD.py:311-333)."""
        sts, aes = [], []
        for i in range(0, len(val_imgs), batch):
            m_st, m_ae = self._predict_maps(
                self.state, self.teacher_params, self.teacher_mean,
                self.teacher_std, jnp.asarray(val_imgs[i:i + batch]))
            sts.append(np.asarray(m_st))
            aes.append(np.asarray(m_ae))
        st = np.concatenate(sts).ravel()
        aev = np.concatenate(aes).ravel()
        return (float(np.quantile(st, 0.9)), float(np.quantile(st, 0.995)),
                float(np.quantile(aev, 0.9)), float(np.quantile(aev, 0.995)))

    def predict_combined(self, imgs: np.ndarray, quantiles, batch: int = 8
                         ) -> np.ndarray:
        """Combined anomaly maps [N,H',W'] (efficientAD.py:292-309)."""
        q_st_start, q_st_end, q_ae_start, q_ae_end = quantiles
        outs = []
        for i in range(0, len(imgs), batch):
            m_st, m_ae = self._predict_maps(
                self.state, self.teacher_params, self.teacher_mean,
                self.teacher_std, jnp.asarray(imgs[i:i + batch]))
            m_st = 0.1 * (m_st - q_st_start) / max(q_st_end - q_st_start, 1e-12)
            m_ae = 0.1 * (m_ae - q_ae_start) / max(q_ae_end - q_ae_start, 1e-12)
            outs.append(np.asarray(0.5 * m_st + 0.5 * m_ae)[..., 0])
        return np.concatenate(outs)

    def test_auc(self, test_imgs: np.ndarray, labels: List[str],
                 quantiles) -> Tuple[float, List[int], List[float]]:
        """Image AUC: max of the combined map (efficientAD.py:180-216)."""
        maps = self.predict_combined(test_imgs, quantiles)
        y_true = [0 if lab == "good" else 1 for lab in labels]
        y_score = [float(m.max()) for m in maps]
        return roc_auc(y_true, y_score), y_true, y_score

    def test_auc_grouped(self, test_imgs: np.ndarray, labels: List[str],
                         paths: List[str], quantiles, group_div: int = 14
                         ) -> Tuple[float, List[int], List[float]]:
        """Patch-grouped part AUC (efficientAD.py:218-290): group by
        int(basename.split('_')[0]) // group_div, take the max patch score per
        part, then score with 1 - max (the reference's inversion at
        efficientAD.py:288 is reproduced)."""
        import os
        maps = self.predict_combined(test_imgs, quantiles)
        groups: Dict[Tuple[int, int], float] = {}
        for m, lab, path in zip(maps, labels, paths):
            name = os.path.basename(path)
            try:
                gid = int(name.split("_")[0]) // group_div
            except ValueError:
                gid = hash(name.split("_")[0]) % (2 ** 31)
            label = 0 if lab == "good" else 1
            key = (gid, label)
            groups[key] = max(groups.get(key, -np.inf), float(m.max()))
        y_true = [k[1] for k in groups]
        if len(set(y_true)) < 2:
            raise ValueError("Only one class present in grouped labels")
        y_score = [1.0 - groups[k] for k in groups]
        return roc_auc(y_true, y_score), y_true, y_score


class EarlyStopping:
    """AUC-plateau stopping (efficientAD.py:335-350)."""

    def __init__(self, patience: int = 10, min_delta: float = 0.01,
                 best_auc: float = 0.98):
        self.patience = patience
        self.min_delta = min_delta
        self.best_auc = best_auc
        self.counter = 0

    def should_stop(self, current_auc: float) -> bool:
        if current_auc >= (self.best_auc - self.min_delta):
            self.counter += 1
        else:
            self.counter = 0
        return self.counter >= self.patience


def final_metrics(y_true: List[int], y_score: List[float]) -> Dict[str, float]:
    """Optimal threshold + acc/precision/recall/F1 (efficientAD.py:644-659)."""
    thr = min_distance_threshold(y_true, y_score)
    y = np.asarray(y_true)
    pred = (np.asarray(y_score) >= thr).astype(int)
    tp = int(np.sum((pred == 1) & (y == 1)))
    fp = int(np.sum((pred == 1) & (y == 0)))
    fn = int(np.sum((pred == 0) & (y == 1)))
    precision = tp / max(tp + fp, 1)
    recall = tp / max(tp + fn, 1)
    f1 = 2 * precision * recall / max(precision + recall, 1e-12)
    return {"threshold": float(thr),
            "accuracy": float(np.mean(pred == y)),
            "precision": precision, "recall": recall, "f1": f1}
