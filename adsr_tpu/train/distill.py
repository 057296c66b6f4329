"""Scratch-teacher distillation for the EfficientAD baseline.

The reference hard-requires pretrained PDN teacher weights
(/root/reference/src/efficientAD.py:429-444 — distilled from a WideResNet-101
by the EfficientAD authors, not shipped in the repo). In environments with no
external artifacts this module provides a runnable substitute: the teacher
PDN is distilled from a FROZEN RANDOM feature oracle — a random-weight
medium PDN (wider + deeper than the small teacher, identical output
geometry by construction, models/efficientad.py:36-66) — by feature
regression over the anomaly-free training images with flip/rot augmentation.

Random-feature teachers are a known-reasonable anomaly-detection baseline
(the student-teacher AD literature's "uninformed students" ablations): the
oracle's random conv features are smooth, locality-aware descriptors, and
distilling them into the teacher gives the student-teacher pair a shared,
data-independent target language. The resulting AUC does NOT match the
reference's pretrained-teacher rows (documented caveat — README); parity
still requires converting real teacher weights via cli/convert.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax

from adsr_tpu.models.efficientad import PDN


def distill_teacher(out_channels: int, model_size: str,
                    train_imgs: np.ndarray, steps: int = 2000,
                    batch: int = 8, lr: float = 1e-3, seed: int = 0,
                    log: Callable = print) -> Tuple[dict, float]:
    """Distill a ``model_size`` PDN teacher from a frozen random medium-PDN
    oracle over ``train_imgs`` ([N,H,W,3] float32 in [0,1]).

    Returns (teacher_params, final_loss). The oracle's features are
    channel-normalised (one stats pass over the train set) so the teacher
    regresses O(1) targets; the downstream pipeline's own
    ``teacher_normalization`` then standardises the TEACHER's outputs
    exactly as with converted weights (train/efficientad.py:305-324).
    """
    from adsr_tpu.models.factory import fast_init
    from adsr_tpu.train.efficientad import normalize_imagenet

    oracle = PDN(out_channels, "medium")
    teacher = PDN(out_channels, model_size)
    key = jax.random.key(seed)
    dummy = jnp.zeros((1,) + train_imgs.shape[1:3] + (3,))
    oracle_params = fast_init(oracle.init, jax.random.fold_in(key, 0),
                              dummy)["params"]
    teacher_params = fast_init(teacher.init, jax.random.fold_in(key, 1),
                               dummy)["params"]

    @jax.jit
    def oracle_fwd(x):
        return oracle.apply({"params": oracle_params}, normalize_imagenet(x))

    # channel stats of the oracle features over the train set
    sums, sqs, count = None, None, 0
    for i in range(0, len(train_imgs), batch):
        f = oracle_fwd(jnp.asarray(train_imgs[i:i + batch]))
        s = jnp.sum(f, axis=(0, 1, 2))
        q = jnp.sum(f * f, axis=(0, 1, 2))
        sums = s if sums is None else sums + s
        sqs = q if sqs is None else sqs + q
        count += f.shape[0] * f.shape[1] * f.shape[2]
    mean = sums / count
    std = jnp.sqrt(jnp.maximum(sqs / count - mean * mean, 1e-12))

    optimizer = optax.adam(lr)
    opt_state = optimizer.init(teacher_params)

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, x):
        target = (oracle.apply({"params": oracle_params},
                               normalize_imagenet(x)) - mean) / std

        def loss_fn(p):
            out = teacher.apply({"params": p}, normalize_imagenet(x))
            return jnp.mean((out - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def augment(x, key):
        kf, kr = jax.random.split(key)
        flip = jax.random.bernoulli(kf, 0.5, (x.shape[0], 1, 1, 1))
        x = jnp.where(flip, x[:, :, ::-1, :], x)
        rot = jax.random.bernoulli(kr, 0.5, (x.shape[0], 1, 1, 1))
        return jnp.where(rot, jnp.rot90(x, 2, axes=(1, 2)), x)

    data_rng = np.random.RandomState(seed + 1)
    loss = float("nan")
    for it in range(steps):
        idx = data_rng.randint(0, len(train_imgs), batch)
        x = augment(jnp.asarray(train_imgs[idx]),
                    jax.random.fold_in(key, 2 + it))
        teacher_params, opt_state, loss_dev = step(teacher_params, opt_state,
                                                   x)
        if it % max(steps // 10, 1) == 0:
            loss = float(loss_dev)
            log(f"[distill {it}/{steps}] feature-regression MSE {loss:.4f}")
    return teacher_params, float(loss_dev)
