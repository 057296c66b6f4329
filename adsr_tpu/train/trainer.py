"""Training engine: one jitted train step + a thin epoch driver.

The reference's Trainer (src/trainer.py:110-340) runs an eager per-batch loop
with a GradScaler; on TPU the whole step — forward (DRN dual composition
included), loss, backward, torch-style Adam update — is ONE compiled XLA
program with donated state, and bf16 mixed precision needs no loss scaling.

Reproduced semantics:
- DRN dual-regression loss composition (trainer.py:168-185): primary loss on
  the full-resolution output vs HR plus intermediate outputs vs the LR
  pyramid, dual loss on dual-model down-projections, total =
  primary + dual_weight * dual;
- torch Adam (L2 weight decay folded into the gradient before the moment
  update — trainer.py:49-73) with one optimizer state over primal+dual params
  (per-parameter updates are identical to the reference's per-model optimizer
  list);
- CosineAnnealingLR stepped per epoch (trainer.py:76-96):
  ``lr(e) = eta_min + (lr0 - eta_min) * (1 + cos(pi*e/epochs)) / 2``;
- per-epoch loss log, PSNR/SSIM eval with quantize (trainer.py:242-304),
  terminate-on-epochs (trainer.py:334-340).
"""

from __future__ import annotations

import math
import os
import time
from functools import partial
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax
from flax import struct

from adsr_tpu.core.config import DRCTModelConfig, DRNModelConfig, Experiment
from adsr_tpu.core import prng
from adsr_tpu.data.pipeline import EpochSampler, SRDataset
from adsr_tpu.metrics import psnr_shave4, quantize, ssim_shave4
from adsr_tpu.models.drn import make_dual_models
from adsr_tpu.models.factory import init_sr_params, make_model
from adsr_tpu.train.losses import make_loss


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any          # {'primal': ..., 'duals': (..,) } (duals optional)
    opt_state: Any


# Scoped-vmem budget for compiles containing the fused custom-VJP backward
# (ops/fused_rdg_train.py): its 41 VMEM-resident outputs need ~46 MiB of
# custom-call staging vs the ~16 MiB default.  Any jit that inlines the fused
# train step (e.g. bench.py's chained-scan loop) must carry these options.
# Default 64 MiB: 96 MiB OVERCOMMITS physical VMEM once the step sits inside
# a lax.scan (XLA places scan carries/double-buffers in VMEM on top of the
# scoped budget) and the v5e worker faults at runtime instead of erroring at
# compile — round-4 bisect: 12 RDGs x batch 16 x scan>=2 crashed at 98304,
# runs at 65536 (scripts/repro_bwd.py).  Env-overridable
# (ADSR_TPU_SCOPED_VMEM_KIB) for stacked-backward A/Bs.  NOTE: the env var is
# read ONCE at import — set it before importing the trainer.


def _scoped_vmem_kib(img_size: int = 32) -> int:
    # the 256px geometry's staging (per-layer weight slices + the L=4096
    # token cotangents) measures 68.51 MiB at compile; XLA grows its
    # staging fusions to fill whatever budget it is given (72 MiB produced
    # a 125 MiB fusion!), so sit JUST above the measured demand — 66 MiB
    # setting = 69.75 MiB effective limit — and let the leaner backward
    # kernel (no score scratch, compute-dtype dqkv staging) keep the total
    # under the 128 MiB physical budget
    default = "65536" if img_size <= 32 else "67456"
    raw = os.environ.get("ADSR_TPU_SCOPED_VMEM_KIB", default)
    try:
        kib = int(raw)
    except ValueError:
        raise ValueError(
            f"ADSR_TPU_SCOPED_VMEM_KIB={raw!r} is not an integer (KiB of "
            "scoped VMEM for fused-train compiles, e.g. 98304)") from None
    if not 1024 <= kib <= 131072:
        raise ValueError(
            f"ADSR_TPU_SCOPED_VMEM_KIB={kib} out of range [1024, 131072] "
            "(v5e VMEM is 131072 KiB total)")
    return kib


def fused_train_compiler_options(img_size: int = 32) -> dict:
    """Per-jit compiler options for any compile that inlines the fused
    custom-VJP train step (geometry-aware scoped-vmem budget)."""
    return {"xla_tpu_scoped_vmem_limit_kib": str(_scoped_vmem_kib(img_size))}


# the 128px-geometry options, for callers that predate the geometry-aware
# helper (bench scripts); prefer fused_train_compiler_options(img_size)
FUSED_TRAIN_COMPILER_OPTIONS = fused_train_compiler_options(32)


def cosine_lr(epoch: int, lr0: float, eta_min: float, epochs: int) -> float:
    """CosineAnnealingLR value at (0-based) epoch (trainer.py:76-83)."""
    return eta_min + (lr0 - eta_min) * (1 + math.cos(math.pi * epoch / epochs)) / 2


def make_optimizer(beta1: float, beta2: float, epsilon: float,
                   weight_decay: float) -> optax.GradientTransformation:
    """torch.optim.Adam semantics: wd enters the gradient, then Adam moments;
    the learning rate is applied separately inside the train step."""
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale_by_adam(b1=beta1, b2=beta2, eps=epsilon))
    return optax.chain(*parts)


class TrainStepBundle:
    """Jitted step + state factory + the pieces parallel layers need."""

    def __init__(self, step, init_state, model, optimizer):
        self.step = step
        self.init_state = init_state
        self.model = model
        self.optimizer = optimizer

    def __iter__(self):  # (step, init_state, model) unpacking
        return iter((self.step, self.init_state, self.model))


def _fused_train_geom_ok(model) -> bool:
    """The fused backward kernel's scratches scale with L = img_size^2.
    L <= 1024 (the flagship 128px geometry) has run fused since round 3.
    L = 4096 (256px/window-16, the reference's best-AUC geometry —
    src/main.py:243-294) is admitted since round 5: the backward SPLITS
    into two chained lean-liveness Pallas calls over block halves
    (ops/fused_rdg_train.py:_bwd_split) — round 4's buffer-placement dead
    end was really ~56 MiB of Mosaic register-spill slots from whole-array
    live values, fixed by rebuilding y1/y2/gelu at their use sites —
    measured 41.2 img/s / 24.9% MFU vs the XLA+remat fallback's
    21.1 / 12.8% (v5e, batch 8, full 12-RDG scan). Beyond L=4096 the
    XLA+remat path remains the default; ADSR_TPU_FUSED_TRAIN_BIGL=1 opts
    larger geometries in for probing."""
    l = model.img_size * model.img_size
    if l <= 4096:
        return True
    return os.environ.get("ADSR_TPU_FUSED_TRAIN_BIGL") == "1"


def make_train_step(exp: Experiment, mesh=None,
                    softmax_stable: bool = False) -> TrainStepBundle:
    """Build the jitted train step for an experiment.

    Step signature: (state, lrs, hr, lr_rate, rng) -> (state, metrics_dict).
    `lrs` is the LR pyramid, descending scale (lrs[0] = model input).

    With a ``mesh`` whose data axes shard the batch, the fused DRCT path runs
    the whole step under shard_map (batch split over dcn×dp, params/opt state
    replicated, gradients pmean'ed across the data axes) — GSPMD cannot
    partition a Pallas custom call, but whole per-image RDG programs are
    embarrassingly data-parallel. tp>1 still falls back to the XLA model,
    which GSPMD partitions megatron-style (parallel/sharding.py).
    """
    import os

    model = make_model(exp.model, exp.precision)
    is_dual = isinstance(exp.model, DRNModelConfig)
    duals = make_dual_models(exp.model) if is_dual else None
    loss_fn = make_loss(exp.optim.loss, batch_size=exp.data.batch_size,
                        scale=max(exp.data.scale), rgb_range=exp.data.rgb_range)
    optimizer = make_optimizer(exp.optim.beta1, exp.optim.beta2,
                               exp.optim.epsilon, exp.optim.weight_decay)
    dual_weight = exp.optim.dual_weight

    if mesh is not None:
        from adsr_tpu.core.mesh import data_axes as _mesh_data_axes
        daxes = _mesh_data_axes(mesh)
        n_data = 1
        for a in daxes:
            n_data *= mesh.shape[a]
        tp_size = mesh.shape.get("tp", 1)
    else:
        daxes, n_data, tp_size = (), 1, 1

    # fused DRCT training path: forward AND custom-VJP backward as whole-RDG
    # Pallas programs (ops/fused_rdg_train.py) — DEFAULT on TPU (measured
    # 171.8 vs 97.7 img/s / 22.0% vs 12.5% MFU on v5e, batch 16; fwd parity
    # 81.9 dB vs flax bf16 on hardware, grad parity interpret-tested);
    # ADSR_TPU_FUSED_TRAIN=0 opts out, CPU/tests use XLA unless 'force'.
    # Topology: single chip runs it under plain jit; a data-parallel mesh
    # (tp=1) runs it under shard_map; tp>1 uses the XLA model (GSPMD
    # partitions its channel matmuls, but not a Pallas custom call).
    fused_flag = os.environ.get("ADSR_TPU_FUSED_TRAIN", "1")
    if fused_flag == "force":  # tests: interpret mode on CPU
        topo_ok = mesh is None or tp_size == 1
    else:
        topo_ok = ((mesh is None and jax.device_count() == 1)
                   or (mesh is not None and tp_size == 1))
    geom_ok = (fused_flag == "force"
               or (isinstance(exp.model, DRCTModelConfig)
                   and _fused_train_geom_ok(exp.model)))
    use_fused_train = (
        isinstance(exp.model, DRCTModelConfig)
        and getattr(exp.model, "scan_layers", False)
        and (fused_flag == "force"
             or (fused_flag == "1"
                 and jax.default_backend() not in ("cpu",)))
        and topo_ok
        and geom_ok
    )

    # The fused backward kernel's 41 VMEM-resident buffers (40 grad
    # accumulators + dx) exceed XLA's default ~16 MiB scoped-vmem budget for
    # custom-call staging; raise it for THIS compile only (the serving path
    # keeps the default).  Applied via per-jit compiler_options — the
    # client-side XLA_FLAGS parser rejects TPU-only flags in this env.
    # (TPU-only: the CPU compiler rejects unknown options, and the interpret
    # -mode 'force' path used by tests runs on CPU)
    compiler_options = (fused_train_compiler_options(exp.model.img_size)
                        if use_fused_train
                        and jax.default_backend() not in ("cpu",) else None)

    def primal_forward(params, lr0, rng):
        if use_fused_train:
            from adsr_tpu.models.factory import compute_dtype
            from adsr_tpu.ops.fused_rdg_train import fused_drct_train_forward
            return fused_drct_train_forward(
                params, exp.model, lr0, rng=rng, deterministic=False,
                dtype=compute_dtype(exp.precision), stable=softmax_stable)
        return model.apply({"params": params}, lr0,
                           deterministic=False, rngs={"dropout": rng})

    def make_loss_of(loss_fn_):
        def loss_of(params, lrs, hr, rng):
            sr = primal_forward(params["primal"], lrs[0], rng)
            if is_dual:
                sr_list = sr
                n_d = len(duals)
                sr2lr = [duals[i].apply({"params": params["duals"][i]},
                                        sr_list[i - n_d]) for i in range(n_d)]
                # primary: full-res vs HR + intermediates vs LR pyramid
                loss_primary, _ = loss_fn_(sr_list[-1], hr)
                for i in range(1, len(sr_list)):
                    lp, _ = loss_fn_(sr_list[i - 1 - len(sr_list)],
                                     lrs[i - len(sr_list)])
                    loss_primary = loss_primary + lp
                loss_dual = jnp.asarray(0.0, jnp.float32)
                for i in range(n_d):
                    ld, _ = loss_fn_(sr2lr[i], lrs[i])
                    loss_dual = loss_dual + ld
                total = loss_primary + dual_weight * loss_dual
                return total, {"total": total, "primary": loss_primary,
                               "dual": loss_dual}
            total, comps = loss_fn_(sr, hr)
            metrics = {"total": total}
            metrics.update(comps)
            return total, metrics
        return loss_of

    loss_of = make_loss_of(loss_fn)
    skip_threshold = exp.optim.skip_threshold

    def finish_step(state, grads, metrics, lr_rate, error_last):
        """Optimizer update + opt-in loss-spike skip, shared by the plain and
        the shard_map step (inside shard_map grads/metrics are already
        pmean'ed, so every shard takes the identical update and the
        replicated state stays replicated)."""
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        updates = jax.tree_util.tree_map(lambda u: -lr_rate * u, updates)
        params = optax.apply_updates(state.params, updates)
        if skip_threshold > 0:
            # loss-spike batch skip (trainer.py:190, 207-210 — opt-in here):
            # a skipped batch leaves params AND optimizer moments untouched,
            # exactly as the reference's skipped optimizer.step() would
            ok = metrics["total"] < skip_threshold * error_last
            take = lambda new, old: jax.tree_util.tree_map(
                lambda a, b: jnp.where(ok, a, b), new, old)
            params = take(params, state.params)
            opt_state = take(opt_state, state.opt_state)
            metrics = dict(metrics, skipped=jnp.where(ok, 0.0, 1.0))
        return TrainState(step=state.step + 1, params=params,
                          opt_state=opt_state), metrics

    def train_step_fn(state: TrainState, lrs, hr, lr_rate, rng,
                      error_last=1e8):  # reference init value (trainer.py:126)
        (_, metrics), grads = jax.value_and_grad(loss_of, has_aux=True)(
            state.params, lrs, hr, rng)
        return finish_step(state, grads, metrics, lr_rate, error_last)

    if use_fused_train and mesh is not None and n_data > 1:
        # data-parallel fused path: the batch splits over (dcn×)dp, each
        # device runs whole per-image Pallas programs on its slice, and the
        # gradients/metrics pmean across the data axes — numerically the
        # global-batch step (the per-shard loss is built with the LOCAL batch
        # size so its sum/batch_size components are local means, and a pmean
        # of equal-sized local means IS the global mean)
        if exp.data.batch_size % n_data:
            raise ValueError(
                f"batch_size {exp.data.batch_size} must divide by the mesh's "
                f"data-axis product {n_data} for the fused shard_map trainer")
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        loss_of_local = make_loss_of(make_loss(
            exp.optim.loss, batch_size=exp.data.batch_size // n_data,
            scale=max(exp.data.scale), rgb_range=exp.data.rgb_range))
        def sharded_step_fn(state, lrs, hr, lr_rate, rng, error_last):
            # distinct dropout/stochastic-depth stream per data shard
            idx = jax.lax.axis_index(daxes[0])
            for a in daxes[1:]:
                idx = idx * mesh.shape[a] + jax.lax.axis_index(a)
            (_, metrics), grads = jax.value_and_grad(
                loss_of_local, has_aux=True)(
                    state.params, lrs, hr, jax.random.fold_in(rng, idx))
            grads = jax.lax.pmean(grads, daxes)
            metrics = jax.tree_util.tree_map(
                lambda m: jax.lax.pmean(m, daxes), metrics)
            return finish_step(state, grads, metrics, lr_rate, error_last)

        bspec = P(daxes)
        smapped = shard_map(
            sharded_step_fn, mesh=mesh,
            in_specs=(P(), bspec, bspec, P(), P(), P()),
            out_specs=(P(), P()),
            # Pallas custom calls defeat varying-manual-axes inference
            check_vma=False)

        def train_step_fn(state, lrs, hr, lr_rate, rng,  # noqa: F811
                          error_last=1e8):
            return smapped(state, lrs, hr, jnp.asarray(lr_rate),
                           rng, jnp.asarray(error_last))

    # compiler_options is only legal on a TOP-LEVEL jit; callers that embed
    # the step in their own jit (bench.py's chained scan, sharded wrappers)
    # must use `bundle.raw_step` and carry `bundle.compiler_options`
    train_step = jax.jit(train_step_fn, donate_argnums=(0,),
                         compiler_options=compiler_options)

    def init_state(key: jax.Array) -> TrainState:
        primal, dual_params = init_sr_params(exp.model, key, exp.precision)
        params = {"primal": primal}
        if dual_params is not None:
            params["duals"] = dual_params
        opt_state = optimizer.init(params)
        return TrainState(step=jnp.asarray(0), params=params,
                          opt_state=opt_state)

    bundle = TrainStepBundle(train_step, init_state, model, optimizer)
    bundle.use_fused_train = use_fused_train
    bundle.compiler_options = compiler_options
    bundle.raw_step = train_step_fn
    return bundle


def make_eval_forward(exp: Experiment, quantize_out: bool = True):
    """Jitted inference: LR batch -> quantized SR batch (list-output aware).

    DRCT on TPU uses the fused serving forward (ops/fused_drct.py) — measured
    1.56x the XLA path (592 vs 378 img/s at the flagship config). Opt out with
    ADSR_TPU_FUSED=0; CPU always uses the XLA path.

    ``quantize_out=False`` returns the RAW float SR: the anomaly evaluator
    needs it because the reference's eval path TRUNCATES to uint8
    (``.byte()``, src/evaluate.py:214) — quantize()'s rounding first would
    shift ~half the pixels one grey level off the reference's scores.
    """
    import os

    from adsr_tpu.core.config import DRCTModelConfig
    model = make_model(exp.model, exp.precision)
    use_fused = (
        isinstance(exp.model, DRCTModelConfig)
        and exp.model.scan_layers
        and os.environ.get("ADSR_TPU_FUSED", "auto") != "0"
        and jax.default_backend() not in ("cpu",)
    )
    finish = ((lambda sr: quantize(sr, exp.data.rgb_range)) if quantize_out
              else (lambda sr: sr))
    if use_fused:
        from adsr_tpu.models.factory import compute_dtype
        from adsr_tpu.ops.fused_drct import fused_drct_forward
        dtype = compute_dtype(exp.precision)

        @jax.jit
        def forward(params, lr):
            sr = fused_drct_forward(params, exp.model, lr, dtype=dtype)
            return finish(sr)

        return forward

    @jax.jit
    def forward(params, lr):
        sr = model.apply({"params": params}, lr, deterministic=True)
        if isinstance(sr, (list, tuple)):
            sr = sr[-1]
        return finish(sr.astype(jnp.float32))

    return forward


def make_serving_forward(exp: Experiment, params, mesh=None,
                         quantize_out: bool = True):
    """Fixed-params jitted inference: LR batch -> quantized SR batch.
    ``quantize_out=False`` returns raw float SR (see make_eval_forward).

    Unlike :func:`make_eval_forward` (params change every training eval),
    this binds the params at build time, so the fused DRCT path can run
    weight packing + attention-bias construction ONCE (prepack_drct) instead
    of per forward — the torch reference likewise keeps weights resident
    between calls (src/drct.py:249-276). Returns ``forward(lr)``.

    With a ``mesh`` whose data axes (dcn x dp) exceed one device, the fused
    path runs under shard_map: the LR batch splits over the data axes and the
    packed weight tree replicates — GSPMD cannot partition a Pallas custom
    call, but batch shards are embarrassingly parallel, so each device runs
    whole programs on its slice (the multi-chip serving analogue of the
    reference's single-GPU eval loop, src/evaluate.py:204-227). The caller's
    per-call batch must divide by the data-axis product.
    """
    import os

    from adsr_tpu.core.config import DRCTModelConfig
    fused_flag = os.environ.get("ADSR_TPU_FUSED", "auto")
    use_fused = (
        isinstance(exp.model, DRCTModelConfig)
        and exp.model.scan_layers
        and fused_flag != "0"
        and (fused_flag == "force"  # tests: interpret mode on CPU
             or jax.default_backend() not in ("cpu",))
    )
    if use_fused:
        from adsr_tpu.models.factory import compute_dtype
        from adsr_tpu.ops.fused_drct import fused_drct_apply, prepack_drct
        dtype = compute_dtype(exp.precision)
        img = exp.model.img_size
        packed = prepack_drct(params, exp.model, img, img, dtype=dtype)

        def body(packed, lr):
            sr = fused_drct_apply(packed, exp.model, lr, dtype=dtype)
            return quantize(sr, exp.data.rgb_range) if quantize_out else sr

        data_axes = tuple(a for a in ("dcn", "dp")
                          if mesh is not None and mesh.shape.get(a, 1) > 1)
        if data_axes:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P
            spec = P(data_axes if len(data_axes) > 1 else data_axes[0])
            fwd = jax.jit(shard_map(
                body, mesh=mesh, in_specs=(P(), spec), out_specs=spec,
                # Pallas custom calls defeat varying-manual-axes inference
                check_vma=False))
        else:
            fwd = jax.jit(body)

        return lambda lr: fwd(packed, lr)

    forward = make_eval_forward(exp, quantize_out=quantize_out)
    return lambda lr: forward(params, lr)


def make_tiled_serving_forward(exp: Experiment, params, tile: int = 0,
                               overlap: int = 8,
                               quantize_out: bool = True):
    """Serving forward for LR inputs LARGER than the compiled tile shape.

    Cuts the LR batch into overlapping `tile`-sized crops, batches them
    through one compiled tile forward, and feather-blends the SR tiles
    (eval/tiled.py). The reference handles off-train sizes only by window
    clamping + mask recompute (src/drct.py:426-429, 492-495) — this path
    instead serves e.g. 512px eval through the 128px-compiled graph with no
    full-size compile and bounded VMEM. `tile` defaults to the model's
    train img_size. Returns ``forward(lr) -> quantized SR``.
    """
    import os

    from adsr_tpu.core.config import DRCTModelConfig
    from adsr_tpu.eval.tiled import tiled_sr_forward
    scale = max(exp.data.scale)
    if tile <= 0:
        tile = exp.model.img_size if isinstance(exp.model, DRCTModelConfig) \
            else 32
    if isinstance(exp.model, DRCTModelConfig):
        win = exp.model.window_size
        if tile < win or tile % win != 0:
            raise ValueError(
                f"--tile must be a multiple of the model's window_size "
                f"({win}) and >= it; got tile={tile}. A non-divisible tile "
                f"would build truncated window plans/masks.")

    use_fused = (
        isinstance(exp.model, DRCTModelConfig)
        and exp.model.scan_layers
        and os.environ.get("ADSR_TPU_FUSED", "auto") != "0"
        and jax.default_backend() not in ("cpu",)
    )
    if use_fused:
        from adsr_tpu.models.factory import compute_dtype
        from adsr_tpu.ops.fused_drct import fused_drct_apply, prepack_drct
        dtype = compute_dtype(exp.precision)
        packed = prepack_drct(params, exp.model, tile, tile, dtype=dtype)
        raw = lambda crops: fused_drct_apply(packed, exp.model, crops,
                                             dtype=dtype)
    else:
        from adsr_tpu.models.factory import make_model
        model = make_model(exp.model, exp.precision)
        raw = lambda crops: model.apply({"params": params}, crops)
        if not isinstance(exp.model, DRCTModelConfig):
            _raw = raw
            raw = lambda crops: _raw(crops)[-1]   # DRN: full-scale output

    @jax.jit
    def fwd(lr):
        sr = tiled_sr_forward(raw, lr, tile, overlap, scale)
        return quantize(sr, exp.data.rgb_range) if quantize_out else sr

    return fwd


class Trainer:
    """Epoch driver with the reference's terminate/test cadence."""

    def __init__(self, exp: Experiment, train_ds: Optional[SRDataset],
                 test_ds: Optional[SRDataset], journal=None, mesh=None):
        self.exp = exp
        self.journal = journal
        # CLI --dp/--tp/--dcn land in exp.mesh; an EXPLICIT size > 1 builds
        # the mesh here so the epoch driver itself is the multi-chip path
        # (train batches AND the in-training eval shard over the data axes).
        # The dp=-1 default stays single-stream — auto-absorbing all devices
        # is ParallelTrainer's contract (parallel/sharding.py), not the
        # epoch driver's, so single-chip runs keep round-3 numerics/perf.
        if mesh is None and (exp.mesh.tp > 1 or exp.mesh.dcn > 1
                             or exp.mesh.dp > 1):
            from adsr_tpu.core.mesh import make_mesh
            # explicit sizes take the first dcn*dp*tp devices (make_mesh
            # itself requires full coverage — that is ParallelTrainer's
            # all-devices contract)
            want = exp.mesh.dcn * exp.mesh.dp * exp.mesh.tp
            mesh = make_mesh(exp.mesh, devices=jax.devices()[:want])
        self.mesh = mesh
        self._batch_sharding = None
        self._bundle = make_train_step(exp, mesh=mesh)
        self.train_step, init_state, self.model = self._bundle
        self.eval_forward = make_eval_forward(exp)
        key = prng.root_key(exp.seed)
        self.state = init_state(prng.stream(key, "init"))
        if mesh is not None:
            from adsr_tpu.core.mesh import batch_sharding
            from adsr_tpu.parallel.sharding import shard_train_state
            self.state = shard_train_state(self.state, self._bundle, mesh)
            self._batch_sharding = batch_sharding(mesh)
        self.apply_softmax_guard()
        self.dropout_root = prng.stream(key, "dropout")
        self.epoch = 0
        self.error_last = 1e8
        self.loss_history: List[Dict[str, float]] = []
        self.psnr_ssim_history: List[Tuple[float, float]] = []
        self.best: Dict[str, Tuple[float, int]] = {}
        self.sampler = None
        if train_ds is not None:
            self.sampler = EpochSampler(
                train_ds, exp.data.batch_size, exp.data.test_every,
                exp.data.patch_size, exp.data.no_augment, seed=exp.seed)
        self.test_ds = test_ds

    # ------------------------------------------------------------------ #

    def apply_softmax_guard(self) -> None:
        """Score-bound guard for the fused bf16 exp2 train softmax (the
        train-side twin of serving's pack-time `_score_bound` fallback,
        ops/fused_rdg.py prepack_rdg_stack): estimate the largest attention
        score the CURRENT params can produce; past EXP2_SAFE_BOUND, rebuild
        the step on the max-stabilised kernels. Re-run after any params
        load (--pre-train / --resume) — drift DURING training is covered by
        the ~20-nat headroom between the threshold and f32 exp2 overflow."""
        if not getattr(self._bundle, "use_fused_train", False):
            return
        from adsr_tpu.models.factory import compute_dtype
        if compute_dtype(self.exp.precision) != jnp.bfloat16:
            return
        from adsr_tpu.ops.fused_rdg_train import (EXP2_SAFE_BOUND,
                                                  train_score_bound)
        cfg = self.exp.model
        bound = train_score_bound(self.state.params["primal"], cfg,
                                  cfg.img_size, cfg.img_size)
        if bound > EXP2_SAFE_BOUND:
            self._log(
                f"fused train: packed-weight score bound {bound:.1f} > "
                f"{EXP2_SAFE_BOUND:.0f} — falling back to the stabilised "
                "softmax kernels (unusually large LayerNorm scale in the "
                "loaded params?)")
            self._bundle = make_train_step(self.exp, softmax_stable=True)
            self.train_step = self._bundle.step
            self.model = self._bundle.model

    def _log(self, msg: str) -> None:
        if self.journal is not None:
            self.journal.write_log(msg)
        else:
            print(msg)

    def train_one_epoch(self) -> Dict[str, float]:
        assert self.sampler is not None
        exp = self.exp
        lr_rate = cosine_lr(self.epoch, exp.optim.lr, exp.optim.eta_min,
                            exp.optim.epochs)
        self._log(f"[Epoch {self.epoch + 1}]\tLearning rate: {lr_rate:.2e}")
        # metrics accumulate ON DEVICE; host fetches happen only at print
        # points (per-step float() round trips serialize the tunnel)
        t_data, t_model = 0.0, 0.0
        t0 = time.time()
        acc: Dict[str, jnp.ndarray] = {}
        n_batches = 0
        for lrs, hr in self.sampler.epoch(self.epoch):
            t1 = time.time()
            t_data += t1 - t0
            if self._batch_sharding is not None:
                put = lambda x: jax.device_put(x, self._batch_sharding)
                lrs, hr = [put(l) for l in lrs], put(hr)
            rng = jax.random.fold_in(
                jax.random.fold_in(self.dropout_root, self.epoch), n_batches)
            self.state, metrics = self.train_step(self.state, lrs, hr,
                                                  lr_rate, rng,
                                                  self.error_last)
            for k, v in metrics.items():
                acc[k] = acc[k] + v if k in acc else v
            n_batches += 1
            t0 = time.time()
            t_model += t0 - t1
            if (n_batches % self.exp.print_every) == 0:
                shown = "".join(f"[{k}: {float(v) / n_batches:.4f}]"
                                for k, v in acc.items())
                t0 = time.time()  # the float() fetch above synced the device
                self._log(f"[{n_batches * exp.data.batch_size}/"
                          f"{self.sampler.dataset_length}]\t{shown}"
                          f"\t{t_model:.1f}+{t_data:.1f}s")
                t_model, t_data = 0.0, 0.0
        mean = {k: float(v) / max(n_batches, 1) for k, v in acc.items()}
        self.loss_history.append(mean)
        self.error_last = mean.get("total", self.error_last)
        self.epoch += 1
        return mean

    def test(self, test_ds: Optional[SRDataset] = None,
             save_results_fn=None) -> Tuple[float, float]:
        """PSNR/SSIM over a test split, one image at a time (trainer.py:242-304)."""
        ds = test_ds if test_ds is not None else self.test_ds
        assert ds is not None
        self._log("\nEvaluation:")
        exp = self.exp
        lrs_dev, hr_dev = ds.device_arrays()
        t0 = time.time()
        # batched forward + metrics: one jitted call per chunk instead of a
        # per-image host loop (each host round trip is expensive on a tunnel).
        # Chunk size follows the CLI --batch-size; on a mesh it is rounded to
        # a multiple of the data-axis product so chunks dp-shard evenly (the
        # pad-to-bsz below keeps partial chunks at the full static shape).
        bsz = max(1, min(self.exp.data.batch_size, ds.n))
        if self._batch_sharding is not None:
            from adsr_tpu.core.mesh import data_axes
            nd = 1
            for a in data_axes(self.mesh):
                nd *= self.mesh.shape[a]
            bsz = max(nd, (bsz // nd) * nd)
        psnrs, ssims = [], []
        for i in range(0, ds.n, bsz):
            lr = lrs_dev[0][i:i + bsz]
            hr = hr_dev[i:i + bsz]
            pad = bsz - lr.shape[0]
            if pad:
                lr = jnp.concatenate([lr, jnp.repeat(lr[-1:], pad, 0)])
                hr = jnp.concatenate([hr, jnp.repeat(hr[-1:], pad, 0)])
            if self._batch_sharding is not None:
                lr = jax.device_put(lr, self._batch_sharding)
                hr = jax.device_put(hr, self._batch_sharding)
            sr = self.eval_forward(self.state.params["primal"], lr)
            sr = sr[:, :hr.shape[1], :hr.shape[2], :]
            p_b = np.asarray(psnr_shave4(sr, hr, exp.data.rgb_range))
            s_b = np.asarray(ssim_shave4(sr, hr, exp.data.rgb_range))
            n_real = bsz - pad
            psnrs.extend(p_b[:n_real].tolist())
            ssims.extend(s_b[:n_real].tolist())
            if save_results_fn is not None:
                sr_host = np.asarray(sr)
                for j in range(n_real):
                    save_results_fn(ds.filenames[i + j], sr_host[j])
        p, s = float(np.mean(psnrs)), float(np.mean(ssims))
        self.psnr_ssim_history.append((p, s))
        for name, val in (("PSNR", p), ("SSIM", s)):
            bv, be = self.best.get(name, (-np.inf, 0))
            if val > bv:
                self.best[name] = (val, len(self.psnr_ssim_history))
        bp, bpe = self.best["PSNR"]
        bs, bse = self.best["SSIM"]
        self._log(f"[{exp.data.data_test} x{max(exp.data.scale)}]\t"
                  f"PSNR: {p:.2f} (Best: {bp:.2f} @epoch {bpe})\t"
                  f"SSIM: {s:.4f} (Best: {bs:.4f} @epoch {bse})")
        self._log(f"Total time: {time.time() - t0:.2f}s\n")
        return p, s

    def terminate(self) -> bool:
        if self.exp.test_only:
            self.test()
            return True
        return self.epoch >= self.exp.optim.epochs
