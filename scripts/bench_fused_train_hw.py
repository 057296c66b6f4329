"""Hardware validation + throughput for the fused custom-VJP training path.

Stages (run one per invocation so each remote Mosaic compile is bounded and
observable; see ARCHITECTURE.md "TPU bench hygiene"):

  python scripts/bench_fused_train_hw.py probe    # platform-speed control
  python scripts/bench_fused_train_hw.py parity   # fused train fwd vs flax
  python scripts/bench_fused_train_hw.py fused    # train-step imgs/s, fused
  python scripts/bench_fused_train_hw.py xla      # train-step imgs/s, XLA

The fused path is ops/fused_rdg_train.py (custom-VJP whole-RDG Pallas
programs); gradient parity vs flax is interpret-tested in
tests/test_fused_rdg_train.py — this script establishes the *hardware*
numbers the trainer default is flipped on.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np


def _exp(batch):
    import dataclasses

    from adsr_tpu.core.config import drct_experiment

    # ADSR_BENCH_RES=256 switches every stage to the 256px/window-16
    # geometry (img_size 64, L=4096 — the reference's best-AUC config,
    # src/main.py:243-294); default is the 128px flagship
    res = int(os.environ.get("ADSR_BENCH_RES", "128"))
    exp = drct_experiment(classe="grid", resolution=res, scale=4,
                          precision="bf16")
    return dataclasses.replace(
        exp, data=dataclasses.replace(exp.data, batch_size=batch))


def stage_probe():
    import bench
    print(f"platform_tflops={bench.platform_tflops():.1f}")


def stage_serving():
    """Serving throughput under the current ADSR_TPU_RDG_FOLD_ADJ setting —
    used for the fold-the-adjust-matmul A/B (ops/fused_rdg.py
    _fold_adjust_into_mlp) on the same platform day."""
    import bench
    t0 = time.perf_counter()
    imgs, spread = bench.bench_serving(_exp(4))
    fold = os.environ.get("ADSR_TPU_RDG_FOLD_ADJ", "1")
    print(f"serving fold_adj={fold}: {imgs:.2f} img/s "
          f"(spread {spread * 100:.1f}%, "
          f"wall incl. compile {time.perf_counter() - t0:.0f}s)")


def stage_parity():
    """Deterministic fused train forward vs the flax model, bf16, batch 4 —
    same dB yardstick as the serving parity rows in ARCHITECTURE.md."""
    import jax
    import jax.numpy as jnp

    from adsr_tpu.models.factory import init_sr_params, make_model
    from adsr_tpu.ops.fused_rdg_train import fused_drct_train_forward

    exp = _exp(4)
    model = make_model(exp.model, exp.precision)
    params, _ = init_sr_params(exp.model, jax.random.key(0), exp.precision)
    n = exp.model.img_size
    x = jax.random.uniform(jax.random.key(1), (4, n, n, 1),
                           jnp.float32, 0.0, 255.0)

    ref = jax.jit(lambda p, x: model.apply({"params": p}, x,
                                           deterministic=True))(params, x)
    got = jax.jit(lambda p, x: fused_drct_train_forward(
        p, exp.model, x, deterministic=True, dtype=jnp.bfloat16))(params, x)
    ref, got = np.asarray(ref), np.asarray(got)
    err = float(np.sqrt(np.mean((ref - got) ** 2)))
    db = 20 * np.log10(255.0 / max(err, 1e-12))
    print(f"train-fwd parity: rmse={err:.4f} ({db:.1f} dB vs flax bf16), "
          f"ref_range=[{ref.min():.1f},{ref.max():.1f}]")


def stage_fwdonly(batch: int = 16):
    """Training-grade fused forward ALONE (no grad, no optimizer), chained —
    isolates the fwd kernel + head/tail share of the step so the remaining
    time attributes to the backward kernel + loss + Adam."""
    import functools

    import jax
    import jax.numpy as jnp
    from jax import lax

    import bench
    from adsr_tpu.models.factory import init_sr_params
    from adsr_tpu.ops.fused_rdg_train import fused_drct_train_forward
    from adsr_tpu.train.trainer import fused_train_compiler_options

    exp = _exp(batch)
    params, _ = init_sr_params(exp.model, jax.random.key(0), exp.precision)
    n, s = exp.model.img_size, exp.model.upscale
    x = jax.random.uniform(jax.random.key(1), (batch, n, n, 1),
                           jnp.float32, 0.0, 255.0)
    rng = jax.random.key(2)
    k = 10

    @functools.partial(jax.jit,
                       compiler_options=fused_train_compiler_options(
                           exp.model.img_size))
    def loop(params, x):
        def body(x, i):
            o = fused_drct_train_forward(
                params, exp.model, x, rng=jax.random.fold_in(rng, i),
                deterministic=False, dtype=jnp.bfloat16)
            nxt = jnp.clip(
                o.reshape(batch, n, s, n, s, 1).mean(axis=(2, 4)),
                0.0, 255.0)
            return nxt, jnp.sum(o)
        x, sums = lax.scan(body, x, jnp.arange(k))
        return jnp.sum(sums)

    float(loop(params, x))
    best, _ = bench._timed_best(lambda: float(loop(params, x)), k, 5)
    print(f"train fwd-only batch={batch}: {batch / best:.2f} img/s "
          f"({best * 1e3:.2f} ms/chain-iter)")


def stage_gradonly(batch: int = 16):
    """Fused forward + custom-VJP backward ALONE (value_and_grad of a sum
    loss; no L1/SSIM pipeline, no Adam), chained — with stage_fwdonly this
    splits the full step into fwd kernel / bwd kernel / glue shares."""
    import functools

    import jax
    import jax.numpy as jnp
    from jax import lax

    import bench
    from adsr_tpu.models.factory import init_sr_params
    from adsr_tpu.ops.fused_rdg_train import fused_drct_train_forward
    from adsr_tpu.train.trainer import fused_train_compiler_options

    exp = _exp(batch)
    params, _ = init_sr_params(exp.model, jax.random.key(0), exp.precision)
    n, s = exp.model.img_size, exp.model.upscale
    x = jax.random.uniform(jax.random.key(1), (batch, n, n, 1),
                           jnp.float32, 0.0, 255.0)
    # ADSR_GRADONLY_HR_CONST=1: shift hr far above the output range so the
    # L1 cotangent is VALUE-constant (sign(o-hr) = -1 everywhere) under the
    # identical program — distinguishes value- from program-sensitivity of
    # the constant-cotangent worker fault (see stage docstring)
    hr = jax.random.uniform(jax.random.key(3), (batch, n * s, n * s, 1),
                            jnp.float32, 0.0, 255.0)
    if os.environ.get("ADSR_GRADONLY_HR_CONST") == "1":
        hr = hr + 1e9
    # ADSR_GRADONLY_FLAX=1: differentiate the plain flax/XLA model instead
    # of the fused kernels — discriminates an upstream XLA fault from a
    # kernel fault under the sum-shaped cotangent
    rng = jax.random.key(2)
    if os.environ.get("ADSR_GRADONLY_FLAX") == "1":
        from adsr_tpu.models.factory import make_model
        model = make_model(exp.model, exp.precision)

        def fwd_fn(p, x, i):
            return model.apply({"params": p}, x, deterministic=False,
                               rngs={"dropout": jax.random.fold_in(rng, i)})
    else:
        def fwd_fn(p, x, i):
            return fused_drct_train_forward(
                p, exp.model, x, rng=jax.random.fold_in(rng, i),
                deterministic=False, dtype=jnp.bfloat16)
    k = 10

    @functools.partial(jax.jit,
                       compiler_options=fused_train_compiler_options(
                           exp.model.img_size))
    def loop(params, x):
        def body(x, i):
            def loss(p):
                o = fwd_fn(p, x, i)
                sum_mode = os.environ.get("ADSR_GRADONLY_SUM")
                if sum_mode == "1":
                    # compile-time-constant cotangent — regression probe
                    # for the constant-folded-operand worker fault
                    return jnp.sum(o) * 1e-6, o
                if sum_mode == "2":
                    # same sum structure but a runtime-dependent scale, so
                    # the cotangent cannot constant-fold — isolates folding
                    # (vs the sum structure itself) as the fault trigger
                    return jnp.sum(o) * (1e-6 + jnp.mean(x) * 1e-30), o
                return jnp.mean(jnp.abs(o - hr)), o
            (val, o), grads = jax.value_and_grad(loss, has_aux=True)(params)
            gsum = sum(jnp.sum(jnp.abs(g))
                       for g in jax.tree_util.tree_leaves(grads))
            nxt = jnp.clip(
                o.reshape(batch, n, s, n, s, 1).mean(axis=(2, 4)),
                0.0, 255.0)
            return nxt, val + gsum * 0.0
        x, sums = lax.scan(body, x, jnp.arange(k))
        return jnp.sum(sums)

    float(loop(params, x))
    best, _ = bench._timed_best(lambda: float(loop(params, x)), k, 5)
    print(f"train fwd+bwd-only batch={batch}: {batch / best:.2f} img/s "
          f"({best * 1e3:.2f} ms/chain-iter)")


def stage_train(fused: bool, batch: int = 16):
    os.environ["ADSR_TPU_FUSED_TRAIN"] = "1" if fused else "0"
    import bench
    t0 = time.perf_counter()
    imgs, mfu = bench.bench_train(_exp(batch))
    print(f"train fused={int(fused)} batch={batch}: {imgs:.2f} img/s, "
          f"MFU {mfu:.1f}% (wall incl. compile {time.perf_counter()-t0:.0f}s)")


def main():
    from adsr_tpu.core.runtime import setup_compilation_cache
    setup_compilation_cache()

    stage = sys.argv[1] if len(sys.argv) > 1 else "probe"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    if stage == "probe":
        stage_probe()
    elif stage == "serving":
        stage_serving()
    elif stage == "parity":
        stage_parity()
    elif stage == "fwdonly":
        stage_fwdonly(batch)
    elif stage == "gradonly":
        stage_gradonly(batch)
    elif stage == "fused":
        stage_train(True, batch)
    elif stage == "xla":
        stage_train(False, batch)
    else:
        raise SystemExit(f"unknown stage {stage!r}")


if __name__ == "__main__":
    main()
