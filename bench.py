"""Headline benchmark: DRCT x4 @128px-HR on one chip (inference + train step),
with DRN-L and EfficientAD secondary throughputs.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...} where
value/vs_baseline are the serving-throughput headline and the extra keys
report training-step throughput/MFU and the secondary model families
(reference counterparts: src/drn.py:160-270, src/efficientAD.py:460-496).

Timing method: K forward passes chained inside ONE jitted lax.scan (each
iteration's input derived from the previous output) with a value fetch at the
end. This is the only trustworthy method in this environment — the TPU tunnel
short-circuits repeated repeated identical executions, so naive dispatch loops
report physically impossible rates (measured: a plain 8192^3 matmul "ran" at
43 PFLOPS until chained, then 119 TFLOPS — 60% of v5e peak, sane).

Contention robustness: host CPU load skews the chained-scan numbers by ~7%
(measured), so each metric takes the BEST of many timed repeats spread over a
longer window (a repeat is one full K-iteration chain; transient host load
must persist across the whole window to bias the result) and the headline
reports its observed spread.

vs_baseline denominator (anchored; scripts/anchor_baseline.py): the reference
publishes no throughput numbers, so we derive an H100 estimate from the real
reference torch model. Measured on this host: the reference DRCT forward
dispatches 3250 ops (torch.profiler, batch-independent), so H100 eager is
launch-bound at ~16 ms/forward (5 us/launch): the reference's own
one-image-at-a-time eval loop (src/evaluate.py:204-227) sustains ~60 img/s;
granting it batch-32 serving it does not implement, ~1000-2000 img/s
(memory-traffic-bound: eager materialises ~14 GB of intermediates per
batch-32 forward). The denominator 250 img/s (BASELINE.json) sits between
those as a deliberately reference-favouring anchor of the batch-1 number;
the >=5x north-star (1250 img/s) therefore exceeds even the hypothetical
compiled-and-batched reference on its own hardware.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

H100_REF_IMGS_PER_SEC = 250.0   # anchored: see docstring + scripts/anchor_baseline.py
V5E_BF16_PEAK = 197e12          # dense bf16 FLOP/s per v5e chip

# per-family anchors + useful-FLOP constants (scripts/anchor_baseline.py,
# round 4: JAX XLA cost analysis of the scan-UNROLLED rebuilds — exact, the
# scanned configs under-report because cost analysis counts a scan body once)
H100_REF_DRCT256 = 246.0        # launch-bound like 128px (same 3250 ops)
H100_REF_DRN = 972.0            # 823 ops -> 4x the 243 img/s batch-1 bound
H100_REF_EAD = 4759.0           # compute-bound already at batch 1 (62 ops);
                                # anchor capped at the granted-batch-16 rate
DRCT128_FWD_FLOPS = 62.88e9     # per image (the 63e9 used since round 1)
DRCT256_FWD_FLOPS = 298.15e9
DRN_TRAIN_FLOPS = 146.17e9      # per image, whole jitted step (fwd+bwd+Adam)
EAD_TRAIN_FLOPS = 317.71e9      # per image, whole jitted step
BATCH = 128     # throughput-optimal (batch 32: -9%, batch 64: -4%)
K = 10          # chained iterations per timed call
TRAIN_BATCH = 16
TRAIN_K = 5
REPEATS = 16        # headline: best of 16 chains (~25 s window) — transient
                    # host contention must persist across the whole window
                    # to bias the reported best (driver-vs-builder gap was
                    # 11% with naive best-of-3 in round 2)
REPEATS_AUX = 5


def _timed_best(call, k, repeats):
    """Best per-iteration time over ``repeats`` full chains; also returns the
    spread (worst/best - 1) as a contention indicator."""
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        call()
        times.append((time.perf_counter() - t0) / k)
    return min(times), max(times) / min(times) - 1.0


def platform_tflops():
    """Chained 8192^3 bf16 matmul — a model-independent platform-speed probe.
    The tunnel's chip speed varies across days (measured 119 TFLOPS on
    2026-08-16, 112.3 on 2026-08-17 — ~6%, with serving throughput swinging
    with it), so the headline throughput is only comparable across runs
    relative to this number."""
    n, k = 8192, 8
    a = jax.random.normal(jax.random.key(0), (n, n), jnp.bfloat16)
    b = jax.random.normal(jax.random.key(1), (n, n), jnp.bfloat16)

    @jax.jit
    def loop(a, b):
        def body(a, _):
            o = a @ b
            return (o * (1.0 / n)).astype(jnp.bfloat16), jnp.float32(0)
        a, _ = lax.scan(body, a, None, length=k)
        return jnp.sum(a.astype(jnp.float32))

    float(loop(a, b))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(a, b))
        best = min(best, (time.perf_counter() - t0) / k)
    return 2 * n ** 3 / best / 1e12


def bench_serving(exp, repeats=REPEATS, batch=BATCH):
    from adsr_tpu.models.factory import init_sr_params, make_model

    model = make_model(exp.model, exp.precision)
    params, _ = init_sr_params(exp.model, jax.random.key(0), exp.precision)
    lr = exp.model.img_size       # LR side the graph is compiled for
    s = exp.model.upscale         # SR upscale factor

    # serving path: fused Pallas RDG programs on TPU (ops/fused_rdg.py) with
    # weights prepacked once, XLA model otherwise — same dispatch the
    # evaluator/server uses
    use_fused = jax.default_backend() not in ("cpu",)
    if use_fused:
        from adsr_tpu.ops.fused_drct import fused_drct_apply, prepack_drct

        params = prepack_drct(params, exp.model, lr, lr, dtype=jnp.bfloat16)

        def fwd(params, x):
            return fused_drct_apply(params, exp.model, x,
                                    dtype=jnp.bfloat16)
    else:
        def fwd(params, x):
            return model.apply({"params": params}, x, deterministic=True)

    @jax.jit
    def loop(params, x):
        def body(x, _):
            o = fwd(params, x)
            # derive next input from the output -> no execution can be elided
            nxt = jnp.clip(
                o.reshape(batch, lr, s, lr, s, 1).mean(axis=(2, 4)),
                0.0, 255.0)
            return nxt, jnp.sum(o)
        x, sums = lax.scan(body, x, None, length=K)
        return jnp.sum(sums)

    x = jax.random.uniform(jax.random.key(1), (batch, lr, lr, 1),
                           jnp.float32, 0.0, 255.0)
    float(loop(params, x))  # warm: compile + one full chain

    best, spread = _timed_best(lambda: float(loop(params, x)), K, repeats)
    return batch / best, spread


def bench_train(exp, batch: int = TRAIN_BATCH,
                fwd_flops: float = DRCT128_FWD_FLOPS):
    """Training-step throughput + MFU: the real jitted train step (loss,
    grads, Adam update) chained in one scan so no dispatch can be elided."""
    import dataclasses

    from adsr_tpu.train.trainer import make_train_step

    exp = dataclasses.replace(
        exp, data=dataclasses.replace(exp.data, batch_size=batch))
    bundle = make_train_step(exp)
    step, init_state = bundle.raw_step, bundle.init_state
    state = init_state(jax.random.key(0))

    res = exp.data.resolution
    lr_size = res // max(exp.data.scale)
    hr = jax.random.uniform(jax.random.key(2), (batch, res, res, 1),
                            jnp.float32, 0.0, 255.0)
    lr = jax.random.uniform(jax.random.key(3), (batch, lr_size, lr_size, 1),
                            jnp.float32, 0.0, 255.0)
    rng = jax.random.key(4)

    # analytic: fwd GFLOP/img per geometry, bwd ~2x fwd, +1 fwd of recompute
    # (XLA remat on the plain path; in-kernel flash-style recompute on the
    # fused path — same 4x either way, so MFU is comparable across paths)
    # (XLA cost analysis under-counts lax.scan bodies, so not usable here)
    step_flops = batch * fwd_flops * 4.0

    @functools.partial(jax.jit, compiler_options=bundle.compiler_options)
    def loop(state, lr, hr):
        def body(carry, i):
            st, l = carry
            st, metrics = step(st, [l], hr, 2e-4,
                               jax.random.fold_in(rng, i))
            # feed the loss back into the next input so the chain is dense
            l = l + (metrics["total"] * 0.0)
            return (st, l), metrics["total"]
        (state, _), losses = lax.scan(body, (state, lr),
                                      jnp.arange(TRAIN_K))
        return jnp.sum(losses)

    float(loop(state, lr, hr))  # warm
    best, _ = _timed_best(lambda: float(loop(state, lr, hr)),
                          TRAIN_K, REPEATS_AUX)
    imgs = batch / best
    mfu = (step_flops / best / V5E_BF16_PEAK * 100.0) if step_flops else None
    return imgs, mfu


def bench_drn():
    """DRN-L x4 @128px serving + train-step throughput (reference family 2,
    src/drn.py:160-270; the reference's eval loop serves it one image at a
    time, src/evaluate.py:204-227)."""
    import dataclasses

    from adsr_tpu.core.config import drn_experiment
    from adsr_tpu.models.factory import init_sr_params, make_model
    from adsr_tpu.train.trainer import make_train_step

    exp = drn_experiment(classe="grid", resolution=128, scale=4,
                         precision="bf16")
    model = make_model(exp.model, exp.precision)
    params, _ = init_sr_params(exp.model, jax.random.key(0), exp.precision)
    b = 64

    @jax.jit
    def loop(params, x):
        def body(x, _):
            o = model.apply({"params": params}, x, deterministic=True)[-1]
            nxt = jnp.clip(
                o.reshape(b, 32, 4, 32, 4, 1).mean(axis=(2, 4)),
                0.0, 255.0).astype(jnp.float32)   # bf16 model out -> f32 carry
            return nxt, jnp.sum(o)
        x, sums = lax.scan(body, x, None, length=K)
        return jnp.sum(sums)

    x = jax.random.uniform(jax.random.key(1), (b, 32, 32, 1),
                           jnp.float32, 0.0, 255.0)
    float(loop(params, x))
    best, _ = _timed_best(lambda: float(loop(params, x)), K, REPEATS_AUX)
    serve = b / best

    exp = dataclasses.replace(
        exp, data=dataclasses.replace(exp.data, batch_size=TRAIN_BATCH))
    step, init_state, _ = make_train_step(exp)
    state = init_state(jax.random.key(0))
    hr = jax.random.uniform(jax.random.key(2), (TRAIN_BATCH, 128, 128, 1),
                            jnp.float32, 0.0, 255.0)
    lrs = [jax.random.uniform(jax.random.key(3 + i),
                              (TRAIN_BATCH, 128 // s, 128 // s, 1),
                              jnp.float32, 0.0, 255.0)
           for i, s in enumerate(sorted(exp.data.scale, reverse=True))]
    rng = jax.random.key(7)

    @jax.jit
    def tloop(state, lrs, hr):
        def body(carry, i):
            st, l0 = carry
            st, metrics = step(st, [l0] + lrs[1:], hr, 2e-4,
                               jax.random.fold_in(rng, i))
            return (st, l0 + metrics["total"] * 0.0), metrics["total"]
        (state, _), losses = lax.scan(body, (state, lrs[0]),
                                      jnp.arange(TRAIN_K))
        return jnp.sum(losses)

    float(tloop(state, lrs, hr))
    best, _ = _timed_best(lambda: float(tloop(state, lrs, hr)),
                          TRAIN_K, REPEATS_AUX)
    train_imgs = TRAIN_BATCH / best
    train_mfu = train_imgs * DRN_TRAIN_FLOPS / V5E_BF16_PEAK * 100.0
    return serve, train_imgs, train_mfu


def bench_efficientad():
    """EfficientAD-small serving (teacher+student+AE anomaly maps) and train
    step (reference src/efficientAD.py:292-309, 460-496)."""
    import numpy as np

    from adsr_tpu.train.efficientad import EADConfig, EfficientADTrainer

    cfg = EADConfig(train_steps=1000)
    trainer = EfficientADTrainer(cfg, log=lambda *_: None)
    trainer.teacher_mean = jnp.zeros((cfg.out_channels,), jnp.float32)
    trainer.teacher_std = jnp.ones((cfg.out_channels,), jnp.float32)
    b = 16
    s = cfg.image_size
    predict = trainer._predict_maps

    @jax.jit
    def loop(state, tp, tm, ts, x):
        def body(x, _):
            m_st, m_ae = predict(state, tp, tm, ts, x)
            tot = jnp.sum(m_st) + jnp.sum(m_ae)
            return x + tot * 0.0, tot
        x, sums = lax.scan(body, x, None, length=K)
        return jnp.sum(sums)

    x = jax.random.uniform(jax.random.key(1), (b, s, s, 3), jnp.float32)
    args = (trainer.state, trainer.teacher_params, trainer.teacher_mean,
            trainer.teacher_std, x)
    float(loop(*args))
    best, _ = _timed_best(lambda: float(loop(*args)), K, REPEATS_AUX)
    serve = b / best

    step = trainer._train_step
    bt = cfg.batch_size
    img = jax.random.uniform(jax.random.key(2), (bt, s, s, 3), jnp.float32)
    rng = jax.random.key(3)

    @jax.jit
    def tloop(state, tp, tm, ts, img):
        def body(carry, i):
            st, x = carry
            st, metrics = step(st, tp, tm, ts, x, x, 1e-4,
                               jax.random.fold_in(rng, i))
            return (st, x + metrics["total"] * 0.0), metrics["total"]
        (state, _), losses = lax.scan(
            body, (state, img), jnp.arange(TRAIN_K))
        return jnp.sum(losses)

    args = (trainer.state, trainer.teacher_params, trainer.teacher_mean,
            trainer.teacher_std, img)
    float(tloop(*args))
    # train_step donates state; rebuild it fresh per timed call
    import dataclasses as _d  # noqa: F401
    times = []
    for _ in range(REPEATS_AUX):
        t0 = time.perf_counter()
        float(tloop(*args))
        times.append((time.perf_counter() - t0) / TRAIN_K)
    train_imgs = bt / min(times)
    train_mfu = train_imgs * EAD_TRAIN_FLOPS / V5E_BF16_PEAK * 100.0
    return serve, train_imgs, train_mfu


def main() -> None:
    """Deadline-proof staging (the round-4 capture was a timeout with ZERO
    output): the headline serving JSON is printed (flushed) the moment it
    exists, every later stage MERGES its keys and RE-prints the full line,
    and each stage is skipped with a stderr warning when its estimated cost
    would blow the wall-clock budget (ADSR_TPU_BENCH_BUDGET_S). Whatever
    instant the driver's window closes, stdout already carries the best
    JSON line measured so far — the driver parses the last one."""
    from adsr_tpu.core.config import drct_experiment
    from adsr_tpu.core.runtime import setup_compilation_cache

    setup_compilation_cache()
    t0 = time.monotonic()
    # the budget only governs self-skipping of not-yet-started stages;
    # because every completed stage has already re-printed the JSON line,
    # an external kill mid-stage loses nothing — so err LARGE
    budget = float(os.environ.get("ADSR_TPU_BENCH_BUDGET_S", "2400"))
    out: dict = {}

    def emit():
        print(json.dumps(out), flush=True)

    def _warn(name, exc):
        # secondary metrics must not sink the headline, but their failure
        # must be VISIBLE (a silent except here once hid a DRN regression
        # for a full bench cycle) — stderr keeps the stdout JSON contract
        import traceback
        print(f"bench: {name} failed: {exc!r}", file=sys.stderr)
        traceback.print_exc(limit=3, file=sys.stderr)

    def stage(name, est_s, fn):
        """Run one stage if the budget allows; merge its keys and re-emit."""
        left = budget - (time.monotonic() - t0)
        if left < est_s:
            print(f"bench: SKIP {name} (est {est_s:.0f}s > {left:.0f}s "
                  "left in budget)", file=sys.stderr, flush=True)
            return
        ts = time.monotonic()
        try:
            out.update(fn())
        except Exception as e:
            _warn(name, e)
            return
        print(f"bench: {name} done in {time.monotonic() - ts:.0f}s",
              file=sys.stderr, flush=True)
        emit()

    exp = drct_experiment(classe="grid", resolution=128, scale=4,
                          precision="bf16")
    exp256 = drct_experiment(classe="grid", resolution=256, scale=4,
                             precision="bf16")

    # ---- headline (always attempted; everything else is best-effort) ----
    imgs_per_sec, spread = bench_serving(exp)
    out.update({
        "metric": f"DRCT x4 @128px HR inference (batch {BATCH}, bf16, "
                  "chained-scan)",
        "value": round(imgs_per_sec, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(imgs_per_sec / H100_REF_IMGS_PER_SEC, 3),
        "serving_spread_pct": round(spread * 100.0, 1),
    })
    emit()

    # ---- secondaries, cheapest compile first; est_s are cold-compile-
    # inclusive hardware estimates (warm runs finish far faster) ----
    def s_tflops():
        if jax.default_backend() == "cpu":
            return {}
        return {"platform_tflops_8k_matmul": round(platform_tflops(), 1)}

    def s_train():
        train_imgs, train_mfu = bench_train(exp)
        d = {"train_imgs_per_sec": round(train_imgs, 2)}
        if train_mfu is not None:
            d["train_mfu_pct"] = round(train_mfu, 1)
        return d

    def s_drn():
        drn_serve, drn_train, drn_mfu = bench_drn()
        return {"drn_imgs_per_sec": round(drn_serve, 2),
                "drn_vs_baseline": round(drn_serve / H100_REF_DRN, 3),
                "drn_train_imgs_per_sec": round(drn_train, 2),
                "drn_train_mfu_pct": round(drn_mfu, 1)}

    def s_ead():
        ead_serve, ead_train, ead_mfu = bench_efficientad()
        # EfficientAD is compute-bound even in the reference's eager loop
        # (62 dispatches/forward), so this family's per-chip ratio tracks
        # the raw H100:v5e peak gap (5.0x) more than software quality —
        # the MFU keys are the meaningful efficiency statement
        return {"ead_imgs_per_sec": round(ead_serve, 2),
                "ead_vs_baseline": round(ead_serve / H100_REF_EAD, 3),
                "ead_train_imgs_per_sec": round(ead_train, 2),
                "ead_train_mfu_pct": round(ead_mfu, 1)}

    def s_drct256():
        # the reference's best-AUC geometry (256px HR, window 16, N=256 —
        # src/main.py:286) through the same fused serving path
        drct256, _ = bench_serving(exp256, repeats=REPEATS_AUX, batch=8)
        return {"drct256_imgs_per_sec": round(drct256, 2),
                "drct256_vs_baseline": round(drct256 / H100_REF_DRCT256, 3)}

    def s_train256():
        # the 256px geometry through the trainer's default path for it —
        # since round 5 the fused custom-VJP split backward
        # (ops/fused_rdg_train.py:_bwd_split; 41.2 img/s / 24.9% MFU vs
        # the XLA+remat fallback's 21.1 / 12.8%)
        train256_imgs, train256_mfu = bench_train(
            exp256, batch=8, fwd_flops=DRCT256_FWD_FLOPS)
        return {"train256_imgs_per_sec": round(train256_imgs, 2),
                "train256_mfu_pct": round(train256_mfu, 1)}

    def s_drct512x8():
        # BASELINE.md's best DRCT rows are x8 (grid 512/x8): serve the
        # 512px-HR geometry (LR 64, window 16, 3-stage PixelShuffle)
        # through the same fused path
        from adsr_tpu.core.config import drct_experiment as _dx
        exp512 = _dx(classe="grid", resolution=512, scale=8,
                     precision="bf16")
        v, _ = bench_serving(exp512, repeats=REPEATS_AUX, batch=8)
        return {"drct512x8_imgs_per_sec": round(v, 2)}

    stage("platform_tflops", 45, s_tflops)
    stage("train128", 240, s_train)
    stage("drn", 180, s_drn)
    stage("efficientad", 180, s_ead)
    stage("drct256_serving", 300, s_drct256)
    stage("drct512x8_serving", 300, s_drct512x8)
    stage("train256", 420, s_train256)
    emit()


if __name__ == "__main__":
    main()
