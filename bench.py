"""Headline benchmark: DRCT x4 @128px-HR inference throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Timing method: K forward passes chained inside ONE jitted lax.scan (each
iteration's input derived from the previous output) with a value fetch at the
end. This is the only trustworthy method in this environment — the TPU tunnel
short-circuits repeated identical executions, so naive dispatch loops report
physically impossible rates (measured: a plain 8192^3 matmul "ran" at 43 PFLOPS
until chained, then 119 TFLOPS — 60% of v5e peak, sane).

The reference publishes no throughput numbers (BASELINE.md: AUC bar charts
only), so vs_baseline divides by an ESTIMATED H100 PyTorch-eager throughput
for the same model (28M-param DRCT, ~63 GFLOP/image fp16, ~60 blocks of small
kernels): ~250 img/s. The north-star (BASELINE.json) is >=5x that estimate.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
from jax import lax

H100_REF_IMGS_PER_SEC = 250.0
BATCH = 32
K = 10          # chained iterations per timed call


def main() -> None:
    from adsr_tpu.core.config import drct_experiment
    from adsr_tpu.core.runtime import setup_compilation_cache
    from adsr_tpu.models.factory import init_sr_params, make_model

    setup_compilation_cache()

    exp = drct_experiment(classe="grid", resolution=128, scale=4,
                          precision="bf16")
    model = make_model(exp.model, exp.precision)
    params, _ = init_sr_params(exp.model, jax.random.key(0), exp.precision)

    # serving path: fused Pallas SwinBlocks on TPU (ops/fused_drct.py) with
    # weights prepacked once, XLA model otherwise — same dispatch the
    # evaluator/server uses
    use_fused = jax.default_backend() not in ("cpu",)
    if use_fused:
        from adsr_tpu.ops.fused_drct import fused_drct_apply, prepack_drct

        params = prepack_drct(params, exp.model, 32, 32, dtype=jnp.bfloat16)

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
                o.reshape(BATCH, 32, 4, 32, 4, 1).mean(axis=(2, 4)),
                0.0, 255.0)
            return nxt, jnp.sum(o)
        x, sums = lax.scan(body, x, None, length=K)
        return jnp.sum(sums)

    x = jax.random.uniform(jax.random.key(1), (BATCH, 32, 32, 1),
                           jnp.float32, 0.0, 255.0)
    float(loop(params, x))  # warm: compile + one full chain

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(params, x))
        best = min(best, (time.perf_counter() - t0) / K)

    imgs_per_sec = BATCH / best
    print(json.dumps({
        "metric": "DRCT x4 @128px HR inference (batch 32, bf16, chained-scan)",
        "value": round(imgs_per_sec, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(imgs_per_sec / H100_REF_IMGS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
