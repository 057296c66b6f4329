"""DRCT forward performance probes on TPU (coarse attribution by ablation).

Each probe monkeypatches one aspect of the model and re-times the chained-scan
forward; differences attribute time to gelu precision, cyclic shifts, and
window-partition transposes. Architecture-changing probes are for TIMING ONLY.
"""

import time

import jax
import jax.numpy as jnp
from jax import lax

from adsr_tpu.core.runtime import setup_compilation_cache
from adsr_tpu.core.config import drct_experiment
from adsr_tpu.models.factory import init_sr_params, make_model
import adsr_tpu.models.drct as dm

B, K = 32, 10


def timed(tag):
    exp = drct_experiment(classe="grid", resolution=128, scale=4,
                          precision="bf16")
    model = make_model(exp.model, exp.precision)
    params, _ = init_sr_params(exp.model, jax.random.key(0), exp.precision)

    @jax.jit
    def loop(params, x):
        def body(x, _):
            o = model.apply({"params": params}, x, deterministic=True)
            nxt = jnp.clip(o.reshape(B, 32, 4, 32, 4, 1).mean((2, 4)), 0., 255.)
            return nxt, jnp.sum(o)
        x, sums = lax.scan(body, x, None, length=K)
        return jnp.sum(sums)

    x = jax.random.uniform(jax.random.key(1), (B, 32, 32, 1), jnp.float32,
                           0., 255.)
    float(loop(params, x))
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        float(loop(params, x))
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"{tag}: {best*1e3:.2f} ms/batch -> {B/best:.0f} img/s", flush=True)


def main():
    setup_compilation_cache()
    timed("baseline")

    # P1: contiguous-block "windows" (skips the partition transposes)
    orig_part, orig_rev = dm.window_partition, dm.window_reverse
    dm.window_partition = lambda x, w: x.reshape(-1, w * w, x.shape[-1])
    dm.window_reverse = (lambda xw, w, h, wd:
                         xw.reshape(-1, h, wd, xw.shape[-1]))
    timed("no-partition-transpose")
    dm.window_partition, dm.window_reverse = orig_part, orig_rev

    # P2: tanh-approx gelu
    orig_gelu = dm.nn.gelu
    dm.nn.gelu = lambda x, approximate=False: jax.nn.gelu(x, approximate=True)
    timed("approx-gelu")
    dm.nn.gelu = orig_gelu

    # P3: no cyclic shifts (rolls removed; masks skipped)
    orig_roll = dm.jnp.roll
    dm.jnp.roll = lambda x, *a, **k: x
    timed("no-roll")
    dm.jnp.roll = orig_roll


if __name__ == "__main__":
    main()
