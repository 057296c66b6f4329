"""Timing probes for the fused RDG serving path (hardware, chained scan).

Usage: python scripts/probe_fused_serving.py [tag]
Honours the kernel's env flags (ADSR_TPU_RDG_PROBE / _GROUP / _CHAINS /
_IMGS / _FOLD_ADJ ...), so one invocation = one kernel variant. Prints
ms/batch and img/s for the full fused serving forward (batch 128 default).
Probe variants are TIMING ONLY — numerics may be garbage.
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

from adsr_tpu.core.runtime import setup_compilation_cache
from adsr_tpu.core.config import drct_experiment
from adsr_tpu.models.factory import init_sr_params

B = int(os.environ.get("PROBE_BATCH", "128"))
K = int(os.environ.get("PROBE_K", "10"))
REPEATS = int(os.environ.get("PROBE_REPEATS", "8"))


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "probe"
    setup_compilation_cache()
    exp = drct_experiment(classe="grid", resolution=128, scale=4,
                          precision="bf16")
    params, _ = init_sr_params(exp.model, jax.random.key(0), exp.precision)

    from adsr_tpu.ops.fused_drct import fused_drct_apply, prepack_drct
    params = prepack_drct(params, exp.model, 32, 32, dtype=jnp.bfloat16)

    @jax.jit
    def loop(params, x):
        def body(x, _):
            o = fused_drct_apply(params, exp.model, x, dtype=jnp.bfloat16)
            nxt = jnp.clip(
                o.reshape(B, 32, 4, 32, 4, 1).mean(axis=(2, 4)), 0.0, 255.0)
            return nxt, jnp.sum(o)
        x, sums = lax.scan(body, x, None, length=K)
        return jnp.sum(sums)

    x = jax.random.uniform(jax.random.key(1), (B, 32, 32, 1),
                           jnp.float32, 0.0, 255.0)
    t0 = time.perf_counter()
    float(loop(params, x))
    print(f"{tag}: warm (compile+1 chain) {time.perf_counter()-t0:.1f}s",
          flush=True)
    best = 1e9
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        float(loop(params, x))
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"{tag}: {best*1e3:.2f} ms/batch -> {B/best:.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
