"""Minimal hardware repro for the round-4 fused-train backward fault.

One RDG (num_layers=1) at the flagship per-RDG geometry (embed 180, window 8,
img 32) through value_and_grad of the fused custom-VJP forward — compiles in
a fraction of the full 12-RDG chained-loop's time, so kernel bisects iterate
fast.  Knobs:

  ADSR_REPRO_LAYERS  (default 1)   number of RDGs
  ADSR_REPRO_BATCH   (default 2)
  ADSR_REPRO_RES     (default 128) 128 -> img 32/win 8; 256 -> img 64/win 16
"""

import os
import sys

import numpy as np

import jax
import jax.numpy as jnp


def main():
    from adsr_tpu.core.runtime import setup_compilation_cache
    setup_compilation_cache()

    from adsr_tpu.core.config import DRCTModelConfig
    from adsr_tpu.models.factory import init_sr_params
    from adsr_tpu.ops.fused_rdg_train import fused_drct_train_forward
    from adsr_tpu.train.trainer import fused_train_compiler_options

    layers = int(os.environ.get("ADSR_REPRO_LAYERS", "1"))
    batch = int(os.environ.get("ADSR_REPRO_BATCH", "2"))
    res = int(os.environ.get("ADSR_REPRO_RES", "128"))
    img, win = (32, 8) if res == 128 else (64, 16)
    cfg = DRCTModelConfig(upscale=4, img_size=img, window_size=win,
                          in_chans=1, embed_dim=180, num_layers=layers,
                          num_heads=6, gc=32, scan_layers=True)
    params, _ = init_sr_params(cfg, jax.random.key(0), "bf16")
    x = jax.random.uniform(jax.random.key(1), (batch, img, img, 1),
                           jnp.float32, 0.0, 255.0)
    hr = jax.random.uniform(jax.random.key(2), (batch, img * 4, img * 4, 1),
                            jnp.float32, 0.0, 255.0)

    k = int(os.environ.get("ADSR_REPRO_SCAN", "0"))
    if k:
        # the gradonly-stage shape: k chained iterations inside one scan,
        # SR fed back as the next LR (bench chaining defeats the tunnel's
        # dispatch elision)
        from jax import lax

        @jax.jit
        def loop(params, x):
            def body(x, i):
                def loss(p):
                    o = fused_drct_train_forward(
                        p, cfg, x, rng=jax.random.fold_in(jax.random.key(3),
                                                          i),
                        deterministic=False, dtype=jnp.bfloat16)
                    return jnp.mean(jnp.abs(o - hr)), o
                (val, o), grads = jax.value_and_grad(loss, has_aux=True)(
                    params)
                gsum = sum(jnp.sum(jnp.abs(g))
                           for g in jax.tree_util.tree_leaves(grads))
                nxt = jnp.clip(
                    o.reshape(batch, img, 4, img, 4, 1).mean(axis=(2, 4)),
                    0.0, 255.0)
                return nxt, val + gsum * 0.0
            x, sums = lax.scan(body, x, jnp.arange(k))
            return jnp.sum(sums)

        loop = jax.jit(loop, compiler_options=fused_train_compiler_options(img))
        print(f"repro scan ok: {float(loop(params, x)):.4f}")
        return

    def loss(p):
        o = fused_drct_train_forward(p, cfg, x, rng=jax.random.key(3),
                                     deterministic=False,
                                     dtype=jnp.bfloat16)
        return jnp.mean(jnp.abs(o - hr))

    f = jax.jit(jax.value_and_grad(loss),
                compiler_options=fused_train_compiler_options(img))
    val, grads = f(params)
    gsum = sum(float(jnp.sum(jnp.abs(g)))
               for g in jax.tree_util.tree_leaves(grads))
    print(f"repro ok: loss={float(val):.4f} gsum={gsum:.3e}")


if __name__ == "__main__":
    main()
