"""Model factory (reference src/model.py:46-52) + parameter initialisation."""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp

from adsr_tpu.core.config import (
    DRCTModelConfig, DRNModelConfig, EfficientADModelConfig, ModelConfig,
)
from adsr_tpu.models.drct import DRCT
from adsr_tpu.models.drn import DRN, make_dual_models


def compute_dtype(precision: str):
    return jnp.bfloat16 if precision == "bf16" else jnp.float32


def fast_init(init_fn, *args):
    """Run a flax ``model.init`` as ONE low-effort-compiled graph.

    Initialisation executes exactly once, so execution speed is irrelevant —
    but eager init dispatches hundreds of one-off ops (each a tiny compile:
    ~30 s for even the tiniest DRCT on CPU, minutes through a remote-TPU
    tunnel), and a default-effort jitted init still pays full XLA
    optimisation for a run-once graph (21 s vs 6 s at opt level 0 for the
    tiny-DRCT init). Falls back to the plain eager init where the backend
    rejects the compiler option."""
    leaves = jax.tree_util.tree_leaves(args)
    if any(isinstance(a, jax.core.Tracer) for a in leaves):
        return init_fn(*args)  # under an outer trace (eval_shape/jit): inline
    try:
        lowered = jax.jit(init_fn).lower(*args)
        return lowered.compile(
            compiler_options={"xla_backend_optimization_level": "0"})(*args)
    except Exception:
        return init_fn(*args)


def make_model(cfg: ModelConfig, precision: str = "fp32"):
    dtype = compute_dtype(precision)
    if isinstance(cfg, DRCTModelConfig):
        return DRCT(cfg, dtype=dtype)
    if isinstance(cfg, DRNModelConfig):
        return DRN(cfg, dtype=dtype)
    raise ValueError(f"no model for config {type(cfg).__name__}")


def init_sr_params(cfg: ModelConfig, key: jax.Array, precision: str = "fp32"
                   ) -> Tuple[Any, Any]:
    """Initialise primal (and DRN dual) parameters with dummy LR input.

    Returns (model_params, dual_params_tuple_or_None).
    """
    model = make_model(cfg, precision)
    if isinstance(cfg, DRCTModelConfig):
        lr = jnp.zeros((1, cfg.img_size, cfg.img_size, cfg.in_chans))
        variables = fast_init(model.init, {"params": key}, lr)
        return variables["params"], None

    assert isinstance(cfg, DRNModelConfig)
    # smallest LR input: HR/max_scale; use a tiny spatial extent for tracing
    base = 2 * cfg.max_scale
    lr = jnp.zeros((1, base // cfg.max_scale, base // cfg.max_scale,
                    cfg.n_colors))
    variables = fast_init(model.init, {"params": key}, lr)
    duals = make_dual_models(cfg)
    dual_params = []
    phase = len(cfg.scale)
    for i, dual in enumerate(duals):
        # dual i consumes sr[i - n_duals]: spatial size base / 2^(n_duals-1-i)
        s = base // 2 ** (phase - 1 - i)
        dkey = jax.random.fold_in(key, i + 1)
        dv = fast_init(dual.init, {"params": dkey},
                       jnp.zeros((1, s, s, cfg.n_colors)))
        dual_params.append(dv["params"])
    return variables["params"], tuple(dual_params)
