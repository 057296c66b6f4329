"""Runtime knobs: persistent compilation cache + device selection helpers.

First DRCT compiles are tens of seconds through the TPU tunnel; the persistent
cache makes every later process start warm.
"""

from __future__ import annotations

import os

import jax

_CACHE_INITIALISED = False


def setup_compilation_cache(path: str = "") -> None:
    global _CACHE_INITIALISED
    if _CACHE_INITIALISED:
        return
    cache_dir = path or os.environ.get(
        "ADSR_TPU_CACHE", os.path.expanduser("~/.cache/adsr_tpu_xla"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _CACHE_INITIALISED = True
    except Exception:
        pass  # cache is an optimisation only


def force_cpu() -> None:
    jax.config.update("jax_platforms", "cpu")
