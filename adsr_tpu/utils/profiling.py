"""Tracing / profiling utilities (SURVEY.md section 5.1).

The reference hand-rolls a data-vs-model timer (reference src/trainer.py:21-42,
152-155) and defines analytic flops() methods it never sums. Here:

- ``StepTimer``: the same data/model split semantics, host-side;
- ``trace``: context manager around jax.profiler for real TPU traces
  (tensorboard-viewable), replacing torch's absent profiler integration;
- ``flops_estimate``: sum XLA's own cost analysis for a jitted fn — the
  working equivalent of the reference's never-summed analytic flops.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


class StepTimer:
    """Accumulating split timer: data wait vs device compute per log window."""

    def __init__(self) -> None:
        self.data_acc = 0.0
        self.model_acc = 0.0
        self._t0 = time.perf_counter()

    def data_done(self) -> None:
        t = time.perf_counter()
        self.data_acc += t - self._t0
        self._t0 = t

    def model_done(self) -> None:
        t = time.perf_counter()
        self.model_acc += t - self._t0
        self._t0 = t

    def release(self) -> tuple:
        out = (self.model_acc, self.data_acc)
        self.data_acc = self.model_acc = 0.0
        self._t0 = time.perf_counter()
        return out


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/adsr_tpu_trace") -> Iterator[None]:
    """jax.profiler trace window; open with tensorboard/xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def flops_estimate(jitted_fn, *args) -> Optional[float]:
    """Total FLOPs of one invocation per XLA cost analysis (None if absent)."""
    try:
        compiled = jitted_fn.lower(*args).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return float(cost.get("flops", 0.0))
    except Exception:
        return None
