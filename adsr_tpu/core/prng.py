"""PRNG handling: explicit jax.random keys replacing the reference's global
seeding (reference src/main.py:26-33). One root key per experiment, folded by
purpose so data sampling, model init, and dropout draw independent streams."""

from __future__ import annotations

import jax


# Stable fold constants so streams stay disjoint across purposes.
_STREAMS = {"init": 0, "data": 1, "dropout": 2, "eval": 3}


def root_key(seed: int) -> jax.Array:
    return jax.random.key(seed)


def stream(key: jax.Array, name: str) -> jax.Array:
    """Derive the named sub-stream from the experiment root key."""
    return jax.random.fold_in(key, _STREAMS[name])


def epoch_key(key: jax.Array, epoch: int) -> jax.Array:
    """Per-epoch data key: deterministic given (seed, epoch)."""
    return jax.random.fold_in(key, epoch)
