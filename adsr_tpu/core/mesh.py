"""Device-mesh runtime layer — the distributed backend the reference lacks.

The reference is strictly single-process / single-GPU (SURVEY.md section 2.9);
its `n_GPUs` flag is vestigial. Here the mesh is first-class: a 2-D
``Mesh(devices, ('dp', 'tp'))`` where

- ``dp`` shards the batch dimension over ICI (gradients all-reduced by XLA's
  GSPMD partitioner when params are replicated and the batch is dp-sharded),
- ``tp`` optionally shards DRCT's attention/MLP channel dimension.

world_size=1 collapses to the reference's single-stream semantics — the same
jitted train step runs unchanged on one chip or a pod slice.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from adsr_tpu.core.config import MeshConfig


def make_mesh(cfg: MeshConfig = MeshConfig(),
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build the dp x tp mesh. dp=-1 absorbs all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    tp = max(1, cfg.tp)
    dp = cfg.dp if cfg.dp > 0 else n // tp
    if dp * tp != n:
        raise ValueError(f"mesh {dp}x{tp} does not cover {n} devices")
    grid = np.asarray(devices).reshape(dp, tp)
    return Mesh(grid, ("dp", "tp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis sharded over dp, everything else replicated."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Device-put a pytree of [B, ...] arrays with the batch axis dp-sharded."""
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)
