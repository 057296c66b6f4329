"""Device-mesh runtime layer — the distributed backend the reference lacks.

The reference is strictly single-process / single-GPU (SURVEY.md section 2.9);
its `n_GPUs` flag is vestigial. Here the mesh is first-class: an up-to-3-D
``Mesh(devices, ('dcn', 'dp', 'tp'))`` where

- ``dcn`` is an optional outer data-parallel axis for multi-host pod slices
  (gradient all-reduce over DCN happens once per step on already
  ICI-reduced partials — SURVEY.md section 5.8 "DCN as transparent outer
  axis"); dcn=1 collapses to the 2-D ``('dp', 'tp')`` mesh,
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
    """Build the (dcn x) dp x tp mesh. dp=-1 absorbs all remaining devices.

    With dcn == 1 the mesh is 2-D ``('dp', 'tp')`` (single-host / single-slice
    layout); dcn > 1 adds the outer DCN axis. Device order is preserved, so on
    a real multi-host slice the contiguous per-host device blocks land on the
    inner (ICI) axes and only the outer axis crosses hosts.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    dcn = max(1, getattr(cfg, "dcn", 1))
    tp = max(1, cfg.tp)
    dp = cfg.dp if cfg.dp > 0 else n // (tp * dcn)
    if dcn * dp * tp != n:
        raise ValueError(
            f"mesh {'%dx' % dcn if dcn > 1 else ''}{dp}x{tp} does not cover "
            f"{n} devices")
    if dcn > 1:
        grid = np.asarray(devices).reshape(dcn, dp, tp)
        return Mesh(grid, ("dcn", "dp", "tp"))
    grid = np.asarray(devices).reshape(dp, tp)
    return Mesh(grid, ("dp", "tp"))


def data_axes(mesh: Mesh) -> tuple:
    """The mesh axes the batch dimension is sharded over."""
    return tuple(a for a in ("dcn", "dp") if a in mesh.shape)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis sharded over (dcn,)dp, everything else replicated."""
    return NamedSharding(mesh, P(data_axes(mesh)))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Device-put a pytree of [B, ...] arrays with the batch axis dp-sharded."""
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)
