"""Overlapped-tile serving: big-image SR through a small compiled graph.

The reference handles eval on sizes other than the train resolution only by
recomputing attention masks and clamping window sizes (src/drct.py:426-429,
492-495) — every new size pays a fresh full-model compile and the whole
image's activations must fit on chip. This module instead serves any image
size through a FIXED tile-shaped forward: the LR image is cut into
overlapping tiles, every tile runs the (already compiled) tile forward in
one batch, and the SR tiles are feather-blended so seams vanish.

Blending: each tile's SR output is weighted by a pyramid mask that ramps
from 0 at the tile border to 1 past the overlap band; the accumulated
weighted sum is normalised by the accumulated weight, so regions covered by
one tile keep unit weight and overlap bands interpolate linearly. Tile
starts are clamped so the last tile ends exactly at the image edge.
"""

from __future__ import annotations

from typing import Callable, List

import numpy as np

import jax.numpy as jnp


def tile_starts(size: int, tile: int, overlap: int) -> List[int]:
    """Static start offsets covering [0, size) with `tile`-wide tiles
    overlapping by at least `overlap` pixels."""
    if size <= tile:
        return [0]
    stride = max(1, tile - overlap)
    starts = list(range(0, size - tile, stride)) + [size - tile]
    return sorted(set(starts))


def feather_mask(tile_hr: int, ramp: int) -> np.ndarray:
    """[tile_hr, tile_hr, 1] weight pyramid: linear 1/(r+1)..1 ramp of width
    `ramp` at each border (normalisation restores unit weight at image
    borders where only one tile contributes)."""
    axis = np.minimum(np.arange(tile_hr), np.arange(tile_hr)[::-1])
    w = np.minimum((axis + 1.0) / (ramp + 1.0), 1.0)
    return (w[:, None] * w[None, :])[..., None].astype(np.float32)


def tiled_sr_forward(tile_forward: Callable, lr: jnp.ndarray, tile: int,
                     overlap: int, scale: int) -> jnp.ndarray:
    """SR a [B, H, W, C] LR batch via overlapping [tile, tile] crops.

    ``tile_forward`` maps [N, tile, tile, C] -> [N, tile*scale, tile*scale,
    C] (raw SR, not quantized — blend before quantization). All slicing is
    static, so this whole function jits into one program per (H, W).
    """
    b, h, w, c = lr.shape
    ys, xs = tile_starts(h, tile, overlap), tile_starts(w, tile, overlap)
    if len(ys) == 1 and len(xs) == 1 and h == tile and w == tile:
        return tile_forward(lr)

    crops = [lr[:, y:y + tile, x:x + tile, :] for y in ys for x in xs]
    batched = jnp.concatenate(crops, axis=0)      # [B*nt, tile, tile, C]
    sr_tiles = tile_forward(batched)
    ts = tile * scale
    mask = jnp.asarray(feather_mask(ts, overlap * scale))

    acc = jnp.zeros((b, h * scale, w * scale, c), sr_tiles.dtype)
    wacc = jnp.zeros((b, h * scale, w * scale, 1), sr_tiles.dtype)
    for i, (y, x) in enumerate([(y, x) for y in ys for x in xs]):
        t = sr_tiles[i * b:(i + 1) * b]
        acc = acc.at[:, y * scale:y * scale + ts,
                     x * scale:x * scale + ts, :].add(t * mask)
        wacc = wacc.at[:, y * scale:y * scale + ts,
                       x * scale:x * scale + ts, :].add(mask)
    return acc / wacc
