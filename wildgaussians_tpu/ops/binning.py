"""Tile binning: duplicated (tile, depth) key sort on fixed-capacity buffers.

TPU-native replacement for the reference's CUB pipeline (rasterizer_impl.cu:
198-340): InclusiveSum + duplicateWithKeys + RadixSort + identifyTileRanges.
On TPU there is no dynamic `num_rendered` readback; instead every Gaussian
owns a fixed budget of `max_tiles_per_gaussian` duplicate slots, invalid slots
carry a sentinel tile id and sort to the end, and per-tile ranges come from a
vectorized searchsorted. Everything is fixed-shape -> one compiled program.

The per-Gaussian slot budget replaces the reference's unbounded duplication;
Gaussians whose rect exceeds the budget are truncated (rect rows emitted
row-major first). The returned `overflow` count lets callers monitor this and
pick a larger budget (a recompile) when it is nonzero.
"""
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .gaussians import PreprocessOutput


class BinningResult(NamedTuple):
    sorted_gidx: jnp.ndarray    # [R] gaussian index per duplicated entry, sorted by (tile, depth)
    tile_starts: jnp.ndarray    # [T+1] start offset of each tile's range
    tile_counts: jnp.ndarray    # [T] entries per tile
    num_rendered: jnp.ndarray   # [] total valid duplicated entries
    overflow: jnp.ndarray       # [] number of Gaussians whose rect was truncated


def bin_gaussians(pre: PreprocessOutput, grid_x: int, grid_y: int,
                  max_tiles_per_gaussian: int) -> BinningResult:
    """Build depth-sorted per-tile Gaussian lists.

    All inputs fixed-shape; the sort runs over N * max_tiles_per_gaussian
    entries (cf. duplicateWithKeys + RadixSort, rasterizer_impl.cu:70-111,
    303-311).
    """
    n = pre.depth.shape[0]
    d_max = max_tiles_per_gaussian
    num_tiles = grid_x * grid_y
    sentinel = jnp.int32(num_tiles)

    rect_w = jnp.maximum(pre.rect_max[:, 0] - pre.rect_min[:, 0], 1)
    slots = jnp.arange(d_max, dtype=jnp.int32)
    # slot d covers tile (rect_min + (d % w, d // w)), row-major like
    # duplicateWithKeys' nested loop (rasterizer_impl.cu:70-111)
    ty = pre.rect_min[:, 1:2] + slots[None, :] // rect_w[:, None]
    tx = pre.rect_min[:, 0:1] + slots[None, :] % rect_w[:, None]
    tile_id = ty * grid_x + tx                                     # [N, D]
    dup_valid = (slots[None, :] < pre.tiles_touched[:, None]) & pre.valid[:, None]
    tile_id = jnp.where(dup_valid, tile_id, sentinel).astype(jnp.int32)

    depth_key = jnp.where(dup_valid, pre.depth[:, None], jnp.inf).astype(jnp.float32)
    gidx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None], (n, d_max))

    tile_flat = tile_id.reshape(-1)
    depth_flat = depth_key.reshape(-1)
    gidx_flat = gidx.reshape(-1)

    sorted_tile, _sorted_depth, sorted_gidx = jax.lax.sort(
        (tile_flat, depth_flat, gidx_flat), num_keys=2)

    tile_starts = jnp.searchsorted(sorted_tile, jnp.arange(num_tiles + 1, dtype=jnp.int32),
                                   side="left").astype(jnp.int32)
    tile_counts = (tile_starts[1:] - tile_starts[:-1]).astype(jnp.int32)

    num_rendered = jnp.sum(jnp.minimum(pre.tiles_touched, d_max))
    overflow = jnp.sum(pre.tiles_touched > d_max)
    return BinningResult(sorted_gidx, tile_starts, tile_counts, num_rendered, overflow)
