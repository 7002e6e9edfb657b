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
                  max_tiles_per_gaussian: int,
                  sort_mode: str = "quantized") -> BinningResult:
    """Build depth-sorted per-tile Gaussian lists.

    All inputs fixed-shape; the sort runs over N * max_tiles_per_gaussian
    entries (cf. duplicateWithKeys + RadixSort, rasterizer_impl.cu:70-111,
    303-311).

    sort_mode:
      "quantized": one fused u32 key [tile | top depth bits] (positive f32
        bit patterns are monotone). Ties in the truncated depth fall back to
        submission order — a ~2^-11 relative-depth resolution, visually
        indistinguishable and ~2x cheaper than the exact sort.
      "exact": lexicographic (tile, full f32 depth) sort, matching the
        reference's 64-bit [tileID | depth] radix keys exactly.
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
    gidx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None], (n, d_max))
    tile_flat = tile_id.reshape(-1)
    gidx_flat = gidx.reshape(-1)

    if sort_mode == "quantized":
        tile_bits = max(int(num_tiles + 1).bit_length(), 1)
        depth_bits = 32 - tile_bits
        dpos = jnp.maximum(pre.depth, 0.0)  # culled/invalid already sentinel
        dbits = jax.lax.bitcast_convert_type(dpos, jnp.uint32) >> (31 - depth_bits)
        dq = jnp.minimum(dbits, jnp.uint32((1 << depth_bits) - 1))
        key = ((tile_flat.astype(jnp.uint32) << depth_bits)
               | jnp.broadcast_to(dq[:, None], (n, d_max)).reshape(-1))
        sorted_key, sorted_gidx = jax.lax.sort((key, gidx_flat), num_keys=1)
        bounds = (jnp.arange(num_tiles + 1, dtype=jnp.uint32) << depth_bits)
        tile_starts = jnp.searchsorted(sorted_key, bounds,
                                       side="left").astype(jnp.int32)
    elif sort_mode == "exact":
        depth_key = jnp.where(dup_valid, pre.depth[:, None],
                              jnp.inf).astype(jnp.float32)
        sorted_tile, _d, sorted_gidx = jax.lax.sort(
            (tile_flat, depth_key.reshape(-1), gidx_flat), num_keys=2)
        tile_starts = jnp.searchsorted(
            sorted_tile, jnp.arange(num_tiles + 1, dtype=jnp.int32),
            side="left").astype(jnp.int32)
    else:
        raise ValueError(f"unknown sort_mode {sort_mode}")

    tile_counts = (tile_starts[1:] - tile_starts[:-1]).astype(jnp.int32)
    num_rendered = jnp.sum(jnp.minimum(pre.tiles_touched, d_max))
    overflow = jnp.sum(pre.tiles_touched > d_max)
    return BinningResult(sorted_gidx, tile_starts, tile_counts, num_rendered, overflow)
