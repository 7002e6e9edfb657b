"""Pallas TPU tile-blend kernels (production fast path).

Same math as rasterize_tiled.py (prefix sums in log-transmittance space), but
the per-chunk working set lives in VMEM instead of round-tripping HBM:

  - grid = one program per 16x16 tile; per-tile entry ranges via scalar
    prefetch (tile_starts), contiguous dynamic-slice DMA of the depth-sorted
    entry table (the analogue of the CUDA kernel's cooperative shared-memory
    staging, forward.cu:316-343)
  - layout: pixels (256) ride the sublane axis, chunk Gaussians (K=256) the
    lane axis, so the entry-table DMA slices are lane-aligned; the inclusive
    prefix-sum of log(1-alpha) along the chunk is an upper-triangular matmul
    on the MXU, and color accumulation a [P,K]x[K,3] matmul
  - per-tile early exit (T < 1e-4 everywhere) via a while loop over chunks
  - backward: per-entry gradients written contiguously (no atomics; each
    sorted entry belongs to exactly one tile), reduced to per-Gaussian slots
    by one deterministic XLA scatter-add — replacing backward.cu's atomicAdd

Entry table layout [16, R + K] f32 (K columns of zero padding so the final
chunk never clips): rows x, y, conic_a, conic_b, conic_c, opacity, r, g, b.
Per-entry gradient rows: dmx, dmy, da, db, dc, dop, dr, dg, db, dabs.
Forward output is packed [T, 256, 8]: cols 0..2 = rgb, col 3 = final_T.
"""
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .rasterize_tiled import (ALPHA_MAX, ALPHA_MIN, T_EPS, TileGrid,
                              tiles_to_image)

P_PIX = 256  # 16x16 tile
ATTR_W = 16
_HIGH = jax.lax.Precision.HIGHEST


def _triu(K):
    """Upper-triangular ones [K,K]: l @ triu = inclusive prefix along lanes."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (K, K), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (K, K), 1)
    return (rows <= cols).astype(jnp.float32)


def _pixel_coords(grid: TileGrid, t):
    ts = grid.tile_size
    ox = (t % grid.grid_x) * ts
    oy = (t // grid.grid_x) * ts
    ii = jax.lax.broadcasted_iota(jnp.int32, (P_PIX, 1), 0)
    px = (ox + ii % ts).astype(jnp.float32)
    py = (oy + ii // ts).astype(jnp.float32)
    return px, py


def _chunk_fwd_math(entries, px, py, em, t_carry, stopped_f, triu):
    """Forward recurrence for one chunk. entries [ATTR_W, K]; returns [P,K]
    tensors + per-pixel [P,1] carries. `stopped_f` is a 0/1 float mask
    (Mosaic cannot carry i1 vectors through scf.while)."""
    x = entries[0:1, :]
    y = entries[1:2, :]
    ca = entries[2:3, :]
    cb = entries[3:4, :]
    cc = entries[4:5, :]
    op = entries[5:6, :]
    dx = x - px                     # [P,K]
    dy = y - py
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    alpha = jnp.minimum(ALPHA_MAX, op * jnp.exp(power))
    use = em & (power <= 0.0) & (alpha >= ALPHA_MIN)
    l = jnp.where(use, jnp.log1p(-jnp.where(use, alpha, 0.0)), 0.0)
    S = jnp.dot(l, triu, preferred_element_type=jnp.float32)   # inclusive
    t_at = t_carry * jnp.exp(S - l)                            # exclusive
    alive = t_carry * jnp.exp(S) >= T_EPS
    contrib = use & alive & (stopped_f < 0.5)
    w = jnp.where(contrib, alpha * t_at, 0.0)
    new_t = t_carry * jnp.exp(
        jnp.sum(jnp.where(contrib, l, 0.0), axis=1, keepdims=True))
    new_stopped = jnp.maximum(
        stopped_f,
        jnp.max(jnp.where(use & jnp.logical_not(alive), 1.0, 0.0),
                axis=1, keepdims=True))
    return dict(dx=dx, dy=dy, alpha=alpha, use=use, l=l, t_at=t_at,
                contrib=contrib, w=w, new_t=new_t, new_stopped=new_stopped)


def _chunk_dma(entries_hbm, ebuf, sem, start, c, K, slot):
    off = pl.multiple_of(start + c * K, 128)
    return pltpu.make_async_copy(
        entries_hbm.at[:, pl.ds(off, K)], ebuf.at[slot], sem.at[slot])


def _fwd_kernel(starts_ref, entries_hbm, out_pack, ebuf, sem,
                *, grid: TileGrid, K: int):
    t = pl.program_id(0)
    start = starts_ref[t]
    count = starts_ref[t + 1] - start
    px, py = _pixel_coords(grid, t)
    triu = _triu(K)
    kidx = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)
    n_chunks = pl.cdiv(count, K)

    @pl.when(n_chunks > 0)
    def _():
        _chunk_dma(entries_hbm, ebuf, sem, start, 0, K, 0).start()

    def cond(state):
        c, _color, t_carry, _stopped = state
        return (c < n_chunks) & (jnp.max(t_carry) >= T_EPS)

    def body(state):
        c, color, t_carry, stopped = state
        slot = jax.lax.rem(c, 2)
        _chunk_dma(entries_hbm, ebuf, sem, start, c, K, slot).wait()

        @pl.when(c + 1 < n_chunks)
        def _():
            _chunk_dma(entries_hbm, ebuf, sem, start, c + 1, K, 1 - slot).start()

        entries = ebuf[slot]
        em = (c * K + kidx) < count
        st = _chunk_fwd_math(entries, px, py, em, t_carry, stopped, triu)
        col = entries[6:9, :]                                    # [3,K]
        color = color + jax.lax.dot_general(
            st["w"], col, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)                  # [P,3]
        return c + 1, color, st["new_t"], st["new_stopped"]

    init = (jnp.int32(0),
            jnp.zeros((P_PIX, 3), jnp.float32),
            jnp.ones((P_PIX, 1), jnp.float32),
            jnp.zeros((P_PIX, 1), jnp.float32))
    c_fin, color, t_carry, _ = jax.lax.while_loop(cond, body, init)

    # drain the prefetch left outstanding by an early exit
    @pl.when(c_fin < n_chunks)
    def _():
        _chunk_dma(entries_hbm, ebuf, sem, start, c_fin, K,
                   jax.lax.rem(c_fin, 2)).wait()

    out_pack[0, :, :] = jnp.concatenate(
        [color, t_carry, jnp.zeros((P_PIX, 4), jnp.float32)], axis=1)


def _bwd_kernel(starts_ref, entries_hbm, cot_pack, fwd_pack, egrad_hbm,
                ebuf, gbuf, sem, sem2, *, grid: TileGrid, K: int):
    t = pl.program_id(0)
    start = starts_ref[t]
    count = starts_ref[t + 1] - start
    px, py = _pixel_coords(grid, t)
    triu = _triu(K)
    kidx = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)
    n_chunks = pl.cdiv(count, K)

    @pl.when(n_chunks > 0)
    def _():
        _chunk_dma(entries_hbm, ebuf, sem, start, 0, K, 0).start()

    gc = cot_pack[0, :, 0:3]                     # [P,3]
    gt_eff = cot_pack[0, :, 3:4]                 # [P,1]
    out_nobg = fwd_pack[0, :, 0:3]
    final_t = fwd_pack[0, :, 3:4]
    out_dot_g = jnp.sum(out_nobg * gc, axis=1, keepdims=True)    # [P,1]

    def cond(state):
        c, t_carry, _acc, _stopped = state
        return (c < n_chunks) & (jnp.max(t_carry) >= T_EPS)

    def body(state):
        c, t_carry, acc_dot, stopped = state
        slot = jax.lax.rem(c, 2)
        _chunk_dma(entries_hbm, ebuf, sem, start, c, K, slot).wait()

        @pl.when(c + 1 < n_chunks)
        def _():
            _chunk_dma(entries_hbm, ebuf, sem, start, c + 1, K, 1 - slot).start()

        entries = ebuf[slot]
        em = (c * K + kidx) < count
        st = _chunk_fwd_math(entries, px, py, em, t_carry, stopped, triu)
        dx, dy, alpha, use, w = st["dx"], st["dy"], st["alpha"], st["use"], st["w"]

        col = entries[6:9, :]                                        # [3,K]
        cg = jnp.dot(gc, col, preferred_element_type=jnp.float32)    # [P,K]
        wcg = w * cg
        prefix = jnp.dot(wcg, triu, preferred_element_type=jnp.float32) + acc_dot
        suffix = out_dot_g - prefix
        one_m_a = jnp.where(use, 1.0 - alpha, 1.0)
        dalpha = jnp.where(
            st["contrib"],
            st["t_at"] * cg - (suffix + gt_eff * final_t) / one_m_a, 0.0)
        dalpha_eff = jnp.where(alpha >= ALPHA_MAX, 0.0, dalpha)
        op = entries[5:6, :]
        epow = jnp.where(use, alpha / jnp.where(use, op, 1.0), 0.0)
        dop = jnp.sum(dalpha_eff * epow, axis=0, keepdims=True)      # [1,K]
        dpower = dalpha_eff * alpha

        ca = entries[2:3, :]
        cb = entries[3:4, :]
        cc = entries[4:5, :]
        dmx_pix = dpower * (-(ca * dx + cb * dy))
        dmy_pix = dpower * (-(cc * dy + cb * dx))
        # dcol [3,K]: contract the pixel axis
        dcol = jax.lax.dot_general(gc, w, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

        g = jnp.concatenate([
            jnp.sum(dmx_pix, axis=0, keepdims=True),
            jnp.sum(dmy_pix, axis=0, keepdims=True),
            jnp.sum(dpower * (-0.5 * dx * dx), axis=0, keepdims=True),
            jnp.sum(dpower * (-dx * dy), axis=0, keepdims=True),
            jnp.sum(dpower * (-0.5 * dy * dy), axis=0, keepdims=True),
            dop,
            dcol,
            jnp.sum(jnp.abs(dmx_pix), axis=0, keepdims=True)
            + jnp.sum(jnp.abs(dmy_pix), axis=0, keepdims=True),
            jnp.zeros((ATTR_W - 10, K), jnp.float32),
        ], axis=0)
        off = pl.multiple_of(start + c * K, 128)
        gslot = jax.lax.rem(c, 2)
        # wait for the previous grad writeback using this slot (c-2)
        @pl.when(c >= 2)
        def _():
            pltpu.make_async_copy(
                gbuf.at[gslot],
                egrad_hbm.at[:, pl.ds(pl.multiple_of(start + (c - 2) * K, 128), K)],
                sem2.at[gslot]).wait()
        gbuf[gslot] = jnp.where(em, g, 0.0)
        pltpu.make_async_copy(gbuf.at[gslot],
                              egrad_hbm.at[:, pl.ds(off, K)],
                              sem2.at[gslot]).start()

        acc_dot = acc_dot + jnp.sum(wcg, axis=1, keepdims=True)
        return c + 1, st["new_t"], acc_dot, st["new_stopped"]

    init = (jnp.int32(0), jnp.ones((P_PIX, 1), jnp.float32),
            jnp.zeros((P_PIX, 1), jnp.float32), jnp.zeros((P_PIX, 1), jnp.float32))
    c_fin, _, _, _ = jax.lax.while_loop(cond, body, init)

    # drain: the early-exit prefetch and the last (up to two) grad writebacks
    @pl.when(c_fin < n_chunks)
    def _():
        _chunk_dma(entries_hbm, ebuf, sem, start, c_fin, K,
                   jax.lax.rem(c_fin, 2)).wait()

    def _drain_grad(ci):
        @pl.when(ci >= 0)
        def _():
            pltpu.make_async_copy(
                gbuf.at[jax.lax.rem(ci, 2)],
                egrad_hbm.at[:, pl.ds(pl.multiple_of(start + ci * K, 128), K)],
                sem2.at[jax.lax.rem(ci, 2)]).wait()
    _drain_grad(c_fin - 2)
    _drain_grad(c_fin - 1)


def _interpret() -> bool:
    """Interpreter mode off-TPU so the kernels are CPU-testable."""
    return jax.default_backend() != "tpu"


@functools.lru_cache(maxsize=32)
def _make_pallas_calls(grid: TileGrid, K: int, R_pad: int):
    T_tiles = grid.num_tiles
    interpret = _interpret()

    fwd_call = pl.pallas_call(
        functools.partial(_fwd_kernel, grid=grid, K=K),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(T_tiles,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=[pl.BlockSpec((1, P_PIX, 8), lambda i, *_: (i, 0, 0))],
            scratch_shapes=[
                pltpu.VMEM((2, ATTR_W, K), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct((T_tiles, P_PIX, 8), jnp.float32)],
        interpret=interpret,
    )

    bwd_call = pl.pallas_call(
        functools.partial(_bwd_kernel, grid=grid, K=K),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(T_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.HBM),                    # entries
                pl.BlockSpec((1, P_PIX, 8), lambda i, *_: (i, 0, 0)),    # cot
                pl.BlockSpec((1, P_PIX, 8), lambda i, *_: (i, 0, 0)),    # fwd out
            ],
            out_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
            scratch_shapes=[
                pltpu.VMEM((2, ATTR_W, K), jnp.float32),
                pltpu.VMEM((2, ATTR_W, K), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct((ATTR_W, R_pad), jnp.float32)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            has_side_effects=True),
        interpret=interpret,
    )
    return fwd_call, bwd_call


def align_tile_ranges(sorted_gidx, tile_starts, n, alignment, out_capacity):
    """Repack sorted entries so every tile's segment starts at a multiple of
    `alignment` (required: Mosaic must prove DMA offsets are lane-aligned).

    Padding slots get gaussian-index n (masked everywhere). Returns
    (aligned_gidx [out_capacity], aligned_starts [T+1]).
    """
    counts = tile_starts[1:] - tile_starts[:-1]
    aligned_sizes = ((counts + alignment - 1) // alignment) * alignment
    aligned_starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(aligned_sizes).astype(jnp.int32)])
    q = jnp.arange(out_capacity, dtype=jnp.int32)
    t_of_q = jnp.clip(
        jnp.searchsorted(aligned_starts, q, side="right").astype(jnp.int32) - 1,
        0, counts.shape[0] - 1)
    q_local = q - aligned_starts[t_of_q]
    valid = (q_local < counts[t_of_q]) & (q < aligned_starts[-1])
    old = jnp.clip(tile_starts[t_of_q] + q_local, 0, sorted_gidx.shape[0] - 1)
    gidx = jnp.where(valid, sorted_gidx[old], n)
    # clamp starts into capacity (overflow monitored via num_rendered upstream)
    aligned_starts = jnp.minimum(aligned_starts, out_capacity)
    return gidx, aligned_starts


def _pack_entries(mean2d, conic, opacity, colors, aligned_gidx, pad_cols):
    """Entry table [ATTR_W, R + pad] built by per-attribute row gathers
    (sequential writes; a row-major gather + transpose was measured to
    dominate the pallas path). Padding slots (gidx == n) gather a zero
    sentinel row -> alpha 0 -> skipped by the 1/255 floor."""
    n = mean2d.shape[0]
    gid = jnp.minimum(aligned_gidx, n)
    R = aligned_gidx.shape[0]

    def row(col):
        padded = jnp.concatenate([col, jnp.zeros((1,), jnp.float32)])
        return padded[gid][None, :]

    rows = [row(mean2d[:, 0]), row(mean2d[:, 1]),
            row(conic[:, 0]), row(conic[:, 1]), row(conic[:, 2]),
            row(opacity),
            row(colors[:, 0]), row(colors[:, 1]), row(colors[:, 2]),
            jnp.zeros((ATTR_W - 9, R), jnp.float32)]
    entries = jnp.concatenate(rows, axis=0)
    return jnp.concatenate(
        [entries, jnp.zeros((ATTR_W, pad_cols), jnp.float32)], axis=1)


@functools.lru_cache(maxsize=32)
def _make_pallas_blend_vjp(grid: TileGrid, K: int, R: int):
    R_pad = R + K
    fwd_call, bwd_call = _make_pallas_calls(grid, K, R_pad)
    T_tiles = grid.num_tiles

    def forward(mean2d, conic, opacity, colors, sorted_gidx, tile_starts, bg):
        entries = _pack_entries(mean2d, conic, opacity, colors, sorted_gidx, K)
        (pack,) = fwd_call(tile_starts, entries)
        C = pack[:, :, 0:3]
        final_t = pack[:, :, 3]
        C = C + final_t[..., None] * bg[None, None, :]
        return C, final_t, entries

    @jax.custom_vjp
    def blend(mean2d, conic, opacity, colors, absgrad_hook,
              sorted_gidx, tile_starts, bg):
        del absgrad_hook
        C, T, _ = forward(mean2d, conic, opacity, colors, sorted_gidx,
                          tile_starts, bg)
        return C, T

    def fwd(mean2d, conic, opacity, colors, absgrad_hook,
            sorted_gidx, tile_starts, bg):
        del absgrad_hook
        C, T, entries = forward(mean2d, conic, opacity, colors, sorted_gidx,
                                tile_starts, bg)
        return (C, T), (entries, sorted_gidx, tile_starts, bg, C, T,
                        mean2d.shape[0])

    def bwd(res, cot):
        entries, sorted_gidx, tile_starts, bg, C_out, final_t, n = res
        gC, gT = cot
        out_nobg = C_out - final_t[..., None] * bg[None, None, :]
        gt_eff = gT + jnp.einsum("tpc,c->tp", gC, bg, precision=_HIGH)
        cot_pack = jnp.concatenate(
            [gC, gt_eff[..., None],
             jnp.zeros((T_tiles, P_PIX, 4), jnp.float32)], axis=-1)
        fwd_pack = jnp.concatenate(
            [out_nobg, final_t[..., None],
             jnp.zeros((T_tiles, P_PIX, 4), jnp.float32)], axis=-1)
        (egrads_t,) = bwd_call(tile_starts, entries, cot_pack, fwd_pack)

        # columns >= aligned end hold garbage (no tile covers them) and
        # aligned-padding slots carry gidx == n: both drop from the scatter.
        num_covered = tile_starts[T_tiles]
        rows = jnp.arange(R, dtype=jnp.int32)
        gid = jnp.where(rows < num_covered, sorted_gidx, n)

        def scat1(row_idx):
            # row-wise 1-D scatter-add (avoids transposing the [16,R] table)
            return jnp.zeros((n,), jnp.float32).at[gid].add(
                egrads_t[row_idx, :R], mode="drop")
        dmean2d = jnp.stack([scat1(0), scat1(1)], axis=1)
        dconic = jnp.stack([scat1(2), scat1(3), scat1(4)], axis=1)
        dop = scat1(5)
        dcolors = jnp.stack([scat1(6), scat1(7), scat1(8)], axis=1)
        dabs = scat1(9)
        dbg = jnp.einsum("tpc,tp->c", gC, final_t, precision=_HIGH)
        zi = lambda x: np.zeros(x.shape, jax.dtypes.float0)  # noqa: E731
        return (dmean2d, dconic, dop, dcolors, dabs,
                zi(sorted_gidx), zi(tile_starts), dbg)

    blend.defvjp(fwd, bwd)
    return blend


def rasterize_pallas(mean2d, conic, opacity, colors, absgrad_hook,
                     sorted_gidx, tile_starts, tile_counts, bg,
                     *, grid: TileGrid, chunk: int = 256,
                     entry_capacity: Optional[int] = None):
    """Drop-in replacement for rasterize_tiled (same signature/semantics).

    entry_capacity limits the processed prefix of the sorted entry table
    (valid entries sort before the sentinel padding, so any capacity above
    num_rendered is lossless; overflow is monitored by the caller via
    BinningResult.num_rendered).
    """
    del tile_counts
    n = mean2d.shape[0]
    R_full = sorted_gidx.shape[0]
    R_base = min(entry_capacity or R_full, R_full)
    # aligned capacity: entries + worst-case per-tile alignment padding
    R = R_base + grid.num_tiles * chunk
    R = ((R + chunk - 1) // chunk) * chunk

    aligned_gidx, aligned_starts = align_tile_ranges(
        sorted_gidx, tile_starts, n, chunk, R)
    blend = _make_pallas_blend_vjp(grid, chunk, R)
    C_t, T_t = blend(mean2d, conic, opacity, colors, absgrad_hook,
                     aligned_gidx, aligned_starts, bg)
    return tiles_to_image(C_t, grid), tiles_to_image(T_t, grid)
