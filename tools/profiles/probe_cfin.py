"""Measure per-tile early-exit depth at bench scale.

The fwd/bwd kernels stop a tile once every pixel's transmittance drops
below T_EPS; entries past that point get exactly-zero gradients. If the
live fraction f = sum(c_fin*K) / R is small, the backward un-sort (41.6 ms
at R=7.44M) could sort a compacted ~f*R table instead. This probe runs the
forward recurrence only, emitting c_fin and count per tile.
"""
import functools
import os
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wildgaussians_tpu.ops.gaussians import preprocess, compute_cov3d
from wildgaussians_tpu.ops.rasterize_tiled import make_grid
from wildgaussians_tpu.ops.rasterize_pallas import (
    _chunk_dma, _chunk_fwd_math, _pixel_coords, _triu, P_PIX,
    T_EPS, _build_sorted_table)


def _probe_kernel(tbase_ref, starts_ref, counts_ref, entries_hbm, out_ref,
                  ebuf, sem, *, grid, K):
    t = pl.program_id(0)
    start = starts_ref[t]
    count = counts_ref[t]
    gt = t + tbase_ref[0]
    astart = (start // 128) * 128
    shift = start - astart
    px, py = _pixel_coords(grid, gt, local=True)
    triu = _triu(K)
    kidx = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)
    n_chunks = pl.cdiv(shift + count, K)

    @pl.when(n_chunks > 0)
    def _():
        _chunk_dma(entries_hbm, ebuf, sem, astart, 0, K, 0).start()

    def cond(state):
        c, t_carry, _ = state
        return (c < n_chunks) & (jnp.max(t_carry) >= T_EPS)

    def body(state):
        c, t_carry, stopped = state
        slot = jax.lax.rem(c, 2)
        _chunk_dma(entries_hbm, ebuf, sem, astart, c, K, slot).wait()

        @pl.when(c + 1 < n_chunks)
        def _():
            _chunk_dma(entries_hbm, ebuf, sem, astart, c + 1, K, 1 - slot).start()

        pos = c * K + kidx - shift
        em = (pos >= 0) & (pos < count)
        st = _chunk_fwd_math(ebuf[slot], px, py, em, t_carry, stopped, triu,
                             0, True)
        return c + 1, st["new_t"], st["new_stopped"]

    init = (jnp.int32(0), jnp.ones((P_PIX, 1), jnp.float32),
            jnp.zeros((P_PIX, 1), jnp.float32))
    c_fin, _, _ = jax.lax.while_loop(cond, body, init)

    @pl.when(c_fin < n_chunks)
    def _():
        _chunk_dma(entries_hbm, ebuf, sem, astart, c_fin, K,
                   jax.lax.rem(c_fin, 2)).wait()
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    out_ref[0, :, :] = jnp.where(lane == 0, c_fin, n_chunks)


def main():
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from sweep_r3 import make_inputs
    n = int(os.environ.get("BENCH_N_GAUSSIANS", 1_500_000))
    K = int(os.environ.get("BENCH_CHUNK", 256))
    d_max, d_small, bigf = 10, 4, 0.16
    (xyz, scales, q, opac, colors), _t, params, w, h = make_inputs(n, 1280, 720)
    grid = make_grid(w, h, 16)

    @jax.jit
    def run(xyz, scales, rots, opac, colors):
        cov3d = compute_cov3d(scales, rots, 1.0)
        pre = preprocess(xyz, cov3d, opac, params, w, h, kernel_size=0.1)
        table, _f, starts, counts, _b, _k = _build_sorted_table(
            grid, K, n, d_max, 1, d_small, bigf, True,
            pre.mean2d, pre.conic, pre.opacity, colors[None], pre.depth,
            pre.rect_min, pre.rect_max, jnp.minimum(pre.tiles_touched, d_max),
            pre.valid)
        T_tiles = grid.num_tiles
        call = pl.pallas_call(
            functools.partial(_probe_kernel, grid=grid, K=K),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=(T_tiles,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
                out_specs=[pl.BlockSpec((1, 8, 128), lambda i, *_: (i, 0, 0))],
                scratch_shapes=[
                    pltpu.VMEM((2, table.shape[0], K), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
            ),
            out_shape=[jax.ShapeDtypeStruct((T_tiles, 8, 128), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
        )
        zb = jnp.zeros((1,), jnp.int32)
        (cf,) = call(zb, starts, counts, table)
        return cf, counts

    (cf, counts) = jax.block_until_ready(run(xyz, scales, q, opac, colors))
    cf = np.asarray(cf)[:, 0, :2]
    counts = np.asarray(counts)
    live = cf[:, 0] * K
    total = counts.sum()
    print(f"R_covered={total}  live_entries<={live.sum()}  "
          f"f<={live.sum()/total:.3f}")
    print(f"chunks: run={cf[:,0].sum()} of {cf[:,1].sum()} "
          f"({cf[:,0].sum()/max(cf[:,1].sum(),1):.3f})")
    print("c_fin percentiles:", np.percentile(cf[:, 0], [10, 50, 90, 99]))
    print("n_chunks percentiles:", np.percentile(cf[:, 1], [10, 50, 90, 99]))

    t0 = time.perf_counter()
    for _ in range(5):
        out = run(xyz, scales, q, opac, colors)
    jax.block_until_ready(out)
    print(f"probe step {(time.perf_counter()-t0)/5*1e3:.1f} ms "
          "(sort + forward recurrence only)")


if __name__ == "__main__":
    main()
