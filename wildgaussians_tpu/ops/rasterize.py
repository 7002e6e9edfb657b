"""Public rasterization API: preprocess -> binning -> tile blend.

Mirrors the surface of the reference GaussianRasterizer
(diff_gaussian_rasterization/__init__.py:192-241) as a pure function. Backends:
  - "tiled":     pure-XLA tiled blend with hand-derived VJP (CPU+TPU)
  - "pallas":    Pallas TPU kernels (same binning; fastest)
  - "reference": O(N*H*W) oracle (tests only)
"""
from typing import NamedTuple, Optional

import jax.numpy as jnp

from ..cameras import CameraParams
from .gaussians import preprocess, compute_cov3d
from .binning import bin_gaussians
from .rasterize_tiled import make_grid, rasterize_tiled
from .rasterize_reference import rasterize_reference


def mark_visible(means3d: jnp.ndarray, camera: CameraParams) -> jnp.ndarray:
    """Frustum-visibility test, [N] bool (reference markVisible,
    diff_gaussian_rasterization/__init__.py:197-206 -> in_frustum,
    auxiliary.h:139-164: visible iff view-space z > 0.2)."""
    z = (jnp.concatenate([means3d, jnp.ones_like(means3d[..., :1])], axis=-1)
         * camera.viewmatrix[2]).sum(-1)
    return z > 0.2


def overflow_count(pre, backend: str, max_tiles_per_gaussian: int,
                   *, d_small: int = 4, big_fraction: float = 0.16,
                   binning: str = "sort", grid=None, sat_super=None):
    """Truncated-contribution count, two-tier-aware for the pallas backend.

    Counts (a) Gaussians whose tile rect exceeds max_tiles_per_gaussian and
    (b) for pallas, big Gaussians beyond the big-pool capacity that keep only
    their d_small cheap slots (rasterize_pallas._make_pallas_blend_vjp).
    The sort engine corner-culls invisible rect cells before binning, so its
    "big" classification runs on VISIBLE-cell counts — mirror it here (the
    shared visible_cell_counts graph CSEs with the binning's own), else the
    metric overcounts ~4x and spuriously triggers the trainer's tile-budget
    auto-grow. The partition/gather engines bin raw rect cells with a
    d_small floor of 6 (rasterize_pallas_multi) — mirror that too.
    """
    overflow = jnp.sum(pre.tiles_touched > max_tiles_per_gaussian)
    if backend != "pallas":
        return overflow
    n = pre.valid.shape[0]
    if binning == "sort" and grid is not None:
        from .rasterize_pallas import visible_cell_counts
        if max_tiles_per_gaussian > d_small:
            m_cap = max(int(n * big_fraction), 8)
            vis = visible_cell_counts(
                pre.mean2d, pre.conic, pre.opacity, pre.rect_min,
                pre.rect_max, pre.tiles_touched, pre.valid, grid,
                max_tiles_per_gaussian, sat_super=sat_super,
                depth=pre.depth)
            n_big = jnp.sum(vis > d_small)
            overflow = overflow + jnp.maximum(n_big - m_cap, 0)
        return overflow
    d_eff = max(d_small, 6) if binning in ("partition", "gather") else d_small
    if max_tiles_per_gaussian > d_eff:
        m_cap = max(int(n * big_fraction), 8)
        n_big = jnp.sum((pre.tiles_touched > d_eff) & pre.valid)
        overflow = overflow + jnp.maximum(n_big - m_cap, 0)
    return overflow


class RasterizeResult(NamedTuple):
    color: jnp.ndarray        # [H,W,3]
    final_T: jnp.ndarray      # [H,W]  (accumulation = 1 - final_T)
    radii: jnp.ndarray        # [N] int32 (visibility_filter = radii > 0)
    num_rendered: jnp.ndarray  # [] int32
    overflow: jnp.ndarray     # [] int32 truncated-rect count


def rasterize_gaussians(means3d: jnp.ndarray,
                        scales: jnp.ndarray,
                        rotations: jnp.ndarray,
                        opacities: jnp.ndarray,
                        colors: jnp.ndarray,
                        camera: CameraParams,
                        width: int, height: int,
                        *,
                        kernel_size: float,
                        absgrad_hook: Optional[jnp.ndarray] = None,
                        alive: Optional[jnp.ndarray] = None,
                        bg: Optional[jnp.ndarray] = None,
                        backend: str = "tiled",
                        tile_size: int = 16,
                        max_tiles_per_gaussian: int = 64,
                        chunk: int = 256,
                        batch_tiles: int = 64,
                        sort_mode: str = "quantized",
                        d_small: int = 4,
                        big_fraction: float = 0.16,
                        binning: str = "sort",
                        pack16: bool = True,
                        scale_modifier: float = 1.0,
                        cov3d: Optional[jnp.ndarray] = None,
                        mean2d_hook: Optional[jnp.ndarray] = None,
                        ndc_scale=None) -> RasterizeResult:
    """Render post-activation Gaussians (cf. GaussianRasterizer.forward,
    reference __init__.py:208-241 — always called with colors_precomp in the
    reference method, method.py:1574-1608).

    opacities: [N] post-activation (incl. 3D-filter compensation);
    colors: [N,3] precomputed (SH already evaluated).
    """
    n = means3d.shape[0]
    if bg is None:
        bg = jnp.zeros((3,), jnp.float32)
    if absgrad_hook is None:
        absgrad_hook = jnp.zeros((n, 2), jnp.float32)

    if cov3d is None:
        cov3d = compute_cov3d(scales, rotations, scale_modifier)
    pre = preprocess(means3d, cov3d, opacities, camera, width, height,
                     kernel_size, tile_size=tile_size, alive=alive)
    if mean2d_hook is not None:
        # screen-space gradient hook (the reference's means2D dummy tensor)
        pre = pre._replace(mean2d=pre.mean2d + mean2d_hook)

    if backend == "reference":
        color, final_t = rasterize_reference(
            pre.mean2d, pre.depth, pre.conic, pre.opacity, colors, pre.valid,
            pre.rect_min, pre.rect_max, width=width, height=height, bg=bg,
            tile_size=tile_size)
        return RasterizeResult(color, final_t, pre.radius,
                               jnp.sum(pre.tiles_touched), jnp.int32(0))

    grid = make_grid(width, height, tile_size)
    num_rendered = jnp.sum(jnp.minimum(pre.tiles_touched, max_tiles_per_gaussian))
    overflow = overflow_count(pre, backend, max_tiles_per_gaussian,
                              d_small=d_small, big_fraction=big_fraction,
                              binning=binning, grid=grid)
    if backend == "tiled":
        hook = absgrad_hook
        if ndc_scale is not None:
            # per-axis backend: hook pre-scale applies the NDC abs-grad
            # factors (see rasterize_pallas_multi docstring)
            hook = hook * jnp.asarray(ndc_scale, jnp.float32)[None, :]
        binning = bin_gaussians(pre, grid.grid_x, grid.grid_y,
                                max_tiles_per_gaussian, sort_mode=sort_mode)
        color, final_t = rasterize_tiled(
            pre.mean2d, pre.conic, pre.opacity, colors, hook,
            binning.sorted_gidx, binning.tile_starts, binning.tile_counts, bg,
            grid=grid, chunk=chunk, batch_tiles=batch_tiles)
    elif backend == "pallas":
        from .rasterize_pallas import rasterize_pallas
        color, final_t = rasterize_pallas(
            pre.mean2d, pre.conic, pre.opacity,
            colors, absgrad_hook, pre.depth, pre.rect_min, pre.rect_max,
            pre.tiles_touched, pre.valid, bg, grid=grid, chunk=chunk,
            max_tiles_per_gaussian=max_tiles_per_gaussian,
            d_small=d_small, big_fraction=big_fraction, binning=binning,
            pack16=pack16, ndc_scale=ndc_scale)
    else:
        raise ValueError(f"Unknown rasterizer backend: {backend}")
    return RasterizeResult(color, final_t, pre.radius, num_rendered, overflow)


class StaticBinning(NamedTuple):
    """Sorted entry table for the static fast path (see bin_static)."""
    table: jnp.ndarray        # [table_w, R_pad] packed entries
    tile_starts: jnp.ndarray  # [T+1]
    tile_counts: jnp.ndarray  # [T]
    # rgb10 rows encode [-0.5, 1.5): colors were normalized by this scale
    # at bin time; render_static multiplies it back (blend is linear)
    color_scale: jnp.ndarray = jnp.float32(1.0)


def bin_static(means3d, scales, rotations, opacities, colors,
               camera: CameraParams, width: int, height: int, *,
               kernel_size: float, alive=None, tile_size: int = 16,
               max_tiles_per_gaussian: int = 16, chunk: int = 256,
               d_small: int = 4, big_fraction: float = 0.16,
               scale_modifier: float = 1.0) -> StaticBinning:
    """Preprocess + cull + sort ONCE for a static (scene, camera) pair.

    The sort-once / blend-many inference path: 3DGS viewers amortize
    binning across re-blends (appearance/tone edits, multi-output renders)
    — cf. the reference's real-time claim (README.md:27). Pair with
    render_static; pallas backend only.
    """
    from .rasterize_pallas import _make_static_renderer
    cov3d = compute_cov3d(scales, rotations, scale_modifier)
    pre = preprocess(means3d, cov3d, opacities, camera, width, height,
                     kernel_size, tile_size=tile_size, alive=alive)
    grid = make_grid(width, height, tile_size)
    bin_fn, _blend = _make_static_renderer(
        grid, chunk, means3d.shape[0], max_tiles_per_gaussian, 1,
        d_small, big_fraction, True)
    scale = jnp.maximum(1.0, (jnp.max(colors) + 1e-6) * (1.0 / 1.49))
    table, starts, counts = bin_fn(
        pre.mean2d, pre.conic, pre.opacity, (colors / scale)[None],
        pre.depth, pre.rect_min, pre.rect_max,
        jnp.minimum(pre.tiles_touched, max_tiles_per_gaussian), pre.valid)
    return StaticBinning(table, starts, counts, scale)


def render_static(binning: StaticBinning, n: int, width: int, height: int,
                  *, bg=None, tile_size: int = 16,
                  max_tiles_per_gaussian: int = 16, chunk: int = 256,
                  d_small: int = 4, big_fraction: float = 0.16):
    """Blend a pre-binned static scene: returns (color [H,W,3], final_T).

    `n`/knobs must match the bin_static call (they select the compiled
    kernel family)."""
    from .rasterize_pallas import _make_static_renderer
    from .rasterize_tiled import tiles_to_image
    if bg is None:
        bg = jnp.zeros((3,), jnp.float32)
    grid = make_grid(width, height, tile_size)
    _bin, blend_fn = _make_static_renderer(
        grid, chunk, n, max_tiles_per_gaussian, 1, d_small, big_fraction,
        True)
    # blend ran on normalized colors with bg folded in at scale: rescale
    # color (T is scale-free). bg was passed unnormalized to blend_fn, so
    # pass bg/scale and multiply out — out = scale*blend(c/s, bg/s).
    # blend_fn output is PLANAR [4, T, P] (lane dim = P: the interleaved
    # [T, P, OW] layout cost ~4 ms/frame of lane-8 relayout, round 4)
    pack = blend_fn(binning.table, binning.tile_starts, binning.tile_counts,
                    bg / binning.color_scale)[0]
    color = jnp.stack([tiles_to_image(pack[c], grid)
                       for c in range(3)], axis=-1)
    return (color * binning.color_scale,
            tiles_to_image(pack[3], grid))
