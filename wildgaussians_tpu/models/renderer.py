"""Differentiable scene render: activations + SH + appearance + rasterize.

The jit-side analogue of GaussianModel._render_internal (reference
method.py:1479-1632): builds camera matrices on device, evaluates SH colors,
optionally tones them through the appearance MLP, and rasterizes up to three
times per step (raw / toned / depth) sharing one preprocess+binning.
"""
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..cameras import make_camera_params_jax
from ..config import Config
from ..ops.sh import eval_sh_switch
from ..ops.gaussians import preprocess, compute_cov3d
from ..ops.binning import bin_gaussians
from ..ops.rasterize_tiled import make_grid, rasterize_tiled
from .appearance import apply_mlp


class RenderPkg(NamedTuple):
    render: jnp.ndarray            # [H,W,3] (toned if appearance enabled)
    raw_render: jnp.ndarray        # [H,W,3]
    accumulation: jnp.ndarray      # [H,W] = 1 - final_T
    radii: jnp.ndarray             # [N]
    depth: Optional[jnp.ndarray]   # [H,W] or None
    num_rendered: jnp.ndarray
    overflow: jnp.ndarray
    # sharded-engine send-cap drops (subset of overflow): lets the trainer
    # adapt send_beta directly instead of growing the tile budget
    send_drops: Any = 0
    # largest raw tile rect in the scene this step: the EXACT budget the
    # overflow auto-grow needs, so one staged recompile suffices
    max_tiles: Any = 0
    # per-tile saturation depths from the fwd kernel's early-exit telemetry
    # (single-chip pallas sort engine only; feeds the next step's pre-sort
    # cull via rasterize_pallas.pool_sat_depth)
    sat_depth: Any = None


def render_internal(gaussians: Dict[str, jnp.ndarray],
                    params: dict,
                    aux_active_sh: jnp.ndarray,
                    alive: jnp.ndarray,
                    config: Config,
                    pose: jnp.ndarray, intrinsics: jnp.ndarray,
                    width: int, height: int,
                    *,
                    embedding: Optional[jnp.ndarray],
                    kernel_size: float,
                    mean2d_hook: Optional[jnp.ndarray] = None,
                    absgrad_hook: Optional[jnp.ndarray] = None,
                    render_depth: bool = False,
                    return_raw: bool = True,
                    actual_size: Optional[tuple] = None,
                    backend: str = "auto",
                    chunk: int = 256,
                    batch_tiles: int = 64,
                    max_tiles_per_gaussian: int = 0,
                    sat_super=None) -> RenderPkg:
    """One camera render. `gaussians` are post-activation (get_gaussians).

    width/height may be padded to the compile-shape; `actual_size` (w,h)
    preserves the reference's tan_fov (EWA clamp limits, method.py:1522-1525).
    """
    if not max_tiles_per_gaussian:
        max_tiles_per_gaussian = getattr(config, "max_tiles_per_gaussian", 64)
    camera = make_camera_params_jax(pose, intrinsics, width, height)
    if actual_size is not None:
        aw, ah = actual_size
        fx, fy = intrinsics[0], intrinsics[1]
        camera = camera._replace(tan_fov=jnp.stack([aw / (2.0 * fx), ah / (2.0 * fy)]).astype(jnp.float32))

    means3d = gaussians["xyz"]
    n = means3d.shape[0]
    opacities = gaussians["opacities"][:, 0]
    features = jnp.minimum(gaussians["features"], 1.0)  # method.py:1555

    dirs = means3d - camera.campos[None]
    dirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12)

    shdim = (config.sh_degree + 1) ** 2
    if features.shape[-1] == 3:
        colors = features
    else:
        shs = features.reshape(n, shdim, 3).transpose(0, 2, 1)
        colors = jnp.maximum(eval_sh_switch(aux_active_sh, config.sh_degree, shs, dirs) + 0.5, 0.0)

    if mean2d_hook is None:
        mean2d_hook = jnp.zeros((n, 2), jnp.float32)
    if absgrad_hook is None:
        absgrad_hook = jnp.zeros((n, 2), jnp.float32)
    bg = jnp.zeros((3,), jnp.float32)

    if backend == "auto":
        backend = (config.rasterizer_backend
                   if config.rasterizer_backend != "auto" else "auto")
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "tiled"

    # shared preprocess + binning for all passes (identical geometry;
    # reference runs up to three rasterizations per step, method.py:1573-1631)
    cov3d = compute_cov3d(gaussians["scales"], gaussians["rotations"])
    pre = preprocess(means3d, cov3d, opacities, camera, width, height,
                     kernel_size, tile_size=16, alive=alive)
    pre = pre._replace(mean2d=pre.mean2d + mean2d_hook)
    grid = make_grid(width, height, 16)

    # assemble the color passes
    passes = []
    want_raw = (not config.appearance_enabled
                or (config.appearance_separate_tuned_color and return_raw))
    if want_raw:
        passes.append(("raw", colors))
    if config.appearance_enabled:
        assert embedding is not None
        emb_expanded = jnp.broadcast_to(embedding[None], (n, embedding.shape[0]))
        toned = apply_mlp(params["appearance_mlp"], params["embeddings"],
                          emb_expanded, features)
        toned = jnp.minimum(toned, 1.0)
        shs_t = toned.reshape(n, shdim, 3).transpose(0, 2, 1)
        shs_t = jnp.minimum(shs_t, 1.0)
        colors_toned = jnp.maximum(
            eval_sh_switch(aux_active_sh, config.sh_degree, shs_t, dirs) + 0.5, 0.0)
        passes.append(("toned", colors_toned))
    depth_norm = None
    if render_depth:
        dist = jnp.linalg.norm(means3d - camera.campos[None], axis=-1)
        # pack-v2 color rows quantize to [-0.5, 1.5): normalize the depth
        # color set by its max (compositing is linear in color, so the
        # scale commutes out and is re-applied to the blended image
        # below). Depth precision is therefore ~max_depth/1024 absolute
        # (uniform) — fine for visualization/eval archives, and training
        # never renders depth; use pallas_pack16=False for exact f32
        # depth passes.
        depth_norm = jnp.max(jnp.where(pre.valid, dist, 0.0)) + 1e-6
        passes.append(("depth", jnp.tile((dist / depth_norm)[:, None],
                                         (1, 3))))

    # NDC factors for the reference's abs-gradient densification channel
    # (backward.cu:593-595): applied in-kernel by the pallas sort engine,
    # as a hook pre-scale by the per-axis backends (see
    # rasterize_pallas_multi docstring); trainers consume g_abs.sum(-1)
    if actual_size is not None:
        ndc = jnp.stack([0.5 * actual_size[0], 0.5 * actual_size[1]])
    else:
        ndc = jnp.asarray([0.5 * width, 0.5 * height], jnp.float32)

    raster_aux = {}
    if backend == "pallas":
        from ..ops.rasterize_pallas import rasterize_pallas_multi
        from ..parallel.mesh import current_mesh
        outs, raster_aux = rasterize_pallas_multi(
            pre.mean2d, pre.conic, pre.opacity,
            [c for _tag, c in passes], absgrad_hook,
            pre.depth, pre.rect_min, pre.rect_max, pre.tiles_touched,
            pre.valid, bg, grid=grid, chunk=chunk,
            max_tiles_per_gaussian=max_tiles_per_gaussian,
            d_small=getattr(config, "pallas_d_small", 4),
            big_fraction=getattr(config, "pallas_big_fraction", 0.16),
            binning=getattr(config, "pallas_binning", "sort"),
            mesh=current_mesh(),
            grads_sharded=getattr(config, "shard_gaussian_store", False),
            send_beta=getattr(config, "pallas_send_beta", 2.0),
            stream_merge=getattr(config, "pallas_stream_merge", True),
            pack16=getattr(config, "pallas_pack16", True),
            return_aux=True, ndc_scale=ndc, sat_super=sat_super)
        results = dict(zip([tag for tag, _c in passes], outs))
    else:
        binning = bin_gaussians(
            pre, grid.grid_x, grid.grid_y, max_tiles_per_gaussian,
            sort_mode=getattr(config, "depth_sort_mode", "quantized"))

        def blend(cols):
            return rasterize_tiled(pre.mean2d, pre.conic, pre.opacity, cols,
                                   absgrad_hook * ndc[None, :],
                                   binning.sorted_gidx,
                                   binning.tile_starts, binning.tile_counts,
                                   bg, grid=grid, chunk=chunk,
                                   batch_tiles=batch_tiles)
        results = {tag: blend(c) for tag, c in passes}

    raw_img = results["raw"][0] if "raw" in results else None
    accumulation = (1.0 - results["raw"][1] if "raw" in results
                    else 1.0 - results["toned"][1])
    rendered = results["toned"][0] if "toned" in results else raw_img
    if raw_img is None:
        raw_img = rendered
    depth = (results["depth"][0][..., 0] * depth_norm
             if "depth" in results else None)

    from ..ops.rasterize import overflow_count
    num_rendered = jnp.sum(jnp.minimum(pre.tiles_touched, max_tiles_per_gaussian))
    from ..parallel.mesh import current_mesh
    overflow = overflow_count(
        pre, backend, max_tiles_per_gaussian,
        d_small=getattr(config, "pallas_d_small", 4),
        big_fraction=getattr(config, "pallas_big_fraction", 0.16),
        binning=getattr(config, "pallas_binning", "sort"),
        grid=grid, sat_super=sat_super)
    # the sharded engine's send-cap drops are real truncated contributions
    send_drops = raster_aux.get("send_drops", 0)
    overflow = overflow + send_drops
    return RenderPkg(render=rendered, raw_render=raw_img,
                     accumulation=accumulation, radii=pre.radius,
                     depth=depth, num_rendered=num_rendered,
                     overflow=overflow, send_drops=send_drops,
                     max_tiles=jnp.max(jnp.where(pre.valid,
                                                 pre.tiles_touched, 0)),
                     sat_depth=raster_aux.get("sat_depth"))
