"""Tiled rasterizer (binning + custom-VJP blend) vs the oracle."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wildgaussians_tpu.ops.rasterize import rasterize_gaussians
from wildgaussians_tpu.ops.binning import bin_gaussians
from helpers import make_camera, make_scene, preprocess_scene


def _render(scene, cam, backend, absgrad_hook=None, bg=None, **kw):
    import wildgaussians_tpu.cameras as wc
    params, w, h = wc.make_camera_params(cam)
    return rasterize_gaussians(
        jnp.asarray(scene["xyz"]), jnp.asarray(scene["scales"]),
        jnp.asarray(scene["rotations"]), jnp.asarray(scene["opacities"]),
        jnp.asarray(scene["colors"]), params, w, h,
        kernel_size=0.1, backend=backend, absgrad_hook=absgrad_hook, bg=bg,
        sort_mode="exact", **kw)


def test_binning_ranges_consistent(rng):
    scene = make_scene(rng, n=400)
    cam = make_camera(width=80, height=64)
    pre, params, w, h = preprocess_scene(scene, cam)
    gx, gy = (w + 15) // 16, (h + 15) // 16
    res = bin_gaussians(pre, gx, gy, max_tiles_per_gaussian=64, sort_mode="exact")
    starts = np.asarray(res.tile_starts)
    counts = np.asarray(res.tile_counts)
    gidx = np.asarray(res.sorted_gidx)
    assert (np.diff(starts) >= 0).all()
    assert counts.sum() == int(res.num_rendered)
    assert int(res.overflow) == 0
    # each tile's entries are sorted by depth and actually overlap the tile
    depth = np.asarray(pre.depth)
    rmin, rmax = np.asarray(pre.rect_min), np.asarray(pre.rect_max)
    for t in range(gx * gy):
        seg = gidx[starts[t]:starts[t] + counts[t]]
        d = depth[seg]
        assert (np.diff(d) >= 0).all(), f"tile {t} not depth sorted"
        tx, ty = t % gx, t // gx
        assert ((rmin[seg, 0] <= tx) & (tx < rmax[seg, 0])
                & (rmin[seg, 1] <= ty) & (ty < rmax[seg, 1])).all()


@pytest.mark.parametrize("size", [(64, 48), (70, 50)])  # aligned + ragged
def test_tiled_matches_oracle_forward(rng, size):
    scene = make_scene(rng, n=600)
    cam = make_camera(width=size[0], height=size[1])
    ref = _render(scene, cam, "reference")
    got = _render(scene, cam, "tiled")
    np.testing.assert_allclose(np.asarray(got.color), np.asarray(ref.color),
                               atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got.final_T), np.asarray(ref.final_T),
                               atol=2e-3, rtol=1e-3)


def test_tiled_matches_oracle_forward_with_bg(rng):
    scene = make_scene(rng, n=200)
    cam = make_camera(width=48, height=48)
    bg = jnp.asarray([0.2, 0.4, 0.6])
    ref = _render(scene, cam, "reference", bg=bg)
    got = _render(scene, cam, "tiled", bg=bg)
    np.testing.assert_allclose(np.asarray(got.color), np.asarray(ref.color),
                               atol=2e-3, rtol=1e-3)


def test_tiled_grads_match_oracle(rng):
    """Hand-derived VJP vs JAX AD through the oracle."""
    scene = make_scene(rng, n=150)
    cam = make_camera(width=48, height=32)
    import wildgaussians_tpu.cameras as wc
    params, w, h = wc.make_camera_params(cam)
    target = jnp.asarray(rng.uniform(0, 1, (h, w, 3)).astype(np.float32))

    def loss(backend, xyz, scales, rots, opac, colors):
        out = rasterize_gaussians(xyz, scales, rots, opac, colors, params, w, h,
                                  kernel_size=0.1, backend=backend,
                                  sort_mode="exact")
        return jnp.mean((out.color - target) ** 2) + 0.1 * jnp.mean(out.final_T)

    args = (jnp.asarray(scene["xyz"]), jnp.asarray(scene["scales"]),
            jnp.asarray(scene["rotations"]), jnp.asarray(scene["opacities"]),
            jnp.asarray(scene["colors"]))
    g_ref = jax.grad(lambda *a: loss("reference", *a), argnums=(0, 1, 2, 3, 4))(*args)
    g_tile = jax.grad(lambda *a: loss("tiled", *a), argnums=(0, 1, 2, 3, 4))(*args)
    names = ["xyz", "scales", "rotations", "opacities", "colors"]
    for name, gr, gt in zip(names, g_ref, g_tile):
        gr, gt = np.asarray(gr), np.asarray(gt)
        assert np.isfinite(gt).all(), name
        scale = np.abs(gr).max() + 1e-8
        np.testing.assert_allclose(gt, gr, atol=2e-3 * scale, rtol=5e-2,
                                   err_msg=f"grad mismatch for {name}")


def test_absgrad_hook_channel(rng):
    """The absgrad cotangent ([N,2] |dx|,|dy|) dominates the signed mean2d
    grad per axis and is nonzero."""
    scene = make_scene(rng, n=100)
    cam = make_camera(width=48, height=32)
    import wildgaussians_tpu.cameras as wc
    params, w, h = wc.make_camera_params(cam)
    target = jnp.zeros((h, w, 3))
    n = scene["xyz"].shape[0]

    def loss(hook):
        out = rasterize_gaussians(
            jnp.asarray(scene["xyz"]), jnp.asarray(scene["scales"]),
            jnp.asarray(scene["rotations"]), jnp.asarray(scene["opacities"]),
            jnp.asarray(scene["colors"]), params, w, h,
            kernel_size=0.1, backend="tiled", absgrad_hook=hook)
        return jnp.mean((out.color - target) ** 2)

    g_abs = np.asarray(jax.grad(loss)(jnp.zeros((n, 2), jnp.float32)))
    assert g_abs.shape == (n, 2)
    assert np.isfinite(g_abs).all()
    assert (g_abs >= -1e-7).all()
    assert g_abs.max() > 0

    # |sum over pixels| <= sum over pixels of | |: abs channel dominates the
    # signed mean2d gradient per axis
    from wildgaussians_tpu.ops.gaussians import preprocess, compute_cov3d

    def loss_m2d(hook2):
        cov3d = compute_cov3d(jnp.asarray(scene["scales"]),
                              jnp.asarray(scene["rotations"]))
        pre = preprocess(jnp.asarray(scene["xyz"]), cov3d,
                         jnp.asarray(scene["opacities"]), params, w, h, 0.1)
        from wildgaussians_tpu.ops.binning import bin_gaussians
        from wildgaussians_tpu.ops.rasterize_tiled import make_grid, rasterize_tiled
        grid = make_grid(w, h, 16)
        binning = bin_gaussians(pre, grid.grid_x, grid.grid_y, 64, sort_mode="exact")
        color, _t = rasterize_tiled(
            pre.mean2d + hook2, pre.conic, pre.opacity,
            jnp.asarray(scene["colors"]), jnp.zeros((n, 2)),
            binning.sorted_gidx, binning.tile_starts, binning.tile_counts,
            jnp.zeros((3,)), grid=grid)
        return jnp.mean((color - target) ** 2)

    g_m2d = np.asarray(jax.grad(loss_m2d)(jnp.zeros((n, 2), jnp.float32)))
    assert (g_abs + 1e-6 >= np.abs(g_m2d)).all()


def test_tiled_fixed_capacity_alive_mask(rng):
    """Dead slots in a padded store render identically to their absence."""
    scene = make_scene(rng, n=100)
    cam = make_camera(width=48, height=32)
    import wildgaussians_tpu.cameras as wc
    params, w, h = wc.make_camera_params(cam)

    full = _render(scene, cam, "tiled")
    # pad with garbage gaussians masked dead
    pad = 60
    scene_p = {k: np.concatenate([v, v[:pad] * 1.7 + 0.1]) for k, v in scene.items()}
    alive = jnp.asarray(np.concatenate([np.ones(100, bool), np.zeros(pad, bool)]))
    padded = rasterize_gaussians(
        jnp.asarray(scene_p["xyz"]), jnp.asarray(scene_p["scales"]),
        jnp.asarray(scene_p["rotations"]), jnp.asarray(scene_p["opacities"]),
        jnp.asarray(scene_p["colors"]), params, w, h,
        kernel_size=0.1, backend="tiled", alive=alive)
    np.testing.assert_allclose(np.asarray(padded.color), np.asarray(full.color),
                               atol=1e-5)
