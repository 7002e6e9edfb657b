"""Pallas kernels vs tiled backend (interpret mode on CPU; same kernels
compile natively on TPU — see the TPU drive in .claude/skills/verify)."""
import numpy as np
import jax
import jax.numpy as jnp

from wildgaussians_tpu.ops.rasterize import rasterize_gaussians
from helpers import make_camera, make_scene


def _args(scene):
    return tuple(jnp.asarray(scene[k])
                 for k in ("xyz", "scales", "rotations", "opacities", "colors"))


import pytest


@pytest.mark.parametrize("binning", ["sort", "partition", "gather"])
def test_pallas_matches_tiled_forward(rng, binning):
    scene = make_scene(rng, n=200)
    cam = make_camera(width=48, height=32)
    import wildgaussians_tpu.cameras as wc
    params, w, h = wc.make_camera_params(cam)
    ref = rasterize_gaussians(*_args(scene), params, w, h, kernel_size=0.1,
                              backend="tiled")
    got = rasterize_gaussians(*_args(scene), params, w, h, kernel_size=0.1,
                              backend="pallas", binning=binning)
    np.testing.assert_allclose(np.asarray(got.color), np.asarray(ref.color),
                               atol=5e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got.final_T), np.asarray(ref.final_T),
                               atol=5e-3, rtol=1e-3)


def test_pallas_grads_match_tiled(rng):
    """Exact-payload mode (pack16=False): tight parity vs the tiled VJP."""
    scene = make_scene(rng, n=120)
    cam = make_camera(width=32, height=32)
    import wildgaussians_tpu.cameras as wc
    params, w, h = wc.make_camera_params(cam)
    target = jnp.asarray(rng.uniform(0, 1, (h, w, 3)).astype(np.float32))

    def loss(backend, *a):
        out = rasterize_gaussians(*a, params, w, h, kernel_size=0.1,
                                  backend=backend, pack16=False)
        return jnp.mean((out.color - target) ** 2) + 0.1 * jnp.mean(out.final_T)

    args = _args(scene)
    g_ref = jax.grad(lambda *a: loss("tiled", *a), argnums=(0, 1, 2, 3, 4))(*args)
    g_pal = jax.grad(lambda *a: loss("pallas", *a), argnums=(0, 1, 2, 3, 4))(*args)
    for name, gr, gp in zip(("xyz", "scales", "rot", "opac", "col"), g_ref, g_pal):
        gr, gp = np.asarray(gr), np.asarray(gp)
        scale = np.abs(gr).max() + 1e-12
        np.testing.assert_allclose(gp, gr, atol=5e-3 * scale, rtol=5e-2,
                                   err_msg=f"grad mismatch for {name}")


def test_pallas_f16_payload_grads_close(rng):
    """pack16=True (production): f16 payload quantization perturbs per-entry
    alphas by ~1e-3, so individual small-magnitude gradient components can
    shift by threshold flips — assert bulk-tight + bounded-tail agreement."""
    scene = make_scene(rng, n=120)
    cam = make_camera(width=32, height=32)
    import wildgaussians_tpu.cameras as wc
    params, w, h = wc.make_camera_params(cam)
    target = jnp.asarray(rng.uniform(0, 1, (h, w, 3)).astype(np.float32))

    def loss(backend, *a):
        out = rasterize_gaussians(*a, params, w, h, kernel_size=0.1,
                                  backend=backend)
        return jnp.mean((out.color - target) ** 2) + 0.1 * jnp.mean(out.final_T)

    args = _args(scene)
    g_ref = jax.grad(lambda *a: loss("tiled", *a), argnums=(0, 1, 2, 3, 4))(*args)
    g_pal = jax.grad(lambda *a: loss("pallas", *a), argnums=(0, 1, 2, 3, 4))(*args)
    for name, gr, gp in zip(("xyz", "scales", "rot", "opac", "col"), g_ref, g_pal):
        gr, gp = np.asarray(gr), np.asarray(gp)
        scale = np.abs(gr).max() + 1e-12
        err = np.abs(gp - gr)
        # f16 payload noise is absolute (~1e-3 alpha quantization times
        # blend weights), not relative to the max gradient
        assert np.quantile(err, 0.99) <= 1e-4 + 5e-3 * scale, name
        assert err.max() <= 1e-3 + 0.25 * scale, name


def test_pallas_multi_pass_matches_single(rng):
    """Two color sets over one shared sort == two independent single passes."""
    import wildgaussians_tpu.cameras as wc
    from wildgaussians_tpu.ops.gaussians import compute_cov3d, preprocess
    from wildgaussians_tpu.ops.rasterize_pallas import rasterize_pallas_multi
    from wildgaussians_tpu.ops.rasterize_tiled import make_grid

    scene = make_scene(rng, n=150)
    cam = make_camera(width=48, height=32)
    params, w, h = wc.make_camera_params(cam)
    cov3d = compute_cov3d(jnp.asarray(scene["scales"]), jnp.asarray(scene["rotations"]))
    pre = preprocess(jnp.asarray(scene["xyz"]), cov3d,
                     jnp.asarray(scene["opacities"]), params, w, h, 0.1)
    grid = make_grid(w, h, 16)
    c0 = jnp.asarray(scene["colors"])
    c1 = 1.0 - c0
    hook = jnp.zeros((150,), jnp.float32)
    bg = jnp.zeros((3,), jnp.float32)
    args = (pre.mean2d, pre.conic, pre.opacity)
    geo = (pre.depth, pre.rect_min, pre.rect_max, pre.tiles_touched, pre.valid)

    multi = rasterize_pallas_multi(*args, [c0, c1], hook, *geo, bg, grid=grid)
    s0 = rasterize_pallas_multi(*args, [c0], hook, *geo, bg, grid=grid)[0]
    s1 = rasterize_pallas_multi(*args, [c1], hook, *geo, bg, grid=grid)[0]
    np.testing.assert_allclose(np.asarray(multi[0][0]), np.asarray(s0[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(multi[1][0]), np.asarray(s1[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(multi[0][1]), np.asarray(multi[1][1]), atol=1e-6)


def test_training_with_pallas_backend(rng):
    """End-to-end training with rasterizer_backend=pallas (interpret on CPU)."""
    import sys
    sys.path.insert(0, "/root/repo/tests")
    from test_training import _make_synthetic_dataset, OVERRIDES
    from wildgaussians_tpu.models.wildgaussians import WildGaussians
    dataset, _scene = _make_synthetic_dataset(np.random.default_rng(5),
                                              n_cams=3, width=48, height=32,
                                              n_points=80)
    overrides = dict(OVERRIDES)
    overrides.update(rasterizer_backend="pallas", iterations=20,
                     densify_from_iter=5, densification_interval=8,
                     densify_until_iter=18, max_tiles_per_gaussian=12)
    m = WildGaussians(train_dataset=dataset, config_overrides=overrides)
    metrics = [m.train_iteration(s) for s in range(12)]
    assert all(np.isfinite(x["loss"]) for x in metrics)
    assert metrics[-1]["psnr"] > metrics[0]["psnr"] - 1.0


@pytest.mark.parametrize("binning", ["sort", "partition"])
def test_pallas_two_tier_big_gaussians(rng, binning):
    """Scenes with huge-footprint gaussians exercise the deep slot tier
    (and, for the partition path, the rank-merge chain)."""
    import wildgaussians_tpu.cameras as wc
    scene = make_scene(rng, n=80)
    # inflate some gaussians to cover many tiles (sky-like)
    scene["scales"][:10] *= 40.0
    cam = make_camera(width=64, height=64)
    params, w, h = wc.make_camera_params(cam)
    args = _args(scene)
    ref = rasterize_gaussians(*args, params, w, h, kernel_size=0.1,
                              backend="tiled", max_tiles_per_gaussian=24)
    got = rasterize_gaussians(*args, params, w, h, kernel_size=0.1,
                              backend="pallas", max_tiles_per_gaussian=24,
                              binning=binning)
    np.testing.assert_allclose(np.asarray(got.color), np.asarray(ref.color),
                               atol=5e-3, rtol=1e-3)

    target = jnp.zeros((h, w, 3))

    def loss(backend, *a):
        out = rasterize_gaussians(*a, params, w, h, kernel_size=0.1,
                                  backend=backend, max_tiles_per_gaussian=24,
                                  binning=binning)
        return jnp.mean((out.color - target) ** 2)

    g_ref = jax.grad(lambda *a: loss("tiled", *a), argnums=(0, 4))(*args)
    g_pal = jax.grad(lambda *a: loss("pallas", *a), argnums=(0, 4))(*args)
    for gr, gp in zip(g_ref, g_pal):
        scale = np.abs(np.asarray(gr)).max() + 1e-12
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                                   atol=5e-3 * scale, rtol=5e-2)


def test_pallas_multi_pass_grads_match_single(rng):
    """Gradients of a 2-pass render (shared sort, per-pass colors) must
    match two independent single passes — exercises the multi-pass
    decode/accumulate of the kernel-packed grad rows."""
    import jax
    import wildgaussians_tpu.cameras as wc
    from wildgaussians_tpu.ops.gaussians import compute_cov3d, preprocess
    from wildgaussians_tpu.ops.rasterize_pallas import rasterize_pallas_multi
    from wildgaussians_tpu.ops.rasterize_tiled import make_grid

    scene = make_scene(rng, n=150)
    cam = make_camera(width=48, height=32)
    params, w, h = wc.make_camera_params(cam)
    cov3d = compute_cov3d(jnp.asarray(scene["scales"]),
                          jnp.asarray(scene["rotations"]))
    pre = preprocess(jnp.asarray(scene["xyz"]), cov3d,
                     jnp.asarray(scene["opacities"]), params, w, h, 0.1)
    grid = make_grid(w, h, 16)
    c0 = jnp.asarray(scene["colors"])
    c1 = 1.0 - c0
    hook = jnp.zeros((150, 2), jnp.float32)
    bg = jnp.asarray([0.2, 0.1, 0.3], jnp.float32)
    geo = (pre.depth, pre.rect_min, pre.rect_max, pre.tiles_touched,
           pre.valid)
    tgt0 = jnp.asarray(rng.uniform(0, 1, (h, w, 3)).astype(np.float32))
    tgt1 = jnp.asarray(rng.uniform(0, 1, (h, w, 3)).astype(np.float32))

    def loss_multi(m2d, con, op, a, b):
        outs = rasterize_pallas_multi(m2d, con, op, [a, b], hook, *geo, b_g,
                                      grid=grid)
        return (jnp.mean((outs[0][0] - tgt0) ** 2)
                + 2.0 * jnp.mean((outs[1][0] - tgt1) ** 2))

    def loss_single(m2d, con, op, a, b):
        ((i0, _),) = rasterize_pallas_multi(m2d, con, op, [a], hook, *geo,
                                            b_g, grid=grid)
        ((i1, _),) = rasterize_pallas_multi(m2d, con, op, [b], hook, *geo,
                                            b_g, grid=grid)
        return (jnp.mean((i0 - tgt0) ** 2) + 2.0 * jnp.mean((i1 - tgt1) ** 2))

    b_g = bg
    args = (pre.mean2d, pre.conic, pre.opacity, c0, c1)
    gm = jax.grad(loss_multi, argnums=(0, 1, 2, 3, 4))(*args)
    gs = jax.grad(loss_single, argnums=(0, 1, 2, 3, 4))(*args)
    for a, b in zip(gm, gs):
        a, b = np.asarray(a), np.asarray(b)
        # the multi-pass geo grads decode+sum f16-packed per-pass rows; the
        # single passes sum after the un-sort — bounded by f16 quantization
        np.testing.assert_allclose(a, b, atol=2e-3 * (np.abs(b).max() + 1e-8))


def test_static_renderer_matches_forward(rng):
    """bin_static + render_static (sort-once/blend-many viewer path) must
    reproduce the training forward exactly: same table, same kernels."""
    from wildgaussians_tpu.ops.rasterize import bin_static, render_static
    import wildgaussians_tpu.cameras as wc
    scene = make_scene(rng, n=150)
    cam = make_camera(width=48, height=32)
    params, w, h = wc.make_camera_params(cam)
    args = _args(scene)
    ref = rasterize_gaussians(*args, params, w, h, kernel_size=0.1,
                              backend="pallas", max_tiles_per_gaussian=16)
    binning = bin_static(*args, params, w, h, kernel_size=0.1,
                         max_tiles_per_gaussian=16)
    color, final_t = render_static(binning, args[0].shape[0], w, h,
                                   max_tiles_per_gaussian=16)
    np.testing.assert_allclose(np.asarray(color), np.asarray(ref.color),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(final_t), np.asarray(ref.final_T),
                               atol=1e-6)


def test_tier2_dense_pallas_matches_scatter(rng):
    """The round-4 one-hot-matmul tier-2 merge kernel == the XLA scatter
    (interpret mode; on-chip it replaces the 12.5 ms batched scatter)."""
    import jax.numpy as jnp
    from wildgaussians_tpu.ops.rasterize_pallas import (
        _tier2_dense_pallas)

    n = 5000
    m = 700
    nr = 10
    idx = np.sort(rng.choice(n, size=m, replace=False)).astype(np.int32)
    # sentinel tail (dropped entries) exactly as big_list carries them
    idx[-5:] = n
    idx = np.sort(idx)
    vals = rng.normal(size=(nr, m)).astype(np.float32)
    dense = np.asarray(_tier2_dense_pallas(
        jnp.asarray(idx), jnp.asarray(vals), n))
    want = np.zeros((nr, n), np.float32)
    keep = idx < n
    want[:, idx[keep]] = vals[:, keep]
    np.testing.assert_allclose(dense, want, atol=1e-6)


def test_bwd_banded_grid_matches_sequential(rng):
    """WG_BWD_BANDS=2: the banded-parallel backward (band-private crossing
    stages + zero-base + pass-2 add) must reproduce the sequential grid's
    gradients exactly, including tiny tiles straddling band boundaries."""
    import jax
    import jax.numpy as jnp
    from helpers import make_camera, make_scene
    import wildgaussians_tpu.cameras as wc
    from wildgaussians_tpu.ops import rasterize_pallas as rp
    from wildgaussians_tpu.ops.rasterize import rasterize_gaussians

    scene = make_scene(rng, n=500, spread=1.5, z_range=(3.0, 7.0))
    cam = make_camera(width=64, height=64)   # 16 tiles -> 2 bands of 8
    params, w, h = wc.make_camera_params(cam)
    args = tuple(map(jnp.asarray, (scene["xyz"], scene["scales"],
                                   scene["rotations"], scene["opacities"],
                                   scene["colors"])))

    def grads():
        def loss(a):
            out = rasterize_gaussians(*a, params, w, h, kernel_size=0.1,
                                      backend="pallas", big_fraction=0.5)
            return jnp.sum(out.color * out.color) + jnp.sum(out.final_T)
        return jax.grad(loss)(args)

    import os
    old = os.environ.get("WG_BWD_BANDS")
    try:
        os.environ["WG_BWD_BANDS"] = "1"
        rp._make_pallas_calls.cache_clear()
        rp._make_pallas_blend_vjp.cache_clear()
        g_seq = grads()
        os.environ["WG_BWD_BANDS"] = "2"
        rp._make_pallas_calls.cache_clear()
        rp._make_pallas_blend_vjp.cache_clear()
        g_band = grads()
    finally:
        if old is None:
            os.environ.pop("WG_BWD_BANDS", None)
        else:
            os.environ["WG_BWD_BANDS"] = old
        rp._make_pallas_calls.cache_clear()
        rp._make_pallas_blend_vjp.cache_clear()
    for gs, gb in zip(g_seq, g_band):
        np.testing.assert_allclose(np.asarray(gb), np.asarray(gs),
                                   rtol=0, atol=0)


def test_bright_colors_survive_rgb10(rng):
    """SH colors can exceed the rgb10 encode range [-0.5, 1.5); the
    per-pass auto-normalization (code-review r4 finding) must keep
    pallas == tiled for bright color sets instead of silently clipping."""
    import jax.numpy as jnp
    from helpers import make_camera, make_scene
    import wildgaussians_tpu.cameras as wc
    from wildgaussians_tpu.ops.rasterize import rasterize_gaussians

    scene = make_scene(rng, n=300, spread=1.5, z_range=(3.0, 7.0))
    colors = (scene["colors"] * 2.4).astype(np.float32)  # up to ~2.4 > 1.5
    cam = make_camera(width=64, height=48)
    params, w, h = wc.make_camera_params(cam)
    args = (scene["xyz"], scene["scales"], scene["rotations"],
            scene["opacities"], colors)
    outs = {}
    for backend in ("tiled", "pallas"):
        outs[backend] = np.asarray(rasterize_gaussians(
            *map(jnp.asarray, args), params, w, h, kernel_size=0.1,
            backend=backend, big_fraction=0.5).color)
    assert outs["tiled"].max() > 1.6, "fixture must actually exceed range"
    np.testing.assert_allclose(outs["pallas"], outs["tiled"], atol=2.5e-2)
