"""Multi-device (8-way CPU mesh) sharded training + native knn parity."""
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def test_devices_available():
    assert len(jax.devices()) >= 8


def test_dryrun_multichip():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_sharded_render_matches_single(rng):
    """Tile-sharded render must be numerically identical to unsharded."""
    from helpers import make_camera, make_scene
    import wildgaussians_tpu.cameras as wc
    from wildgaussians_tpu.ops.rasterize import rasterize_gaussians
    from wildgaussians_tpu.parallel.mesh import make_tile_mesh, use_mesh

    scene = make_scene(rng, n=300)
    cam = make_camera(width=64, height=64)
    params, w, h = wc.make_camera_params(cam)
    args = tuple(jnp.asarray(scene[k])
                 for k in ("xyz", "scales", "rotations", "opacities", "colors"))

    base = rasterize_gaussians(*args, params, w, h, kernel_size=0.1,
                               backend="tiled")
    mesh = make_tile_mesh(jax.devices()[:8])
    with use_mesh(mesh):
        fn = jax.jit(lambda *a: rasterize_gaussians(
            *a, params, w, h, kernel_size=0.1, backend="tiled",
            batch_tiles=8).color)
        sharded = fn(*args)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(base.color),
                               atol=1e-5)


def test_sharded_grads_match_single(rng):
    from helpers import make_camera, make_scene
    import wildgaussians_tpu.cameras as wc
    from wildgaussians_tpu.ops.rasterize import rasterize_gaussians
    from wildgaussians_tpu.parallel.mesh import make_tile_mesh, use_mesh

    scene = make_scene(rng, n=150)
    cam = make_camera(width=48, height=48)
    params, w, h = wc.make_camera_params(cam)
    args = tuple(jnp.asarray(scene[k])
                 for k in ("xyz", "scales", "rotations", "opacities", "colors"))
    target = jnp.asarray(rng.uniform(0, 1, (h, w, 3)).astype(np.float32))

    def loss(*a):
        out = rasterize_gaussians(*a, params, w, h, kernel_size=0.1,
                                  backend="tiled", batch_tiles=8)
        return jnp.mean((out.color - target) ** 2)

    g_base = jax.grad(loss, argnums=(0, 3))(*args)
    mesh = make_tile_mesh(jax.devices()[:8])
    with use_mesh(mesh):
        g_shard = jax.jit(jax.grad(loss, argnums=(0, 3)))(*args)
    for gb, gsh in zip(g_base, g_shard):
        np.testing.assert_allclose(np.asarray(gsh), np.asarray(gb),
                                   atol=1e-6, rtol=1e-4)


def test_sharded_pallas_partition_matches_single(rng):
    """The pallas partition path under an 8-device tile mesh must be
    bit-exact with the single-device pallas render + gradients (shard_map
    over tile bands; psum'd Gaussian grads)."""
    from helpers import make_camera, make_scene
    import wildgaussians_tpu.cameras as wc
    from wildgaussians_tpu.ops.gaussians import compute_cov3d, preprocess
    from wildgaussians_tpu.ops.rasterize_pallas import rasterize_pallas_multi
    from wildgaussians_tpu.ops.rasterize_tiled import make_grid
    from wildgaussians_tpu.parallel.mesh import make_tile_mesh

    scene = make_scene(rng, n=200)
    scene["scales"][:8] *= 20.0   # exercise the tiered (rank-merge) path too
    cam = make_camera(width=64, height=64)
    params, w, h = wc.make_camera_params(cam)
    cov3d = compute_cov3d(jnp.asarray(scene["scales"]),
                          jnp.asarray(scene["rotations"]))
    pre = preprocess(jnp.asarray(scene["xyz"]), cov3d,
                     jnp.asarray(scene["opacities"]), params, w, h, 0.1)
    grid = make_grid(w, h, 16)
    colors = jnp.asarray(scene["colors"])
    n = colors.shape[0]
    target = jnp.asarray(rng.uniform(0, 1, (h, w, 3)).astype(np.float32))
    geo = (pre.depth, pre.rect_min, pre.rect_max, pre.tiles_touched, pre.valid)
    bg = jnp.zeros((3,), jnp.float32)

    def loss(mesh, m2d, con, op, col):
        # pin the single-device baseline to the same (exact-payload)
        # partition binning the mesh path forces — the default sort binning
        # carries f16-packed payloads and differs by quantization noise
        ((img, _t),) = rasterize_pallas_multi(
            m2d, con, op, [col], jnp.zeros((n, 2)), *geo, bg, grid=grid,
            max_tiles_per_gaussian=16, mesh=mesh, binning="partition")
        return jnp.mean((img - target) ** 2)

    args = (pre.mean2d, pre.conic, pre.opacity, colors)
    base_l, base_g = jax.value_and_grad(
        lambda *a: loss(None, *a), argnums=(0, 1, 2, 3))(*args)
    mesh = make_tile_mesh(jax.devices()[:8])
    sh_l, sh_g = jax.jit(jax.value_and_grad(
        lambda *a: loss(mesh, *a), argnums=(0, 1, 2, 3)))(*args)
    assert float(base_l) == pytest.approx(float(sh_l), abs=1e-7)
    for gb, gs in zip(base_g, sh_g):
        # forward images are bit-exact; gradients differ only by the psum's
        # reduction order (each Gaussian's entries split across shards)
        gb, gs = np.asarray(gb), np.asarray(gs)
        np.testing.assert_allclose(gs, gb, rtol=1e-5,
                                   atol=1e-6 * (np.abs(gb).max() + 1e-12))


def test_sharded_sort_engine_matches_single(rng):
    """The Gaussian-sharded sort engine (local sort + all-to-all to tile
    bands) under an 8-device mesh must match the single-device sort engine:
    same corner-cull compaction, same f16 payloads, same kernels — only the
    binning is distributed. Differences are bounded by f32 chunk-boundary
    reassociation and quantized-depth ties."""
    from helpers import make_camera, make_scene
    import wildgaussians_tpu.cameras as wc
    from wildgaussians_tpu.ops.gaussians import compute_cov3d, preprocess
    from wildgaussians_tpu.ops.rasterize_pallas import rasterize_pallas_multi
    from wildgaussians_tpu.ops.rasterize_tiled import make_grid
    from wildgaussians_tpu.parallel.mesh import make_tile_mesh

    scene = make_scene(rng, n=200)
    scene["scales"][::25] *= 20.0   # one tier-2 (big) Gaussian per shard
    cam = make_camera(width=64, height=64)
    params, w, h = wc.make_camera_params(cam)
    cov3d = compute_cov3d(jnp.asarray(scene["scales"]),
                          jnp.asarray(scene["rotations"]))
    pre = preprocess(jnp.asarray(scene["xyz"]), cov3d,
                     jnp.asarray(scene["opacities"]), params, w, h, 0.1)
    grid = make_grid(w, h, 16)
    colors = jnp.asarray(scene["colors"])
    n = colors.shape[0]
    target = jnp.asarray(rng.uniform(0, 1, (h, w, 3)).astype(np.float32))
    geo = (pre.depth, pre.rect_min, pre.rect_max, pre.tiles_touched, pre.valid)
    bg = jnp.asarray([0.1, 0.2, 0.3], jnp.float32)

    def run(mesh, m2d, con, op, col, bg_):
        ((img, _t),) = rasterize_pallas_multi(
            m2d, con, op, [col], jnp.zeros((n, 2)), *geo, bg_, grid=grid,
            max_tiles_per_gaussian=16, big_fraction=0.5, mesh=mesh,
            binning="sort")
        return img

    def loss(mesh, *a):
        return jnp.mean((run(mesh, *a) - target) ** 2)

    args = (pre.mean2d, pre.conic, pre.opacity, colors, bg)
    img_base = run(None, *args)
    base_l, base_g = jax.value_and_grad(
        lambda *a: loss(None, *a), argnums=(0, 1, 2, 3, 4))(*args)
    mesh = make_tile_mesh(jax.devices()[:8])
    img_sh = jax.jit(lambda *a: run(mesh, *a))(*args)
    sh_l, sh_g = jax.jit(jax.value_and_grad(
        lambda *a: loss(mesh, *a), argnums=(0, 1, 2, 3, 4)))(*args)

    np.testing.assert_allclose(np.asarray(img_sh), np.asarray(img_base),
                               atol=2e-5)
    assert float(base_l) == pytest.approx(float(sh_l), abs=1e-6)
    for gb, gs in zip(base_g, sh_g):
        gb, gs = np.asarray(gb), np.asarray(gs)
        np.testing.assert_allclose(gs, gb, rtol=1e-4,
                                   atol=2e-5 * (np.abs(gb).max() + 1e-12))


def _run_sharded_training(rng, shard_store: bool):
    import sys
    sys.path.insert(0, "/root/repo/tests")
    from test_training import _make_synthetic_dataset, OVERRIDES
    from wildgaussians_tpu.models.wildgaussians import WildGaussians
    from wildgaussians_tpu.parallel.mesh import make_tile_mesh, use_mesh

    dataset, _scene = _make_synthetic_dataset(rng, n_cams=3, width=64,
                                              height=48, n_points=150)
    overrides = dict(OVERRIDES)
    overrides.update(iterations=30, rasterizer_backend="pallas",
                     pallas_binning="sort", pallas_big_fraction=1.0,
                     shard_gaussian_store=shard_store,
                     densify_from_iter=2, densification_interval=6,
                     densify_until_iter=25, opacity_reset_interval=12)
    m = WildGaussians(train_dataset=dataset, config_overrides=overrides)
    mesh = make_tile_mesh(jax.devices()[:8])
    with use_mesh(mesh):
        metrics = [m.train_iteration(s) for s in range(14)]
    assert all(np.isfinite(x["loss"]) for x in metrics)
    assert metrics[-1]["loss"] < metrics[0]["loss"]
    return m, mesh


def test_sharded_training_with_densify(rng):
    """Several train iterations under the 8-device mesh with the production
    setup (sharded sort engine + 1/D-sharded store), crossing a densify
    interval and an opacity reset: losses finite and decreasing, the store
    still sharded on the Gaussian axis afterwards. Runs through the
    AOT-compiled executables (_aot_under_mesh) that dodge jax 0.9's
    dispatch-fastpath bug with the engine's shard_map+all_to_all."""
    from jax.sharding import NamedSharding, PartitionSpec
    m, mesh = _run_sharded_training(rng, shard_store=True)
    want = NamedSharding(mesh, PartitionSpec("tiles", None))
    got = m.params["xyz"].sharding
    assert got.is_equivalent_to(want, m.params["xyz"].ndim), got


# NOTE: shard_gaussian_store=False (interface shardings left to GSPMD) is
# NOT supported for multi-step mesh training: the step / densify / reset
# executables each pick their own interface shardings and disagree (AOT
# raises a sharding-mismatch ValueError on the first cross-function
# handoff). The default pinned mode is the supported production path.


def test_native_knn_matches_jax(rng):
    from wildgaussians_tpu.ops import knn_native
    from wildgaussians_tpu.ops.knn import mean_knn_dist2
    if not knn_native.available():
        pytest.skip("native toolchain unavailable")
    pts = rng.uniform(0, 1, (2000, 3)).astype(np.float32)
    got = knn_native.mean_knn_dist2_native(pts, window=1999)
    d = ((pts[:, None] - pts[None]) ** 2).sum(-1)
    np.fill_diagonal(d, np.inf)
    want = np.sort(d, axis=1)[:, :3].mean(1)
    np.testing.assert_allclose(got, want, rtol=1e-5)
