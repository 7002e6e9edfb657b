"""End-to-end training on a synthetic scene + store invariants + Adam parity."""
import dataclasses
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wildgaussians_tpu.types import new_cameras
from helpers import make_camera, make_scene


def _make_synthetic_dataset(rng, n_cams=6, width=64, height=48, n_points=300,
                            sizes=None):
    """Ground-truth gaussians rendered with the oracle become the 'photos'.

    `sizes` optionally gives a per-camera (width, height) list (mixed-
    resolution datasets, e.g. the size-bucketing test)."""
    import wildgaussians_tpu.cameras as wc
    from wildgaussians_tpu.ops.rasterize import rasterize_gaussians

    if sizes is None:
        sizes = [(width, height)] * n_cams
    n_cams = len(sizes)
    scene = make_scene(rng, n=n_points, spread=1.5, z_range=(3.0, 7.0))
    poses, images = [], []
    for i in range(n_cams):
        angle = (i - n_cams / 2) * 0.08
        pose = np.eye(4, dtype=np.float32)[:3]
        pose[0, 3] = np.sin(angle) * 4.0
        pose[2, 3] = 5.0 - np.cos(angle) * 5.0
        # small rotation around y to look at scene center
        c, s = np.cos(angle * 0.5), np.sin(angle * 0.5)
        rot = np.array([[c, 0, -s], [0, 1, 0], [s, 0, c]], np.float32)
        pose[:3, :3] = rot
        poses.append(pose)
    intrinsics = np.stack([
        np.array([w / (2 * np.tan(np.radians(50.0) / 2)),
                  w / (2 * np.tan(np.radians(50.0) / 2)),
                  w / 2, h / 2], np.float32) for w, h in sizes])
    cameras = new_cameras(
        poses=np.stack(poses),
        intrinsics=intrinsics,
        camera_models=np.zeros((n_cams,), np.int32),
        distortion_parameters=np.zeros((n_cams, 6), np.float32),
        image_sizes=np.asarray(sizes, np.int32),
    )
    for i in range(n_cams):
        params, w, h = wc.make_camera_params(cameras[i])
        out = rasterize_gaussians(
            jnp.asarray(scene["xyz"]), jnp.asarray(scene["scales"]),
            jnp.asarray(scene["rotations"]), jnp.asarray(scene["opacities"]),
            jnp.asarray(scene["colors"]), params, w, h,
            kernel_size=0.1, backend="tiled")
        images.append(np.clip(np.asarray(out.color), 0, 1))

    noisy_xyz = scene["xyz"] + rng.normal(0, 0.05, scene["xyz"].shape).astype(np.float32)
    dataset = dict(
        cameras=cameras,
        images=images,
        masks=None,
        points3D_xyz=noisy_xyz,
        points3D_rgb=(scene["colors"] * 255).astype(np.uint8),
        image_paths=[f"{i:03d}.png" for i in range(n_cams)],
        image_paths_root=".", mask_paths=None, mask_paths_root=None,
        metadata={}, images_points3D_indices=None,
    )
    return dataset, scene


OVERRIDES = dict(
    uncertainty_mode="disabled",
    appearance_enabled=False,
    num_sky_gaussians=0,
    sh_degree=1,
    iterations=400,
    densify_from_iter=30,
    densify_until_iter=300,
    densification_interval=60,
    opacity_reset_interval=10_000,
    position_lr_max_steps=400,
)


@pytest.fixture(scope="module")
def trained():
    from wildgaussians_tpu.models.wildgaussians import WildGaussians
    rng = np.random.default_rng(3)
    dataset, scene = _make_synthetic_dataset(rng)
    method = WildGaussians(train_dataset=dataset, config_overrides=dict(OVERRIDES))
    first = method.train_iteration(0)
    metrics = [first]
    for step in range(1, 120):
        metrics.append(method.train_iteration(step))
    return method, dataset, metrics


def test_training_improves_psnr(trained):
    _method, _dataset, metrics = trained
    first_psnr = np.mean([m["psnr"] for m in metrics[:10]])
    last_psnr = np.mean([m["psnr"] for m in metrics[-10:]])
    assert np.isfinite(last_psnr)
    assert last_psnr > first_psnr + 1.0, f"{first_psnr} -> {last_psnr}"


def test_densification_happened(trained):
    method, _dataset, metrics = trained
    assert int(jnp.sum(method.aux.alive)) > 0
    # densify intervals hit at iterations 60,120 within the 120 steps
    assert any(m["num_gaussians"] != metrics[0]["num_gaussians"] for m in metrics)


def test_render_protocol(trained):
    method, dataset, _ = trained
    out = method.render(dataset["cameras"][0])
    assert out["color"].shape == (48, 64, 3)
    assert np.isfinite(out["color"]).all()
    assert out["accumulation"].shape == (48, 64)
    out_d = method.render(dataset["cameras"][1], options={"outputs": ("depth",)})
    assert out_d["depth"].shape == (48, 64)
    assert (out_d["depth"] >= 0).all()


def test_save_load_roundtrip(trained, tmp_path):
    from wildgaussians_tpu.models.wildgaussians import WildGaussians
    method, dataset, _ = trained
    path = str(tmp_path / "ckpt")
    method.save(path)
    ref_render = method.render(dataset["cameras"][2])["color"]

    loaded = WildGaussians(checkpoint=path)
    got = loaded.render(dataset["cameras"][2])["color"]
    np.testing.assert_allclose(got, ref_render, atol=1e-5)

    # ply round trip
    from wildgaussians_tpu.io.ply import load_ply
    ply = load_ply(str(tmp_path / "ckpt" / "point_cloud.ply"))
    assert ply["xyz"].shape[0] == int(jnp.sum(method.aux.alive))


def test_adam_matches_torch(rng):
    import torch
    from wildgaussians_tpu.models.gaussian_store import adam_update, init_adam

    w = rng.normal(size=(16, 4)).astype(np.float32)
    params = {"xyz": jnp.asarray(w)}
    adam = init_adam(params)
    tp = torch.nn.Parameter(torch.tensor(w))
    topt = torch.optim.Adam([tp], lr=0.01, eps=1e-15)
    for i in range(5):
        g = rng.normal(size=w.shape).astype(np.float32)
        params, adam = adam_update(params, {"xyz": jnp.asarray(g)}, adam,
                                   {"xyz": 0.01})
        tp.grad = torch.tensor(g)
        topt.step()
    np.testing.assert_allclose(np.asarray(params["xyz"]), tp.detach().numpy(),
                               atol=1e-6, rtol=1e-5)


def test_masked_quantile_matches_torch(rng):
    import torch
    from wildgaussians_tpu.models.gaussian_store import _masked_quantile
    vals = rng.normal(size=(100,)).astype(np.float32)
    mask = rng.uniform(size=100) > 0.3
    for q in [0.0, 0.25, 0.61, 1.0]:
        got = float(_masked_quantile(jnp.asarray(vals), jnp.asarray(mask), jnp.float32(q)))
        want = float(torch.quantile(torch.tensor(vals[mask]), q))
        assert abs(got - want) < 1e-5, (q, got, want)


def test_knn_dist2_reasonable(rng):
    from wildgaussians_tpu.ops.knn import mean_knn_dist2
    pts = rng.uniform(0, 1, (500, 3)).astype(np.float32)
    got = np.asarray(mean_knn_dist2(jnp.asarray(pts), window=64))
    # brute force
    d = ((pts[:, None] - pts[None]) ** 2).sum(-1)
    np.fill_diagonal(d, np.inf)
    want = np.sort(d, axis=1)[:, :3].mean(1)
    # windowed search is approximate (only seeds init scales,
    # reference method.py:1001-1002); demand statistical closeness
    rel = np.abs(got - want) / (want + 1e-12)
    assert (rel < 1e-5).mean() > 0.75
    assert rel.mean() < 0.1
    assert (got >= want * (1 - 1e-5) - 1e-7).all()  # can only overestimate (mod fp)


def test_overflow_auto_bump(rng):
    """Persistent rect truncation grows max_tiles_per_gaussian (staged
    recompile), mirroring capacity growth."""
    from wildgaussians_tpu.models.wildgaussians import WildGaussians
    dataset, _scene = _make_synthetic_dataset(rng, n_cams=2, width=64,
                                              height=48, n_points=60)
    overrides = dict(OVERRIDES)
    overrides.update(iterations=30, rasterizer_backend="tiled",
                     max_tiles_per_gaussian=1, densify_from_iter=1000)
    m = WildGaussians(train_dataset=dataset, config_overrides=overrides)
    before = m.config.max_tiles_per_gaussian
    for s in range(12):
        m.train_iteration(s)
    assert m.config.max_tiles_per_gaussian > before


def test_send_drop_auto_grows_send_beta(rng):
    """Persistent sharded-engine send drops grow pallas_send_beta directly
    (the knob that actually fixes them), NOT the tile budget; pure tile
    overflow still grows max_tiles_per_gaussian and leaves beta alone.
    The drop counting itself (tight cap truncates, generous cap is exact)
    is covered on the real mesh engine by test_send_cap.py."""
    from wildgaussians_tpu.models.wildgaussians import WildGaussians
    dataset, _scene = _make_synthetic_dataset(rng, n_cams=2, width=64,
                                              height=48, n_points=60)
    overrides = dict(OVERRIDES)
    overrides.update(iterations=30, rasterizer_backend="tiled",
                     densify_from_iter=1000)
    m = WildGaussians(train_dataset=dataset, config_overrides=overrides)
    beta0 = m.config.pallas_send_beta
    d0 = m.config.max_tiles_per_gaussian
    # send drops only -> beta grows, tile budget untouched
    for _ in range(10):
        m._maybe_grow_tile_budget(overflow=7.0, send_drops=7.0)
    assert m.config.pallas_send_beta > beta0
    assert m.config.max_tiles_per_gaussian == d0
    # tile overflow only -> budget grows, beta untouched
    beta1 = m.config.pallas_send_beta
    for _ in range(10):
        m._maybe_grow_tile_budget(overflow=5.0, send_drops=0.0)
    assert m.config.max_tiles_per_gaussian > d0
    assert m.config.pallas_send_beta == beta1
    # drops gone -> streaks reset, nothing grows further
    beta2, d2 = m.config.pallas_send_beta, m.config.max_tiles_per_gaussian
    for _ in range(20):
        m._maybe_grow_tile_budget(overflow=0.0, send_drops=0.0)
    assert (m.config.pallas_send_beta, m.config.max_tiles_per_gaussian) \
        == (beta2, d2)


def test_size_bucketing_mixed_resolutions(rng):
    """size_bucket_multiple>0 pads each train image to its own bucket and
    compiles one step program per distinct canvas; training stays finite and
    renders keep their exact per-camera sizes."""
    from wildgaussians_tpu.models.wildgaussians import WildGaussians
    sizes = [(64, 48), (48, 64), (32, 40), (64, 48)]
    dataset, _scene = _make_synthetic_dataset(rng, n_points=80, sizes=sizes)
    overrides = dict(OVERRIDES)
    overrides.update(iterations=40, densify_from_iter=1000,
                     size_bucket_multiple=16)
    m = WildGaussians(train_dataset=dataset, config_overrides=overrides)
    assert len(set(m._pad_wh)) == 3  # three distinct buckets
    for img, (bw, bh) in zip(m._train_images, m._pad_wh):
        assert img.shape[:2] == (bh, bw)
    metrics = [m.train_iteration(s) for s in range(8)]
    assert all(np.isfinite(x["loss"]) for x in metrics)
    # every bucket that was visited got its own compiled step
    assert set(m._step_cache) <= set(m._pad_wh)
    assert len(m._step_cache) >= 2
    out = m.render(dataset["cameras"][1])
    assert out["color"].shape == (64, 48, 3)


def test_tile_budget_autogrow_saturates(rng):
    """Round-4 fix: on scenes whose footprints exceed ANY tile budget the
    overflow auto-grow must latch saturated instead of recompiling with
    ever larger tables every 10 steps forever (observed 54 s -> 137 s
    recompiles at fixture scale)."""
    from wildgaussians_tpu.models.wildgaussians import WildGaussians

    dataset, _ = _make_synthetic_dataset(rng)
    method = WildGaussians(train_dataset=dataset,
                           config_overrides=dict(OVERRIDES))
    budgets = [method.config.max_tiles_per_gaussian]
    # constant, never-improving overflow: trigger the grow path repeatedly
    for _ in range(8):
        for _ in range(10):
            method._maybe_grow_tile_budget(5000.0, 0.0)
        budgets.append(method.config.max_tiles_per_gaussian)
    # exactly ONE grow, then the non-converging overflow latches saturation
    assert budgets[1] == budgets[0] * 3 // 2 + 1
    assert budgets[-1] == budgets[1], budgets
    assert method._tile_budget_saturated
    # an IMPROVING overflow keeps growing until the cap
    method2 = WildGaussians(train_dataset=dataset,
                            config_overrides=dict(OVERRIDES))
    level = 50000.0
    for _ in range(4):
        for _ in range(10):
            method2._maybe_grow_tile_budget(level, 0.0)
        level *= 0.5   # each grow halves the overflow -> keeps converging
    assert method2.config.max_tiles_per_gaussian > budgets[1]
    assert not method2.__dict__.get("_tile_budget_saturated", False)
