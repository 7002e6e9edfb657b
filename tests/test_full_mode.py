"""Full WildGaussians mode: appearance + DINOv2 uncertainty (random backbone
weights on CPU — exercises wiring, shapes, warmup, BN state, and protection)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from test_training import _make_synthetic_dataset


FULL_OVERRIDES = dict(
    uncertainty_mode="dino",
    appearance_enabled=True,
    num_sky_gaussians=0,
    sh_degree=1,
    iterations=60,
    densify_from_iter=15,
    densify_until_iter=50,
    densification_interval=20,
    opacity_reset_interval=10_000,
    position_lr_max_steps=60,
    uncertainty_warmup_start=5,
    uncertainty_warmup_iters=10,
    uncertainty_protected_iters=3,
)


@pytest.fixture(scope="module")
def full_method():
    from wildgaussians_tpu.models.wildgaussians import WildGaussians
    rng = np.random.default_rng(11)
    dataset, scene = _make_synthetic_dataset(rng, n_cams=4, width=64, height=48,
                                             n_points=150)
    method = WildGaussians(train_dataset=dataset, config_overrides=dict(FULL_OVERRIDES))
    metrics = [method.train_iteration(s) for s in range(30)]
    return method, dataset, metrics


def test_full_mode_trains(full_method):
    method, _dataset, metrics = full_method
    assert all(np.isfinite(m["loss"]) for m in metrics)
    assert "uncertainty_loss" in metrics[0]
    assert np.isfinite(metrics[-1]["uncertainty_loss"])
    first = np.mean([m["psnr"] for m in metrics[:5]])
    last = np.mean([m["psnr"] for m in metrics[-5:]])
    assert last > first  # improves even with (random-init) uncertainty active


def test_bn_state_updates(full_method):
    method, *_ = full_method
    bn = method._uncertainty.bn_state
    # batch stats of random dino features are not the init values
    assert float(jnp.abs(bn["mean"]).max()) > 0


def test_appearance_embeddings_receive_grads(full_method):
    method, _dataset, _ = full_method
    emb = np.asarray(method.params["appearance_embeddings"])
    assert np.abs(emb).max() > 0
    mu = np.asarray(method.adam.mu["appearance_embeddings"])
    assert np.abs(mu).max() > 0  # appearance embeddings got gradient updates


def test_optimize_embedding_full(full_method):
    method, dataset, _ = full_method
    from wildgaussians_tpu.datasets import dataset_index_select
    ds = dict(dataset)
    out = method.optimize_embedding(dataset_index_select(ds, [0]))
    assert out["embedding"].shape == (method.config.appearance_embedding_dim,)
    assert np.isfinite(out["metrics"]["loss"]).all()
    # optimization should reduce the loss
    assert out["metrics"]["loss"][-1] <= out["metrics"]["loss"][0]


def test_render_with_embedding_option(full_method):
    method, dataset, _ = full_method
    emb = np.zeros((method.config.appearance_embedding_dim,), np.float32)
    out = method.render(dataset["cameras"][0], options={"embedding": emb})
    assert out["color"].shape == (48, 64, 3)
    assert np.isfinite(out["color"]).all()


def test_full_mode_checkpoint_roundtrip(full_method, tmp_path):
    from wildgaussians_tpu.models.wildgaussians import WildGaussians
    method, dataset, _ = full_method
    path = str(tmp_path / "full_ckpt")
    method.save(path)
    loaded = WildGaussians(checkpoint=path)
    a = method.render(dataset["cameras"][1])["color"]
    b = loaded.render(dataset["cameras"][1])["color"]
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_depth_pass_parity_across_backends(rng):
    """The depth pass rides the color pipeline; under pack-v2 it is
    max-normalized into the rgb10 range and rescaled after the blend
    (models/renderer.py). Assert pallas depth ~= tiled depth within the
    documented quantization budget (~max_depth/1024 + f16 terms)."""
    import sys
    from test_training import _make_synthetic_dataset
    from wildgaussians_tpu.models.wildgaussians import WildGaussians

    dataset, _ = _make_synthetic_dataset(rng, n_cams=3, width=64, height=48,
                                         n_points=200)
    depths = {}
    for backend in ("tiled", "pallas"):
        overrides = dict(
            iterations=10, appearance_enabled=False,
            uncertainty_mode="disabled", num_sky_gaussians=0, sh_degree=1,
            rasterizer_backend=backend, position_lr_max_steps=10,
        )
        m = WildGaussians(train_dataset=dataset, config_overrides=overrides)
        out = m.render(dataset["cameras"][0],
                       options={"outputs": ("color", "depth")})
        assert "depth" in out
        depths[backend] = np.asarray(out["depth"])
        assert np.isfinite(depths[backend]).all()
    # only compare pixels with meaningful coverage (background depth is
    # an arbitrary mix with zero accumulation)
    acc = np.asarray(m.render(dataset["cameras"][0])["accumulation"])
    covered = acc > 0.5
    assert covered.mean() > 0.05
    diff = np.abs(depths["pallas"] - depths["tiled"])[covered]
    assert np.percentile(diff, 99) < 0.08, np.percentile(diff, 99)
