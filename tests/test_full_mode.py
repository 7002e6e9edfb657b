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
