"""Uncertainty model units: head, losses, resize helpers (random backbone)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wildgaussians_tpu.config import Config, merge_config


@pytest.fixture(scope="module")
def unc():
    from wildgaussians_tpu.models.uncertainty import UncertaintyModel
    cfg = merge_config(Config(), {"uncertainty_mode": "dino"})
    return UncertaintyModel(cfg)


def test_head_output_range(unc, rng):
    from wildgaussians_tpu.models.uncertainty import DINO_SIZE
    params = unc.init_params(rng)
    feats = jnp.asarray(rng.normal(size=(24, 24, unc.dino.embed_dim)).astype(np.float32))
    u, new_bn = unc.head_uncertainty(params, unc.bn_state, feats, train=True,
                                     key=jax.random.PRNGKey(0))
    assert u.shape == (DINO_SIZE, DINO_SIZE)
    assert float(u.min()) >= unc.config.uncertainty_clip_min - 1e-6
    assert np.isfinite(np.asarray(u)).all()
    # train mode moved the running stats
    assert float(jnp.abs(new_bn["mean"] - unc.bn_state["mean"]).max()) > 0
    # eval mode: stats unchanged
    _u2, bn2 = unc.head_uncertainty(params, unc.bn_state, feats, train=False,
                                    key=jax.random.PRNGKey(0))
    assert bn2 is unc.bn_state


@pytest.mark.parametrize("mode", ["dino", "dino+mssim", "l2reg", "l1reg"])
def test_loss_modes(unc, rng, mode):
    from wildgaussians_tpu.models.uncertainty import DINO_SIZE
    object.__setattr__(unc.config, "uncertainty_mode", mode)
    try:
        params = unc.init_params(rng)
        gt = jnp.asarray(rng.uniform(0, 1, (DINO_SIZE, DINO_SIZE, 3)).astype(np.float32))
        pred = jnp.clip(gt + 0.1, 0, 1)
        feats = unc._dino_features(gt)
        mask = jnp.ones((DINO_SIZE, DINO_SIZE), jnp.float32)
        loss, metrics, lm, new_bn = unc.compute_loss(
            params, unc.bn_state, feats, gt, pred, mask,
            jax.random.PRNGKey(1), train=True)
        assert np.isfinite(float(loss))
        assert np.isfinite(np.asarray(lm)).all()
        assert (np.asarray(lm) >= 0).all()
        assert np.isfinite(metrics["beta"])
    finally:
        object.__setattr__(unc.config, "uncertainty_mode", "dino")


def test_uncertainty_params_get_grads(unc, rng):
    from wildgaussians_tpu.models.uncertainty import DINO_SIZE
    params = unc.init_params(rng)
    gt = jnp.asarray(rng.uniform(0, 1, (DINO_SIZE, DINO_SIZE, 3)).astype(np.float32))
    pred = jnp.clip(gt + 0.2, 0, 1)
    feats = unc._dino_features(gt)
    mask = jnp.ones((DINO_SIZE, DINO_SIZE), jnp.float32)

    def loss_fn(p):
        loss, *_ = unc.compute_loss(p, unc.bn_state, feats, gt, pred, mask,
                                    jax.random.PRNGKey(1), train=True)
        return loss
    g = jax.grad(loss_fn)(params)
    assert float(jnp.abs(g["conv_w"]).max()) > 0
    assert float(jnp.abs(g["bn_scale"]).max()) > 0


def test_resize_valid_roundtrip(rng):
    from wildgaussians_tpu.models.uncertainty import resize_valid, resize_to_valid
    img = np.zeros((64, 96, 3), np.float32)
    yy, xx = np.meshgrid(np.linspace(0, 1, 40), np.linspace(0, 1, 60), indexing="ij")
    img[:40, :60] = np.stack([yy, xx, 0.5 * (xx + yy)], -1).astype(np.float32)
    small = resize_valid(jnp.asarray(img), 32, 32, jnp.float32(40), jnp.float32(60))
    assert small.shape == (32, 32, 3)
    back = resize_to_valid(small, 64, 96, jnp.float32(40), jnp.float32(60))
    assert back.shape == (64, 96, 3)
    # the invalid region stays ~zero, the valid region is reconstructed coarsely
    assert float(jnp.abs(back[45:, :]).max()) < 0.2
    corr = np.corrcoef(np.asarray(back[:40, :60]).ravel(), img[:40, :60].ravel())[0, 1]
    assert corr > 0.98  # smooth content survives the roundtrip


def test_loss_mult_discriminates_occluder(unc, rng):
    """The flagship behavior (reference method.py:363-433): training the
    DINO-head on an image pair where GT carries a transient occluder must
    drive loss_mult DOWN inside the occluded region relative to the clean
    region. Uses the deterministic random-weight backbone (a linear probe
    on random ViT features still separates the two textures); weights only
    change WHICH features the head reads, not the mechanism under test."""
    import optax
    from wildgaussians_tpu.models.uncertainty import DINO_SIZE

    yy, xx = np.meshgrid(np.linspace(0, 1, DINO_SIZE),
                         np.linspace(0, 1, DINO_SIZE), indexing="ij")
    # clean render: smooth low-frequency ramps
    pred = np.stack([0.3 + 0.4 * xx, 0.5 + 0.3 * yy,
                     0.4 + 0.2 * np.sin(3 * xx + 2 * yy)], -1)
    gt = pred.copy()
    # transient occluder in the GT photo: high-frequency checker patch
    occ = np.zeros((DINO_SIZE, DINO_SIZE), bool)
    occ[90:240, 110:250] = True
    checker = ((np.floor(yy * 40) + np.floor(xx * 40)) % 2)
    gt[occ] = np.stack([0.9 * checker, 0.1 + 0.1 * checker,
                        0.8 - 0.6 * checker], -1)[occ]
    gt = jnp.asarray(gt.astype(np.float32))
    pred = jnp.asarray(pred.astype(np.float32))
    mask = jnp.ones((DINO_SIZE, DINO_SIZE), jnp.float32)

    params = unc.init_params(rng)
    feats = unc._dino_features(gt)
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, bn_state, key):
        def loss_fn(p):
            loss, _m, lm, new_bn = unc.compute_loss(
                p, bn_state, feats, gt, pred, mask, key, train=True)
            return loss, (lm, new_bn)
        (loss, (lm, new_bn)), g = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(params, updates), opt_state, new_bn, lm

    bn_state = unc.bn_state
    key = jax.random.PRNGKey(0)
    for i in range(60):
        key, k = jax.random.split(key)
        params, opt_state, bn_state, lm = step(params, opt_state,
                                               bn_state, k)

    # final eval-mode loss_mult (no dropout)
    _loss, _m, lm, _bn = unc.compute_loss(
        params, bn_state, feats, gt, pred, mask, jax.random.PRNGKey(9),
        train=False)
    lm = np.asarray(lm)
    # erode region borders (bilinear upsample of 24x24 patches blurs edges)
    inner = np.zeros_like(occ)
    inner[110:220, 130:230] = True
    outer = ~occ
    outer[60:270, 80:280] = False
    assert lm[inner].mean() < 0.5 * lm[outer].mean(), (
        lm[inner].mean(), lm[outer].mean())
