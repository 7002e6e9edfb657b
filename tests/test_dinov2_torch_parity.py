"""Numeric validation of the JAX DINOv2 port against a torch execution.

The reference's vendored torch DINOv2 (reference dinov2.py:535-944) is
instantiated with its default random init, its state_dict is pushed through
our `_convert_torch_state`, and features must agree — this catches any
converter/transpose/architecture bug without needing pretrained weights
(none are downloadable in this environment).
"""
import importlib.util
import math
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_DINOV2 = "/root/reference/wildgaussians/dinov2.py"


def _load_ref_dinov2():
    spec = importlib.util.spec_from_file_location("ref_dinov2", REF_DINOV2)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_dinov2"] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def models():
    ref = _load_ref_dinov2()
    torch.manual_seed(0)
    tmodel = ref.vit_small(patch_size=14, num_register_tokens=4,
                           init_values=1.0, img_size=518, block_chunks=0)
    tmodel.eval()
    # replace zero-init/trivial params with random values so the comparison
    # exercises every tensor (LayerScale starts at 1.0, biases at 0, ...)
    with torch.no_grad():
        for p in tmodel.parameters():
            p.add_(torch.randn_like(p) * 0.02)

    from wildgaussians_tpu.models import dinov2 as jx
    state = {k: v.detach().clone() for k, v in tmodel.state_dict().items()}
    params = jx._convert_torch_state(state, jx.ARCHS["dinov2_vits14_reg"])
    jmodel = jx.DinoV2.__new__(jx.DinoV2)
    jmodel.arch = jx.ARCHS["dinov2_vits14_reg"]
    jmodel.backbone = "dinov2_vits14_reg"
    jmodel.patch_size = 14
    jmodel.embed_dim = 384
    jmodel.num_heads = 6
    jmodel.pretrained = False
    import jax.numpy as jnp
    jmodel.params = {k: jnp.asarray(v) for k, v in params.items()}
    return tmodel, jmodel


def _compare(tmodel, jmodel, size):
    rng = np.random.default_rng(1)
    img = rng.standard_normal((size, size, 3)).astype(np.float32)
    with torch.no_grad():
        tfeat = tmodel.get_intermediate_layers(
            torch.from_numpy(img).permute(2, 0, 1)[None],
            n=[tmodel.num_heads - 1], reshape=True)[-1]
    tfeat = tfeat[0].permute(1, 2, 0).numpy()          # [h, w, D]
    import jax.numpy as jnp
    jfeat = np.asarray(jmodel.features(jnp.asarray(img)))
    return tfeat, jfeat


def test_features_match_torch_native_grid(models):
    """518px input = the checkpoint's native 37x37 grid: no pos-embed
    interpolation; every other numeric path is exercised."""
    tmodel, jmodel = models
    tfeat, jfeat = _compare(tmodel, jmodel, 518)
    scale = np.abs(tfeat).max()
    np.testing.assert_allclose(jfeat, tfeat, atol=1e-4 * scale, rtol=1e-3)


def test_features_match_torch_interpolated_grid(models):
    """336px input (the uncertainty working size) goes through pos-embed
    interpolation — torch-bicubic semantics must be reproduced."""
    tmodel, jmodel = models
    tfeat, jfeat = _compare(tmodel, jmodel, 336)
    scale = np.abs(tfeat).max()
    np.testing.assert_allclose(jfeat, tfeat, atol=2e-4 * scale, rtol=1e-2)
