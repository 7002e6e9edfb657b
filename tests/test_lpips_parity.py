"""LPIPS implementation check against an independent computation.

torchvision is absent in this image, so the reference's trunks cannot be
instantiated directly; instead torchvision-format state dicts with random
weights are synthesized, loaded through our LPIPS, and the result is
compared against a from-the-math re-computation of the reference's forward
(reference _metrics_lpips.py:188-210, 287-340): scaling layer -> trunk taps
-> channel-normalize -> 1x1 heads -> spatial mean -> sum over taps. This
validates tap placement, weight-key mapping, and the distance pipeline.
"""
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _alex_state(rng):
    shapes = {
        "features.0.weight": (64, 3, 11, 11), "features.0.bias": (64,),
        "features.3.weight": (192, 64, 5, 5), "features.3.bias": (192,),
        "features.6.weight": (384, 192, 3, 3), "features.6.bias": (384,),
        "features.8.weight": (256, 384, 3, 3), "features.8.bias": (256,),
        "features.10.weight": (256, 256, 3, 3), "features.10.bias": (256,),
    }
    return {k: torch.tensor(rng.standard_normal(v).astype(np.float32) * 0.05)
            for k, v in shapes.items()}


def _heads_state(rng, chans):
    return {f"lin{i}.model.1.weight":
            torch.tensor(np.abs(rng.standard_normal((1, c, 1, 1))
                                ).astype(np.float32))
            for i, c in enumerate(chans)}


@pytest.fixture()
def weights_dir(tmp_path):
    rng = np.random.default_rng(3)
    torch.save(_alex_state(rng), tmp_path / "alexnet-owt-7be5be79.pth")
    torch.save(_heads_state(rng, [64, 192, 384, 256, 256]),
               tmp_path / "lpips_alex_0.1.pth")
    old = os.environ.get("WG_LPIPS_WEIGHTS_DIR")
    os.environ["WG_LPIPS_WEIGHTS_DIR"] = str(tmp_path)
    # the module caches the dir list at import; patch it directly too
    import wildgaussians_tpu.metrics_lpips as ml
    old_dirs = ml._WEIGHT_DIRS
    ml._WEIGHT_DIRS = [str(tmp_path)]
    yield tmp_path
    ml._WEIGHT_DIRS = old_dirs
    if old is None:
        os.environ.pop("WG_LPIPS_WEIGHTS_DIR", None)
    else:
        os.environ["WG_LPIPS_WEIGHTS_DIR"] = old


def _manual_lpips(state, heads, x0, x1):
    """The reference pipeline written out longhand (alex trunk)."""
    shift = torch.tensor([-.030, -.088, -.188])[None, :, None, None]
    scale = torch.tensor([.458, .448, .450])[None, :, None, None]

    def trunk(x):
        taps = []
        h = F.relu(F.conv2d(x, state["features.0.weight"],
                            state["features.0.bias"], stride=4, padding=2))
        taps.append(h)
        h = F.max_pool2d(h, 3, 2)
        h = F.relu(F.conv2d(h, state["features.3.weight"],
                            state["features.3.bias"], padding=2))
        taps.append(h)
        h = F.max_pool2d(h, 3, 2)
        h = F.relu(F.conv2d(h, state["features.6.weight"],
                            state["features.6.bias"], padding=1))
        taps.append(h)
        h = F.relu(F.conv2d(h, state["features.8.weight"],
                            state["features.8.bias"], padding=1))
        taps.append(h)
        h = F.relu(F.conv2d(h, state["features.10.weight"],
                            state["features.10.bias"], padding=1))
        taps.append(h)
        return taps

    f0 = trunk((x0 - shift) / scale)
    f1 = trunk((x1 - shift) / scale)
    total = torch.zeros(x0.shape[0])
    for i, (a, b) in enumerate(zip(f0, f1)):
        na = a / (a.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
        nb = b / (b.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
        d = (na - nb) ** 2
        w = heads[f"lin{i}.model.1.weight"]
        total = total + F.conv2d(d, w).mean(dim=(2, 3)).squeeze(1)
    return total


def test_lpips_matches_reference_pipeline(weights_dir):
    from wildgaussians_tpu.metrics_lpips import LPIPS
    rng = np.random.default_rng(7)
    model = LPIPS(net="alex")
    x0 = torch.tensor(rng.uniform(-1, 1, (2, 3, 96, 128)).astype(np.float32))
    x1 = torch.tensor(rng.uniform(-1, 1, (2, 3, 96, 128)).astype(np.float32))
    with torch.no_grad():
        got = model(x0, x1).numpy()
    state = torch.load(weights_dir / "alexnet-owt-7be5be79.pth",
                       weights_only=True)
    heads = torch.load(weights_dir / "lpips_alex_0.1.pth", weights_only=True)
    want = _manual_lpips(state, heads, x0, x1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    assert (got > 0).all()


_VGG_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
            512, 512, 512, "M", 512, 512, 512]
_VGG_TAPS = (3, 8, 15, 22, 29)  # relu1_2, 2_2, 3_3, 4_3, 5_3


def _vgg_state(rng):
    """torchvision vgg16 'features.*' keys (conv/relu/pool interleaved)."""
    state, in_ch, idx = {}, 3, 0
    for v in _VGG_CFG + ["M"]:
        if v == "M":
            idx += 1
            continue
        state[f"features.{idx}.weight"] = torch.tensor(
            rng.standard_normal((v, in_ch, 3, 3)).astype(np.float32) * 0.05)
        state[f"features.{idx}.bias"] = torch.tensor(
            rng.standard_normal((v,)).astype(np.float32) * 0.05)
        in_ch, idx = v, idx + 2
    return state


def _manual_lpips_vgg(state, heads, x0, x1):
    shift = torch.tensor([-.030, -.088, -.188])[None, :, None, None]
    scale = torch.tensor([.458, .448, .450])[None, :, None, None]

    def trunk(x):
        taps, idx = [], 0
        for v in _VGG_CFG:
            if v == "M":
                x = F.max_pool2d(x, 2, 2)
                idx += 1
                continue
            x = F.relu(F.conv2d(x, state[f"features.{idx}.weight"],
                                state[f"features.{idx}.bias"], padding=1))
            if idx + 1 in _VGG_TAPS:
                taps.append(x)
            idx += 2
        return taps

    f0 = trunk((x0 - shift) / scale)
    f1 = trunk((x1 - shift) / scale)
    total = torch.zeros(x0.shape[0])
    for i, (a, b) in enumerate(zip(f0, f1)):
        na = a / (a.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
        nb = b / (b.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
        w = heads[f"lin{i}.model.1.weight"]
        total = total + F.conv2d((na - nb) ** 2, w).mean(dim=(2, 3)).squeeze(1)
    return total


def test_lpips_vgg_matches_reference_pipeline(tmp_path):
    import wildgaussians_tpu.metrics_lpips as ml
    rng = np.random.default_rng(5)
    torch.save(_vgg_state(rng), tmp_path / "vgg16-397923af.pth")
    torch.save(_heads_state(rng, [64, 128, 256, 512, 512]),
               tmp_path / "lpips_vgg_0.1.pth")
    old_dirs = ml._WEIGHT_DIRS
    ml._WEIGHT_DIRS = [str(tmp_path)]
    try:
        model = ml.LPIPS(net="vgg")
    finally:
        ml._WEIGHT_DIRS = old_dirs
    x0 = torch.tensor(rng.uniform(-1, 1, (2, 3, 64, 96)).astype(np.float32))
    x1 = torch.tensor(rng.uniform(-1, 1, (2, 3, 64, 96)).astype(np.float32))
    with torch.no_grad():
        got = model(x0, x1).numpy()
    state = torch.load(tmp_path / "vgg16-397923af.pth", weights_only=True)
    heads = torch.load(tmp_path / "lpips_vgg_0.1.pth", weights_only=True)
    want = _manual_lpips_vgg(state, heads, x0, x1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    assert (got > 0).all()
