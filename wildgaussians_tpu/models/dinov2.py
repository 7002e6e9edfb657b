"""DINOv2 ViT backbone in pure JAX (frozen feature extractor).

Own implementation with the same architecture as the reference's vendored
facebookresearch DINOv2 (reference dinov2.py:535-944): patch-14 ViT with cls +
register tokens, LayerScale blocks, and get_intermediate_layers semantics
(final-norm applied, patch tokens only). Weights convert from the public torch
checkpoint (dinov2_vits14_reg4_pretrain.pth) when present locally; otherwise
a seeded random init is used (the uncertainty pipeline still runs, predictions
are just untrained — this environment has no network egress).

All matmuls are [tokens, channels] x [channels, channels] — MXU shapes; the
backbone runs under stop_gradient (frozen, reference method.py:227-229).
"""
import logging
import math
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)

_HIGH = jax.lax.Precision.HIGHEST

ARCHS = {
    "dinov2_vits14_reg": dict(embed_dim=384, depth=12, num_heads=6, mlp_ratio=4,
                              patch_size=14, num_register_tokens=4,
                              init_values=1.0),
    "dinov2_vitb14_reg": dict(embed_dim=768, depth=12, num_heads=12, mlp_ratio=4,
                              patch_size=14, num_register_tokens=4,
                              init_values=1.0),
    "dinov2_vits14": dict(embed_dim=384, depth=12, num_heads=6, mlp_ratio=4,
                          patch_size=14, num_register_tokens=0, init_values=1.0),
}

_WEIGHT_FILES = {
    "dinov2_vits14_reg": "dinov2_vits14_reg4_pretrain.pth",
    "dinov2_vitb14_reg": "dinov2_vitb14_reg4_pretrain.pth",
    "dinov2_vits14": "dinov2_vits14_pretrain.pth",
}


def _find_weights(backbone: str) -> Optional[str]:
    from ..utils import download_to_cache
    env = os.environ.get("WG_DINOV2_WEIGHTS")
    candidates = []
    if env:
        if env.startswith(("http://", "https://")):
            return download_to_cache(env)
        candidates.append(env)
    fname = _WEIGHT_FILES.get(backbone, f"{backbone}_pretrain.pth")
    candidates += [
        os.path.expanduser(f"~/.cache/torch/hub/checkpoints/{fname}"),
        os.path.expanduser(f"~/.cache/wild-gaussians-tpu/{fname}"),
    ]
    for c in candidates:
        if os.path.exists(c):
            return c
    # Same URL scheme the reference's hub loader uses (dinov2.py:890,939-941):
    # base name drops the _regN suffix, the file name keeps it.
    base = backbone.split("_reg")[0]
    return download_to_cache(
        f"https://dl.fbaipublicfiles.com/dinov2/{base}/{fname}", fname)


def _random_params(arch: dict, seed: int = 0) -> Dict[str, np.ndarray]:
    rng = np.random.default_rng(seed)
    d = arch["embed_dim"]
    ps = arch["patch_size"]
    depth = arch["depth"]
    mlp = d * arch["mlp_ratio"]

    def tn(*shape, std=0.02):
        return (rng.standard_normal(shape) * std).astype(np.float32)

    p = {
        "patch_w": tn(ps, ps, 3, d),
        "patch_b": np.zeros((d,), np.float32),
        "cls_token": tn(1, d, std=1e-6),
        "register_tokens": tn(max(arch["num_register_tokens"], 1), d, std=1e-6),
        "pos_embed_cls": tn(1, d),
        "pos_embed_patch": tn(37 * 37, d),  # 518/14 grid, interpolated later
        "norm_scale": np.ones((d,), np.float32),
        "norm_bias": np.zeros((d,), np.float32),
    }
    for i in range(depth):
        p[f"b{i}.norm1_scale"] = np.ones((d,), np.float32)
        p[f"b{i}.norm1_bias"] = np.zeros((d,), np.float32)
        p[f"b{i}.qkv_w"] = tn(d, 3 * d)
        p[f"b{i}.qkv_b"] = np.zeros((3 * d,), np.float32)
        p[f"b{i}.proj_w"] = tn(d, d)
        p[f"b{i}.proj_b"] = np.zeros((d,), np.float32)
        p[f"b{i}.ls1"] = np.full((d,), arch["init_values"], np.float32)
        p[f"b{i}.norm2_scale"] = np.ones((d,), np.float32)
        p[f"b{i}.norm2_bias"] = np.zeros((d,), np.float32)
        p[f"b{i}.fc1_w"] = tn(d, mlp)
        p[f"b{i}.fc1_b"] = np.zeros((mlp,), np.float32)
        p[f"b{i}.fc2_w"] = tn(mlp, d)
        p[f"b{i}.fc2_b"] = np.zeros((d,), np.float32)
        p[f"b{i}.ls2"] = np.full((d,), arch["init_values"], np.float32)
    return p


def _convert_torch_state(state: dict, arch: dict) -> Dict[str, np.ndarray]:
    """Map the public DINOv2 checkpoint names to our parameter dict."""
    def g(name):
        return np.asarray(state[name].float().numpy() if hasattr(state[name], "float")
                          else state[name], dtype=np.float32)

    d = arch["embed_dim"]
    p = {
        # torch conv [D,3,ps,ps] -> HWIO [ps,ps,3,D]
        "patch_w": g("patch_embed.proj.weight").transpose(2, 3, 1, 0),
        "patch_b": g("patch_embed.proj.bias"),
        "cls_token": g("cls_token").reshape(1, d),
        "pos_embed_cls": g("pos_embed")[0, :1],
        "pos_embed_patch": g("pos_embed")[0, 1:],
        "norm_scale": g("norm.weight"),
        "norm_bias": g("norm.bias"),
    }
    if arch["num_register_tokens"]:
        p["register_tokens"] = g("register_tokens").reshape(-1, d)
    else:
        p["register_tokens"] = np.zeros((1, d), np.float32)
    for i in range(arch["depth"]):
        pre = f"blocks.{i}."
        p[f"b{i}.norm1_scale"] = g(pre + "norm1.weight")
        p[f"b{i}.norm1_bias"] = g(pre + "norm1.bias")
        p[f"b{i}.qkv_w"] = g(pre + "attn.qkv.weight").T
        p[f"b{i}.qkv_b"] = g(pre + "attn.qkv.bias")
        p[f"b{i}.proj_w"] = g(pre + "attn.proj.weight").T
        p[f"b{i}.proj_b"] = g(pre + "attn.proj.bias")
        p[f"b{i}.ls1"] = g(pre + "ls1.gamma")
        p[f"b{i}.norm2_scale"] = g(pre + "norm2.weight")
        p[f"b{i}.norm2_bias"] = g(pre + "norm2.bias")
        p[f"b{i}.fc1_w"] = g(pre + "mlp.fc1.weight").T
        p[f"b{i}.fc1_b"] = g(pre + "mlp.fc1.bias")
        p[f"b{i}.fc2_w"] = g(pre + "mlp.fc2.weight").T
        p[f"b{i}.fc2_b"] = g(pre + "mlp.fc2.bias")
        p[f"b{i}.ls2"] = g(pre + "ls2.gamma")
    return p


def _torch_bicubic_matrix(m: int, out: int, offset: float) -> np.ndarray:
    """[out, m] interpolation matrix matching torch F.interpolate bicubic
    (align_corners=False, antialias=False, A=-0.75) driven by an explicit
    scale_factor (out + offset) / m, as the reference's pos-embed resize
    passes (dinov2.py:685-698)."""
    A = -0.75

    def k(x):
        x = abs(x)
        if x <= 1.0:
            return ((A + 2.0) * x - (A + 3.0)) * x * x + 1.0
        if x < 2.0:
            return (((x - 5.0) * x + 8.0) * x - 4.0) * A
        return 0.0

    scale = float(out + offset) / m
    W = np.zeros((out, m), np.float64)
    for j in range(out):
        x = (j + 0.5) / scale - 0.5
        x0 = math.floor(x)
        t = x - x0
        for tap, dx in enumerate(range(-1, 3)):
            src = min(max(x0 + dx, 0), m - 1)
            W[j, src] += k(dx - t)
    return W.astype(np.float32)


class DinoV2:
    """Frozen DINOv2 feature extractor with a fixed input size."""

    def __init__(self, backbone: str = "dinov2_vits14_reg"):
        self.arch = ARCHS[backbone]
        self.backbone = backbone
        self.patch_size = self.arch["patch_size"]
        self.embed_dim = self.arch["embed_dim"]
        self.num_heads = self.arch["num_heads"]
        self.pretrained = False
        path = _find_weights(backbone)
        if path is not None:
            import torch
            logger.info("Loading DINOv2 weights from %s", path)
            state = torch.load(path, map_location="cpu", weights_only=True)
            params = _convert_torch_state(state, self.arch)
            self.pretrained = True
        else:
            logger.warning(
                "DINOv2 pretrained weights for %s not found (offline); using "
                "seeded random init. Set WG_DINOV2_WEIGHTS to the checkpoint "
                "path for reference-parity uncertainty.", backbone)
            params = _random_params(self.arch)
        self.params = {k: jnp.asarray(v) for k, v in params.items()}

    def _interp_pos_embed(self, grid_h: int, grid_w: int) -> jnp.ndarray:
        """Torch-exact bicubic pos-embed interpolation (reference
        dinov2.py:670-706): F.interpolate(mode="bicubic", antialias=False,
        align_corners=False) semantics — cubic kernel A=-0.75, border
        clamping — including the historical +0.1 scale-factor kludge
        (interpolate_offset, dinov2.py:685-690) and the same-grid shortcut
        (dinov2.py:674-675)."""
        pe = self.params["pos_embed_patch"]
        m = int(math.sqrt(pe.shape[0]))
        if (grid_h, grid_w) == (m, m):
            return pe
        pe = pe.reshape(m, m, -1)
        wy = jnp.asarray(_torch_bicubic_matrix(m, grid_h, 0.1))
        wx = jnp.asarray(_torch_bicubic_matrix(m, grid_w, 0.1))
        out = jnp.einsum("hm,mnd,wn->hwd", wy, pe, wx, precision=_HIGH)
        return out.reshape(grid_h * grid_w, -1)

    def features(self, image: jnp.ndarray, layer: Optional[int] = None) -> jnp.ndarray:
        """image [H,W,3] normalized; H,W multiples of patch_size. Returns
        patch features [H/ps, W/ps, D] from `layer` (default: num_heads-1,
        mirroring the reference's uncertainty hook, method.py:260) with the
        final LayerNorm applied (get_intermediate_layers norm=True)."""
        arch = self.arch
        p = self.params
        ps = self.patch_size
        h, w = image.shape[0] // ps, image.shape[1] // ps
        layer = self.num_heads - 1 if layer is None else layer

        x = jax.lax.conv_general_dilated(
            image[None], p["patch_w"], (ps, ps), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=_HIGH)[0] + p["patch_b"]
        x = x.reshape(h * w, -1)
        pos = self._interp_pos_embed(h, w)
        cls_tok = p["cls_token"] + p["pos_embed_cls"]
        x = x + pos
        tokens = [cls_tok]
        if arch["num_register_tokens"]:
            tokens.append(p["register_tokens"])
        tokens.append(x)
        x = jnp.concatenate(tokens, axis=0)

        for i in range(arch["depth"]):
            x = self._block(x, i)
            if i == layer:
                break

        x = self._layernorm(x, p["norm_scale"], p["norm_bias"])
        n_special = 1 + arch["num_register_tokens"]
        return x[n_special:].reshape(h, w, -1)

    @staticmethod
    def _layernorm(x, scale, bias, eps=1e-6):
        mu = x.mean(-1, keepdims=True)
        var = ((x - mu) ** 2).mean(-1, keepdims=True)
        return (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias

    def _block(self, x, i):
        p = self.params
        nh = self.num_heads
        d = self.embed_dim
        hd = d // nh
        t = x.shape[0]

        h = self._layernorm(x, p[f"b{i}.norm1_scale"], p[f"b{i}.norm1_bias"])
        qkv = jnp.dot(h, p[f"b{i}.qkv_w"], precision=_HIGH) + p[f"b{i}.qkv_b"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(t, nh, hd).transpose(1, 0, 2)
        k = k.reshape(t, nh, hd).transpose(1, 0, 2)
        v = v.reshape(t, nh, hd).transpose(1, 0, 2)
        attn = jnp.einsum("hqd,hkd->hqk", q, k, precision=_HIGH) / math.sqrt(hd)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("hqk,hkd->hqd", attn, v, precision=_HIGH)
        out = out.transpose(1, 0, 2).reshape(t, d)
        out = jnp.dot(out, p[f"b{i}.proj_w"], precision=_HIGH) + p[f"b{i}.proj_b"]
        x = x + p[f"b{i}.ls1"] * out

        h = self._layernorm(x, p[f"b{i}.norm2_scale"], p[f"b{i}.norm2_bias"])
        h = jnp.dot(h, p[f"b{i}.fc1_w"], precision=_HIGH) + p[f"b{i}.fc1_b"]
        h = jax.nn.gelu(h, approximate=False)
        h = jnp.dot(h, p[f"b{i}.fc2_w"], precision=_HIGH) + p[f"b{i}.fc2_b"]
        x = x + p[f"b{i}.ls2"] * h
        return x
