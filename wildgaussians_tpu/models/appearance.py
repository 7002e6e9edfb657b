"""Per-Gaussian appearance modulation MLP (WildGaussians' EmbeddingModel).

Mirrors reference method.py:874-900: MLP(app-emb 32 + base color 3 +
per-Gaussian Fourier emb 24 -> 128 -> 128 -> 6) * 0.01 producing an affine
(offset, mul); offset scaled 1/C0 touches the SH DC coefficients only, mul is
tiled over all SH coefficients. Pure-JAX params dict (lives inside the main
parameter tree under "appearance_mlp" so Adam/LR grouping matches the
reference's param groups).

This is an N x features matmul over every Gaussian — exactly the MXU's shape;
inputs stay f32 with f32 accumulation.
"""
import math
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.sh import C0

_HIGH = jax.lax.Precision.HIGHEST


def init_mlp(rng: np.random.Generator, config) -> Dict[str, jnp.ndarray]:
    """torch.nn.Linear default init (kaiming-uniform weights, uniform bias)."""
    feat_in = 3
    if config.appearance_model_sh:
        feat_in = ((config.sh_degree + 1) ** 2) * 3
    dims = [config.appearance_embedding_dim + feat_in
            + 6 * config.appearance_n_fourier_freqs, 128, 128, feat_in * 2]
    params = {}
    for i in range(3):
        fan_in = dims[i]
        bound_w = math.sqrt(1.0 / fan_in) * math.sqrt(3.0)  # kaiming_uniform(a=sqrt(5))
        bound_b = 1.0 / math.sqrt(fan_in)
        params[f"w{i}"] = jnp.asarray(
            rng.uniform(-bound_w, bound_w, (dims[i], dims[i + 1])).astype(np.float32))
        params[f"b{i}"] = jnp.asarray(
            rng.uniform(-bound_b, bound_b, (dims[i + 1],)).astype(np.float32))
    return params


def apply_mlp(params: Dict[str, jnp.ndarray], gembedding: jnp.ndarray,
              aembedding: jnp.ndarray, color: jnp.ndarray) -> jnp.ndarray:
    """color: [N, K*3] SH features; returns toned features [N, K*3]."""
    input_color = color
    base = color[..., :3]
    x = jnp.concatenate([base, gembedding, aembedding], axis=-1)
    x = jnp.dot(x, params["w0"], precision=_HIGH) + params["b0"]
    x = jax.nn.relu(x)
    x = jnp.dot(x, params["w1"], precision=_HIGH) + params["b1"]
    x = jax.nn.relu(x)
    x = jnp.dot(x, params["w2"], precision=_HIGH) + params["b2"]
    x = x * 0.01
    half = x.shape[-1] // 2
    offset, mul = x[..., :half], x[..., half:]
    offset = jnp.concatenate(
        [offset / C0, jnp.zeros_like(input_color[..., half:])], axis=-1)
    mul = jnp.tile(mul, (1, input_color.shape[-1] // half))
    return input_color * mul + offset
