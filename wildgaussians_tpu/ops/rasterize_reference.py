"""Slow, obviously-correct pure-JAX rasterizer (the correctness oracle).

Replicates the reference CUDA tile renderer's compositing semantics exactly
(forward.cu:273-395): front-to-back alpha blending in depth order with the
power>0 skip, the 0.99 alpha cap, the 1/255 alpha floor, the T<1e-4 sticky
early stop, and the per-tile rect membership test (a Gaussian only touches
pixels whose tile lies in its projected rect, auxiliary.h:46-56).

Instead of a per-pixel sequential loop, compositing is expressed in its
associative form: within each depth-ordered chunk of Gaussians we take
log(1-alpha), prefix-sum it along the chunk axis, and recover per-Gaussian
transmittances as exp() of the exclusive prefix — mathematically identical to
the sequential product, and the same formulation the tiled/Pallas kernels use.
Gradients come from JAX AD. O(N * H * W); use only for tests/small scenes.
"""
from functools import partial

import jax
import jax.numpy as jnp

ALPHA_MAX = 0.99
ALPHA_MIN = 1.0 / 255.0
T_EPS = 1e-4


def _blend_chunk(carry, chunk, pix_x, pix_y, tile_x, tile_y):
    """One depth-ordered chunk of Gaussians composited over all pixels.

    carry: (C [H,W,3], T [H,W], done [H,W])
    chunk: dict of [K]-leading arrays.
    """
    C, T, done = carry
    mean2d = chunk["mean2d"]      # [K,2]
    conic = chunk["conic"]        # [K,3]
    opacity = chunk["opacity"]    # [K]
    colors = chunk["colors"]      # [K,3]
    valid = chunk["valid"]        # [K]
    rect_min = chunk["rect_min"]  # [K,2]
    rect_max = chunk["rect_max"]  # [K,2]

    # [K,H,W] pixel offsets from each Gaussian center
    dx = mean2d[:, 0, None, None] - pix_x[None]
    dy = mean2d[:, 1, None, None] - pix_y[None]
    power = (-0.5 * (conic[:, 0, None, None] * dx * dx
                     + conic[:, 2, None, None] * dy * dy)
             - conic[:, 1, None, None] * dx * dy)
    alpha = jnp.minimum(ALPHA_MAX, opacity[:, None, None] * jnp.exp(power))

    in_rect = ((tile_x[None] >= rect_min[:, 0, None, None])
               & (tile_x[None] < rect_max[:, 0, None, None])
               & (tile_y[None] >= rect_min[:, 1, None, None])
               & (tile_y[None] < rect_max[:, 1, None, None]))
    use = (valid[:, None, None] & in_rect
           & (power <= 0.0) & (alpha >= ALPHA_MIN))

    log1ma = jnp.where(use, jnp.log1p(-jnp.where(use, alpha, 0.0)), 0.0)
    S = jnp.cumsum(log1ma, axis=0)              # inclusive prefix
    T_at = T[None] * jnp.exp(S - log1ma)        # exclusive prefix transmittance
    # sticky early stop: test_T = T * exp(S) < T_EPS (monotone within chunk)
    contrib = use & ~done[None] & (T[None] * jnp.exp(S) >= T_EPS)

    w = jnp.where(contrib, alpha * T_at, 0.0)   # [K,H,W]
    C = C + jnp.einsum("khw,kc->hwc", w, colors)
    T_new = T * jnp.exp(jnp.sum(jnp.where(contrib, log1ma, 0.0), axis=0))
    done_new = done | (T[None] * jnp.exp(S) < T_EPS).any(axis=0)
    return (C, T_new, done_new), None


@partial(jax.jit, static_argnames=("width", "height", "tile_size", "chunk"))
def rasterize_reference(mean2d, depth, conic, opacity, colors, valid,
                        rect_min, rect_max, *, width: int, height: int,
                        bg=None, tile_size: int = 16, chunk: int = 64):
    """Oracle rasterization. Returns (color [H,W,3], final_T [H,W]).

    All inputs are the PreprocessOutput fields plus per-Gaussian colors [N,3].
    """
    n = mean2d.shape[0]
    pad = (-n) % chunk
    if pad:
        def padn(x, fill=0):
            return jnp.concatenate([x, jnp.full((pad, *x.shape[1:]), fill, x.dtype)], axis=0)
        mean2d, conic, colors = padn(mean2d), padn(conic), padn(colors)
        opacity, depth = padn(opacity), padn(depth, 1e10)
        valid = padn(valid, False)
        rect_min, rect_max = padn(rect_min), padn(rect_max)
        n += pad

    order = jnp.argsort(jnp.where(valid, depth, jnp.inf))
    chunks = {
        "mean2d": mean2d[order].reshape(-1, chunk, 2),
        "conic": conic[order].reshape(-1, chunk, 3),
        "opacity": opacity[order].reshape(-1, chunk),
        "colors": colors[order].reshape(-1, chunk, 3),
        "valid": valid[order].reshape(-1, chunk),
        "rect_min": rect_min[order].reshape(-1, chunk, 2),
        "rect_max": rect_max[order].reshape(-1, chunk, 2),
    }

    ys = jnp.arange(height, dtype=jnp.float32)
    xs = jnp.arange(width, dtype=jnp.float32)
    pix_y, pix_x = jnp.meshgrid(ys, xs, indexing="ij")
    tile_x = (pix_x / tile_size).astype(jnp.int32)
    tile_y = (pix_y / tile_size).astype(jnp.int32)

    init = (
        jnp.zeros((height, width, 3), jnp.float32),
        jnp.ones((height, width), jnp.float32),
        jnp.zeros((height, width), bool),
    )
    body = partial(_blend_chunk, pix_x=pix_x, pix_y=pix_y, tile_x=tile_x, tile_y=tile_y)
    (C, T, _done), _ = jax.lax.scan(body, init, chunks)
    if bg is not None:
        C = C + T[..., None] * bg[None, None, :]
    return C, T
