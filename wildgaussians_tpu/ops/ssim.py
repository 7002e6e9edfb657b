"""Differentiable SSIM / MS-SSIM / DSSIM-go in JAX (NHWC, TPU-friendly).

Mirrors the reference's torch implementations exactly (method.py:644-673 ssim,
138-187 _ssim_parts/msssim, 677-716 dssim_go, 126-135 ssim_down): 11x11
Gaussian window (sigma 1.5), per-channel depthwise conv with ZERO padding 5
(torch F.conv2d semantics), C1=0.01^2, C2=0.03^2, C3=C2/2.

Layout note: images here are [H,W,C] (or [B,H,W,C]) — TPU-native channels-last
so the channel axis rides the 128-lane dimension; the reference uses CHW.
"""
import functools
import math

import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=8)
def _gaussian_window(window_size: int, sigma: float):
    # returns a host numpy constant (a cached jnp array would leak tracers)
    import numpy as np
    g = np.exp(-((np.arange(window_size) - window_size // 2) ** 2) / (2 * sigma ** 2))
    g = (g / g.sum()).astype(np.float32)
    return np.outer(g, g)


@functools.lru_cache(maxsize=8)
def _gaussian_1d(window_size: int, sigma: float):
    import numpy as np
    g = np.exp(-((np.arange(window_size) - window_size // 2) ** 2) / (2 * sigma ** 2))
    return (g / g.sum()).astype(np.float32)


def _depthwise_filter(img: jnp.ndarray, window_size: int = 11, sigma: float = 1.5):
    """Zero-padded depthwise 2D Gaussian filter on [B,H,W,C].

    The window is an outer product of a 1-D Gaussian, so two separable 1-D
    convolutions (2*W MACs/px) replace the reference's 2-D conv (W^2,
    method.py:148-157) with identical results up to fp association.
    """
    c = img.shape[-1]
    g = jnp.asarray(_gaussian_1d(window_size, sigma))
    kh = jnp.tile(g[:, None, None, None], (1, 1, 1, c))   # [W,1,1,C]
    kw = jnp.tile(g[None, :, None, None], (1, 1, 1, c))   # [1,W,1,C]
    pad = window_size // 2
    out = jax.lax.conv_general_dilated(
        img, kh, (1, 1), [(pad, pad), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST)
    return jax.lax.conv_general_dilated(
        out, kw, (1, 1), [(0, 0), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST)


def _ensure_batch(img):
    if img.ndim == 3:
        return img[None], True
    return img, False


def _ssim_parts(img1, img2, window_size=11):
    """(luminance, contrast, structure) maps; reference method.py:138-168."""
    mu1 = _depthwise_filter(img1, window_size)
    mu2 = _depthwise_filter(img2, window_size)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _depthwise_filter(img1 * img1, window_size) - mu1_sq
    sigma2_sq = _depthwise_filter(img2 * img2, window_size) - mu2_sq
    sigma12 = _depthwise_filter(img1 * img2, window_size) - mu1_mu2
    sigma1 = jnp.sqrt(jnp.maximum(sigma1_sq, 0))
    sigma2 = jnp.sqrt(jnp.maximum(sigma2_sq, 0))
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    C3 = C2 / 2
    luminance = (2 * mu1_mu2 + C1) / (mu1_sq + mu2_sq + C1)
    contrast = (2 * sigma1 * sigma2 + C2) / (sigma1_sq + sigma2_sq + C2)
    structure = (sigma12 + C3) / (sigma1 * sigma2 + C3)
    return luminance, contrast, structure


def ssim(img1, img2, window_size=11, size_average=True):
    """SSIM; [.,H,W,C] inputs. size_average=False -> per-pixel map [.,H,W]
    (channel-mean), matching reference method.py:644-673."""
    img1, squeeze = _ensure_batch(img1)
    img2, _ = _ensure_batch(img2)
    mu1 = _depthwise_filter(img1, window_size)
    mu2 = _depthwise_filter(img2, window_size)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _depthwise_filter(img1 * img1, window_size) - mu1_sq
    sigma2_sq = _depthwise_filter(img2 * img2, window_size) - mu2_sq
    sigma12 = _depthwise_filter(img1 * img2, window_size) - mu1_mu2
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    ssim_map = ((2 * mu1_mu2 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2))
    if size_average:
        return jnp.mean(ssim_map)
    out = jnp.mean(ssim_map, axis=-1)
    return out[0] if squeeze else out


def dssim_go(img1, img2, window_size=11, size_average=True):
    """NeRF-on-the-go DSSIM variant (reference method.py:677-716)."""
    img1, squeeze = _ensure_batch(img1)
    img2, _ = _ensure_batch(img2)
    lum, con, stru = _ssim_parts(img1, img2, window_size)
    dssim_map = (1 - lum) * (1 - con) * (1 - stru)
    if size_average:
        return jnp.mean(dssim_map)
    out = jnp.mean(dssim_map, axis=-1)
    return out[0] if squeeze else out


def _avg_pool2(img):
    """2x2 average pool, stride 2 (torch F.avg_pool2d), NHWC."""
    return jax.lax.reduce_window(
        img, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID") / 4.0


def _resize_bilinear(img, size):
    """torch F.interpolate(mode='bilinear', align_corners=False) analogue."""
    return jax.image.resize(img, (img.shape[0], size[0], size[1], img.shape[-1]),
                            method="bilinear")


def _resize_area(img, size):
    return jax.image.resize(img, (img.shape[0], size[0], size[1], img.shape[-1]),
                            method="linear", antialias=True)


def msssim(x, y, max_size=None, min_size=200):
    """Multi-scale SSIM map [B,H,W] (reference method.py:171-187): the full
    parts at base scale, then contrast*structure at each halved scale,
    upsampled back and multiplied."""
    x, squeeze = _ensure_batch(x)
    y, _ = _ensure_batch(y)
    raw_size = x.shape[1:3]
    if max_size is not None:
        scale_factor = min(1.0, max(max_size / x.shape[1], max_size / x.shape[2]))
        if scale_factor < 1.0:
            nh, nw = int(x.shape[1] * scale_factor), int(x.shape[2] * scale_factor)
            x = _resize_area(x, (nh, nw))
            y = _resize_area(y, (nh, nw))
    maps = list(_ssim_parts(x, y))
    orig = x.shape[1:3]
    while x.shape[1] > min_size and x.shape[2] > min_size:
        x = _avg_pool2(x)
        y = _avg_pool2(y)
        maps.extend(_resize_bilinear(m, orig) for m in _ssim_parts(x, y)[1:])
    out = jnp.prod(jnp.stack(maps, -1), axis=-1)
    if max_size is not None and out.shape[1:3] != tuple(raw_size):
        out = _resize_bilinear(out, raw_size)
    out = jnp.mean(out, axis=-1)
    return out[0] if squeeze else out


def ssim_down(x, y, max_size=None):
    """SSIM computed at reduced resolution then upsampled
    (reference method.py:126-135). Returns per-pixel map."""
    x, squeeze = _ensure_batch(x)
    y, _ = _ensure_batch(y)
    osize = x.shape[1:3]
    if max_size is not None:
        scale_factor = max(max_size / x.shape[1], max_size / x.shape[2])
        if scale_factor < 1.0:
            nh = int(x.shape[1] * scale_factor)
            nw = int(x.shape[2] * scale_factor)
            x = _resize_area(x, (nh, nw))
            y = _resize_area(y, (nh, nw))
    out = ssim(x, y, size_average=False)  # [B,h,w]
    if max_size is not None and out.shape[1:3] != tuple(osize):
        out = jax.image.resize(out, (out.shape[0], *osize), method="bilinear")
    return out[0] if squeeze else out


def psnr(mse_value):
    return 20 * math.log10(1.0) - 10 * jnp.log10(mse_value)
