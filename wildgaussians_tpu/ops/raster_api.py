"""Drop-in mirror of the reference rasterizer's object API.

The reference exposes `GaussianRasterizationSettings` + `GaussianRasterizer`
(diff_gaussian_rasterization/__init__.py:175-241); code written against that
surface can switch to this module with the torch tensors swapped for jax
arrays. Differences, all inherent to the JAX port:

- matrices: the reference stores TRANSPOSED (row-vector) view/proj matrices
  (torch `getWorld2View2().transpose(0,1)`); pass the same layout here — the
  adapter transposes back to this repo's column-vector CameraParams.
- means2D: in torch it is a dummy tensor whose `.grad` receives screen-space
  gradients; in JAX pass it as a zeros array and differentiate the call with
  respect to it (the renderer's mean2d_hook pattern).
- outputs match the reference ordering: (color [3,H,W], radii [N],
  accumulation [H,W]).

The functional `rasterize_gaussians` (ops/rasterize.py) remains the native
API; this adapter exists for surface parity.
"""
import math
from typing import NamedTuple, Optional

import jax.numpy as jnp

from ..cameras import CameraParams
from .rasterize import rasterize_gaussians, mark_visible
from .sh import eval_sh_switch


class GaussianRasterizationSettings(NamedTuple):
    """Field-for-field mirror of reference __init__.py:175-190."""
    image_height: int
    image_width: int
    tanfovx: float
    tanfovy: float
    kernel_size: float
    subpixel_offset: Optional[jnp.ndarray]   # only zeros/None supported
    bg: jnp.ndarray                          # [3]
    scale_modifier: float
    viewmatrix: jnp.ndarray                  # [4,4] TRANSPOSED w2c (torch layout)
    projmatrix: jnp.ndarray                  # [4,4] TRANSPOSED full proj
    sh_degree: int
    campos: jnp.ndarray                      # [3]
    prefiltered: bool
    debug: bool
    return_accumulation: bool = True


def _camera_from_settings(s: GaussianRasterizationSettings) -> CameraParams:
    w, h = int(s.image_width), int(s.image_height)
    fx = w / (2.0 * float(s.tanfovx))
    fy = h / (2.0 * float(s.tanfovy))
    return CameraParams(
        viewmatrix=jnp.asarray(s.viewmatrix, jnp.float32).T,
        projmatrix=jnp.asarray(s.projmatrix, jnp.float32).T,
        campos=jnp.asarray(s.campos, jnp.float32),
        intrinsics=jnp.asarray([fx, fy, w / 2.0, h / 2.0], jnp.float32),
        tan_fov=jnp.asarray([s.tanfovx, s.tanfovy], jnp.float32),
    )


class GaussianRasterizer:
    """Mirror of reference GaussianRasterizer (__init__.py:192-241)."""

    def __init__(self, raster_settings: GaussianRasterizationSettings):
        self.raster_settings = raster_settings
        if raster_settings.prefiltered:
            raise NotImplementedError("prefiltered=True is not supported "
                                      "(the reference kernels ignore it too)")
        sp = raster_settings.subpixel_offset
        if sp is not None and bool(jnp.any(jnp.asarray(sp) != 0)):
            raise NotImplementedError("nonzero subpixel_offset not supported")

    def markVisible(self, positions: jnp.ndarray) -> jnp.ndarray:
        """Frustum culling mask (reference __init__.py:197-206)."""
        return mark_visible(positions,
                            _camera_from_settings(self.raster_settings))

    def __call__(self, means3D, means2D, opacities, shs=None,
                 colors_precomp=None, scales=None, rotations=None,
                 cov3D_precomp=None, **raster_kwargs):
        """Reference forward (__init__.py:208-241): exactly one of
        shs/colors_precomp and exactly one of (scales, rotations)/
        cov3D_precomp. Returns (color [3,H,W], radii [N],
        accumulation [H,W]). `raster_kwargs` pass through to
        rasterize_gaussians (backend=..., max_tiles_per_gaussian=...)."""
        s = self.raster_settings
        if (shs is None) == (colors_precomp is None):
            raise ValueError("Please provide exactly one of either SHs or "
                             "precomputed colors!")
        has_sr = scales is not None or rotations is not None
        if has_sr == (cov3D_precomp is not None):
            raise ValueError("Please provide exactly one of either "
                             "scale/rotation pair or precomputed 3D "
                             "covariance!")

        camera = _camera_from_settings(s)
        n = means3D.shape[0]
        if colors_precomp is None:
            # CUDA-side SH path (forward.cu computeColorFromSH): view dirs
            # from campos, clamped at 0 after the +0.5 offset
            dirs = means3D - camera.campos[None]
            dirs = dirs / jnp.maximum(
                jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12)
            shs_t = jnp.asarray(shs, jnp.float32).transpose(0, 2, 1)  # [N,3,K]
            max_deg = int(math.isqrt(shs.shape[1])) - 1
            colors_precomp = jnp.maximum(
                eval_sh_switch(jnp.int32(s.sh_degree), max_deg, shs_t, dirs)
                + 0.5, 0.0)

        if scales is None:
            scales = jnp.ones((n, 3), jnp.float32)
            rotations = jnp.concatenate(
                [jnp.ones((n, 1), jnp.float32),
                 jnp.zeros((n, 3), jnp.float32)], axis=1)

        out = rasterize_gaussians(
            means3D, scales, rotations, opacities.reshape(n), colors_precomp,
            camera, int(s.image_width), int(s.image_height),
            kernel_size=float(s.kernel_size), bg=jnp.asarray(s.bg),
            scale_modifier=float(s.scale_modifier),
            cov3d=(jnp.asarray(cov3D_precomp, jnp.float32)
                   if cov3D_precomp is not None else None),
            mean2d_hook=means2D, **raster_kwargs)
        color = jnp.transpose(out.color, (2, 0, 1))         # [3,H,W]
        accumulation = 1.0 - out.final_T
        return color, out.radii, accumulation

    # torch nn.Module-style alias
    forward = __call__
