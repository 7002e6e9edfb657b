"""Per-Gaussian projective preprocess: cov3D, EWA cov2D, conic, radii, tiles.

The differentiable (pure-JAX) analogue of the reference CUDA preprocess kernel
(diff-gaussian-rasterization/cuda_rasterizer/forward.cu:129-268), including the
mip-splatting screen-space dilation and opacity compensation coefficient
(forward.cu:74-124). Fully vectorized over the Gaussian axis; every op is
elementwise or a tiny fixed matmul, so XLA fuses the whole thing into a couple
of VPU loops.
"""
from typing import NamedTuple

import jax.numpy as jnp

from ..cameras import CameraParams


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (w,x,y,z) [..., 4] -> rotation matrix [..., 3, 3].

    Matches reference forward.cu:144-149 / method.py:619-640 (build_rotation);
    the CUDA forward does NOT normalize (forward.cu:138), rotations are
    normalized by the caller's activation (method.py:927,1061).
    """
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)], axis=-1)
    row1 = jnp.stack([2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)], axis=-1)
    row2 = jnp.stack([2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def compute_cov3d(scales: jnp.ndarray, rotations: jnp.ndarray,
                  scale_modifier: float = 1.0) -> jnp.ndarray:
    """World-space 3D covariance, packed symmetric [..., 6] = (xx,xy,xz,yy,yz,zz).

    Sigma = R S S^T R^T (reference forward.cu:129-163; note the glm code builds
    M = S*R in column-major then Sigma = M^T M which equals R S^2 R^T).
    """
    R = quat_to_rotmat(rotations)
    s2 = jnp.square(scales * scale_modifier)
    # Sigma_ij = sum_k R_ik s_k^2 R_jk — expanded elementwise so it runs on
    # the VPU in full f32 (a [...,3,3] matmul would hit the MXU's bf16 path).
    def sig(i, j):
        return (R[..., i, 0] * s2[..., 0] * R[..., j, 0]
                + R[..., i, 1] * s2[..., 1] * R[..., j, 1]
                + R[..., i, 2] * s2[..., 2] * R[..., j, 2])
    return jnp.stack([sig(0, 0), sig(0, 1), sig(0, 2),
                      sig(1, 1), sig(1, 2), sig(2, 2)], axis=-1)


def compute_cov2d(means3d: jnp.ndarray, cov3d: jnp.ndarray, camera: CameraParams,
                  kernel_size: float):
    """EWA screen-space covariance with mip-splatting dilation.

    Returns (cov2d [...,3] = (a, b, c) with +kernel_size on the diagonal,
    coef [...]) mirroring computeCov2D (forward.cu:74-124): coef =
    sqrt(det0/(det1+1e-6)+1e-6), zeroed when either det <= 1e-6.
    """
    fx, fy = camera.intrinsics[0], camera.intrinsics[1]
    tan_fovx, tan_fovy = camera.tan_fov[0], camera.tan_fov[1]
    W = camera.viewmatrix[:3, :3]  # world->camera rotation

    # elementwise (VPU, full f32) rather than a tiny MXU matmul
    t = (means3d[..., None, :] * W).sum(-1) + camera.viewmatrix[:3, 3]
    tz = t[..., 2]
    limx = 1.3 * tan_fovx
    limy = 1.3 * tan_fovy
    txtz = jnp.clip(t[..., 0] / tz, -limx, limx) * tz
    tytz = jnp.clip(t[..., 1] / tz, -limy, limy) * tz

    # J = d(img)/d(cam): [[fx/z, 0, -fx x/z^2], [0, fy/z, -fy y/z^2]]
    inv_z = 1.0 / tz
    inv_z2 = inv_z * inv_z
    j00 = fx * inv_z
    j02 = -fx * txtz * inv_z2
    j11 = fy * inv_z
    j12 = -fy * tytz * inv_z2

    # T = J @ W (2x3); cov2d = T @ Vrk @ T^T
    t0 = j00[..., None] * W[0] + j02[..., None] * W[2]   # [...,3]
    t1 = j11[..., None] * W[1] + j12[..., None] * W[2]   # [...,3]

    cxx, cxy, cxz = cov3d[..., 0], cov3d[..., 1], cov3d[..., 2]
    cyy, cyz, czz = cov3d[..., 3], cov3d[..., 4], cov3d[..., 5]

    def vrk_mul(v):  # Vrk @ v for packed symmetric Vrk
        return jnp.stack([
            cxx * v[..., 0] + cxy * v[..., 1] + cxz * v[..., 2],
            cxy * v[..., 0] + cyy * v[..., 1] + cyz * v[..., 2],
            cxz * v[..., 0] + cyz * v[..., 1] + czz * v[..., 2],
        ], axis=-1)

    vt0 = vrk_mul(t0)
    vt1 = vrk_mul(t1)
    a = jnp.sum(t0 * vt0, axis=-1)
    b = jnp.sum(t0 * vt1, axis=-1)
    c = jnp.sum(t1 * vt1, axis=-1)

    det0 = jnp.maximum(1e-6, a * c - b * b)
    det1 = jnp.maximum(1e-6, (a + kernel_size) * (c + kernel_size) - b * b)
    coef = jnp.sqrt(det0 / (det1 + 1e-6) + 1e-6)
    raw_det0 = a * c - b * b
    raw_det1 = (a + kernel_size) * (c + kernel_size) - b * b
    coef = jnp.where((raw_det0 <= 1e-6) | (raw_det1 <= 1e-6), 0.0, coef)

    cov2d = jnp.stack([a + kernel_size, b, c + kernel_size], axis=-1)
    return cov2d, coef


def project_points(means3d: jnp.ndarray, camera: CameraParams):
    """Project world points. Returns (mean2d [...,2] pixel coords, depth [...]).

    Mirrors forward.cu:208-212 + ndc2Pix (auxiliary.h:41-44); note the
    reference divides by (w + 1e-7) and image size enters through projmatrix,
    so we keep the homogeneous form for exact parity. Pixel-size recovery uses
    mean2d = ((ndc+1)*S - 1)/2 where S is baked into intrinsics here.
    """
    ones = jnp.ones_like(means3d[..., :1])
    p4 = jnp.concatenate([means3d, ones], axis=-1)
    # elementwise (VPU, full f32) rather than tiny MXU matmuls
    p_hom = (p4[..., None, :] * camera.projmatrix).sum(-1)
    p_w = 1.0 / (p_hom[..., 3] + 1e-7)
    ndc_xy = p_hom[..., :2] * p_w[..., None]
    depth = (p4 * camera.viewmatrix[2]).sum(-1)
    return ndc_xy, depth


def ndc_to_pixel(ndc_xy: jnp.ndarray, width: int, height: int) -> jnp.ndarray:
    """auxiliary.h:41-44."""
    size = jnp.asarray([width, height], dtype=ndc_xy.dtype)
    return ((ndc_xy + 1.0) * size - 1.0) * 0.5


class PreprocessOutput(NamedTuple):
    mean2d: jnp.ndarray        # [N,2] pixel coordinates
    depth: jnp.ndarray         # [N] view-space z
    conic: jnp.ndarray         # [N,3] inverse cov2d (a,b,c)
    opacity: jnp.ndarray       # [N] opacity * mip-splat coef (conic_opacity.w)
    radius: jnp.ndarray        # [N] int32 screen-space radius (0 = culled)
    rect_min: jnp.ndarray      # [N,2] int32 tile rect (inclusive start)
    rect_max: jnp.ndarray      # [N,2] int32 tile rect (exclusive end)
    tiles_touched: jnp.ndarray  # [N] int32
    valid: jnp.ndarray         # [N] bool


def preprocess(means3d: jnp.ndarray,
               cov3d: jnp.ndarray,
               opacities: jnp.ndarray,
               camera: CameraParams,
               width: int, height: int,
               kernel_size: float,
               tile_size: int = 16,
               alive: jnp.ndarray | None = None) -> PreprocessOutput:
    """Full per-Gaussian preprocess (forward.cu:166-268), vectorized.

    `opacities` is [N] post-activation. `alive` optionally masks dead slots of
    the fixed-capacity store (they get radius=0 / tiles_touched=0, the same
    code path the reference uses for frustum-culled points).
    """
    ndc_xy, depth = project_points(means3d, camera)
    mean2d = ndc_to_pixel(ndc_xy, width, height)

    cov2d, coef = compute_cov2d(means3d, cov3d, camera, kernel_size)
    a, b, c = cov2d[..., 0], cov2d[..., 1], cov2d[..., 2]
    det = a * c - b * b
    det_valid = det != 0.0
    det_inv = jnp.where(det_valid, 1.0 / jnp.where(det_valid, det, 1.0), 0.0)
    conic = jnp.stack([c * det_inv, -b * det_inv, a * det_inv], axis=-1)

    mid = 0.5 * (a + c)
    lam = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius_f = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lam, 0.0)))

    grid_x = (width + tile_size - 1) // tile_size
    grid_y = (height + tile_size - 1) // tile_size
    # getRect (auxiliary.h:46-56): trunc-toward-zero casts, clamp to grid.
    rmin_x = jnp.clip(((mean2d[..., 0] - radius_f) / tile_size).astype(jnp.int32), 0, grid_x)
    rmin_y = jnp.clip(((mean2d[..., 1] - radius_f) / tile_size).astype(jnp.int32), 0, grid_y)
    rmax_x = jnp.clip(((mean2d[..., 0] + radius_f + tile_size - 1) / tile_size).astype(jnp.int32), 0, grid_x)
    rmax_y = jnp.clip(((mean2d[..., 1] + radius_f + tile_size - 1) / tile_size).astype(jnp.int32), 0, grid_y)
    tiles = (rmax_x - rmin_x) * (rmax_y - rmin_y)

    valid = (depth > 0.2) & det_valid & (tiles > 0)
    if alive is not None:
        valid = valid & alive

    radius = jnp.where(valid, radius_f, 0.0).astype(jnp.int32)
    tiles = jnp.where(valid, tiles, 0)
    return PreprocessOutput(
        mean2d=mean2d,
        depth=depth,
        conic=conic,
        opacity=opacities * coef,
        radius=radius,
        rect_min=jnp.stack([rmin_x, rmin_y], axis=-1),
        rect_max=jnp.stack([rmax_x, rmax_y], axis=-1),
        tiles_touched=tiles,
        valid=valid,
    )


def apply_3d_filter(raw_scales: jnp.ndarray, raw_opacities: jnp.ndarray,
                    filter_3d: jnp.ndarray):
    """Fuse the mip-splatting 3D filter into scales/opacities.

    Mirrors GaussianModel.get_gaussians (reference method.py:1060-1086):
      scales' = sqrt(scales^2 + filter^2)
      opacity' = opacity * sqrt(prod(scales^2) / prod(scales^2 + filter^2))
    `raw_scales` are post-exp, `raw_opacities` post-sigmoid, filter_3d [N,1].
    """
    s2 = jnp.square(raw_scales)
    f2 = jnp.square(filter_3d)
    s2f = s2 + f2
    scales = jnp.sqrt(s2f)
    det1 = jnp.prod(s2, axis=-1)
    det2 = jnp.prod(s2f, axis=-1)
    # floor guards dead/padded slots (scales == filter == 0) against 0/0
    coef = jnp.sqrt(det1 / jnp.maximum(det2, 1e-30))
    return scales, raw_opacities * coef[..., None]
