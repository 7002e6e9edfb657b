"""Camera matrix math (host numpy + device JAX).

Mirrors the reference's per-step matrix construction (wildgaussians/method.py:
587-616, 1502-1525) but as jittable JAX functions so the whole train step stays
on device: the reference builds these with per-step host numpy, a host<->device
boundary we remove (SURVEY.md section 7.1 item 4).

Conventions (identical to reference / OpenCV):
  - poses are camera-to-world [3,4], x right, y down, z forward
  - view matrix is world-to-camera 4x4
  - pixel centers at integer coordinates; mean2d = f*(xy/z) + c - 0.5 after the
    NDC round-trip (ndc2Pix at auxiliary.h:41-44)
"""
import math
from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

from .types import Cameras


def focal2fov(focal: float, pixels: float) -> float:
    """reference method.py:587-588."""
    return 2 * math.atan(pixels / (2 * focal))


class CameraParams(NamedTuple):
    """Device-side camera: a small pytree of f32 arrays.

    Static image width/height travel separately (they determine shapes).
    """
    viewmatrix: jnp.ndarray      # [4,4] world-to-camera
    projmatrix: jnp.ndarray      # [4,4] full projection = P @ view
    campos: jnp.ndarray          # [3] camera center in world
    intrinsics: jnp.ndarray      # [4] fx, fy, cx, cy
    tan_fov: jnp.ndarray         # [2] tan(fovx/2), tan(fovy/2)


def get_world2view(pose: np.ndarray) -> np.ndarray:
    """c2w [3,4] -> w2c [4,4]. Mirrors method.py:1502-1516 (inv of the 4x4 c2w)."""
    pose4 = np.concatenate([pose, np.array([[0, 0, 0, 1]], dtype=pose.dtype)], axis=0)
    return np.linalg.inv(pose4).astype(np.float32)


def get_projection_matrix_opencv(w, h, fx, fy, cx, cy, znear=0.01, zfar=100.0) -> np.ndarray:
    """OpenCV-intrinsics projection (reference method.py:605-616)."""
    P = np.zeros((4, 4), dtype=np.float32)
    P[0, 0] = 2.0 * fx / w
    P[1, 1] = 2.0 * fy / h
    P[0, 2] = (2.0 * cx - w) / w
    P[1, 2] = (2.0 * cy - h) / h
    P[3, 2] = 1.0
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return P


def make_camera_params(camera: Cameras) -> Tuple[CameraParams, int, int]:
    """Build device camera params for a single camera. Returns (params, W, H)."""
    camera = camera.item()
    assert camera.image_sizes is not None
    width, height = int(camera.image_sizes[0]), int(camera.image_sizes[1])
    fx, fy, cx, cy = [float(x) for x in camera.intrinsics]
    view = get_world2view(np.asarray(camera.poses, dtype=np.float64).astype(np.float32))
    proj = get_projection_matrix_opencv(width, height, fx, fy, cx, cy)
    full = (proj @ view).astype(np.float32)
    c2w4 = np.linalg.inv(view)
    campos = c2w4[:3, 3]
    tanfovx = math.tan(focal2fov(fx, width) * 0.5)
    tanfovy = math.tan(focal2fov(fy, height) * 0.5)
    params = CameraParams(
        viewmatrix=jnp.asarray(view),
        projmatrix=jnp.asarray(full),
        campos=jnp.asarray(campos),
        intrinsics=jnp.asarray([fx, fy, cx, cy], dtype=jnp.float32),
        tan_fov=jnp.asarray([tanfovx, tanfovy], dtype=jnp.float32),
    )
    return params, width, height


def make_camera_params_jax(pose: jnp.ndarray, intrinsics: jnp.ndarray,
                           width: int, height: int,
                           znear: float = 0.01, zfar: float = 100.0) -> CameraParams:
    """Fully-traced variant: camera matrices computed on device under jit.

    Used by the jitted train step so per-step camera selection is a gather,
    not a host round-trip.
    """
    pose4 = jnp.concatenate([pose, jnp.array([[0, 0, 0, 1]], dtype=pose.dtype)], axis=0)
    view = jnp.linalg.inv(pose4).astype(jnp.float32)
    fx, fy, cx, cy = intrinsics[0], intrinsics[1], intrinsics[2], intrinsics[3]
    w, h = float(width), float(height)
    P = jnp.zeros((4, 4), dtype=jnp.float32)
    P = P.at[0, 0].set(2.0 * fx / w)
    P = P.at[1, 1].set(2.0 * fy / h)
    P = P.at[0, 2].set((2.0 * cx - w) / w)
    P = P.at[1, 2].set((2.0 * cy - h) / h)
    P = P.at[3, 2].set(1.0)
    P = P.at[2, 2].set(zfar / (zfar - znear))
    P = P.at[2, 3].set(-(zfar * znear) / (zfar - znear))
    full = P @ view
    campos = pose[:3, 3].astype(jnp.float32)
    tanfovx = w / (2.0 * fx)
    tanfovy = h / (2.0 * fy)
    return CameraParams(
        viewmatrix=view,
        projmatrix=full,
        campos=campos,
        intrinsics=jnp.stack([fx, fy, cx, cy]).astype(jnp.float32),
        tan_fov=jnp.stack([tanfovx, tanfovy]).astype(jnp.float32),
    )


def camera_project(cameras: Cameras, xyz: np.ndarray) -> np.ndarray:
    """Project world points to image coords; NaN when behind camera.

    Host numpy mirror of reference method.py:86-110 (used by sky-point
    generation). `cameras` is a single camera (unbatched).
    """
    eps = np.finfo(xyz.dtype).eps
    assert xyz.shape[-1] == 3
    origins = cameras.poses[..., :3, 3]
    rotation = cameras.poses[..., :3, :3]
    uvw = xyz - origins
    # note: reference does (rotation * uvw[..., :, None]).sum(-2), i.e. R^T @ v
    uvw = (rotation * uvw[..., :, None]).sum(-2)
    uv = np.where(uvw[..., 2:] > eps, uvw[..., :2] / uvw[..., 2:], np.zeros_like(uvw[..., :2]))
    x, y = np.moveaxis(uv, -1, 0)
    fx, fy, cx, cy = np.moveaxis(np.asarray(cameras.intrinsics), -1, 0)
    x = fx * x + cx
    y = fy * y + cy
    return np.stack((x, y), -1)


def get_cameras_extent(cameras: Cameras) -> float:
    """Scene radius from camera centers (reference method.py:794-805)."""
    c2w = cameras.poses
    cam_centers = np.hstack(list(c2w[:, :3, 3:4]))
    avg_cam_center = np.mean(cam_centers, axis=1, keepdims=True)
    dist = np.linalg.norm(cam_centers - avg_cam_center, axis=0, keepdims=True)
    diagonal = np.max(dist)
    return float(diagonal * 1.1)
