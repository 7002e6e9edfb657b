"""Test helpers: synthetic scenes and a literal numpy port of the reference
CUDA compositing loop (forward.cu:273-395) used to validate the associative
reformulation in the JAX oracle."""
import numpy as np

import wildgaussians_tpu.cameras as wcameras
from wildgaussians_tpu.types import new_cameras


def make_camera(width=64, height=48, fov_deg=60.0, pose=None):
    f = width / (2 * np.tan(np.radians(fov_deg) / 2))
    intr = np.array([f, f, width / 2, height / 2], dtype=np.float32)
    if pose is None:
        pose = np.eye(4, dtype=np.float32)[:3]
        pose[2, 3] = 0.0  # camera at origin looking +z
    return new_cameras(
        poses=pose[None],
        intrinsics=intr[None],
        camera_models=np.zeros((1,), dtype=np.int32),
        distortion_parameters=np.zeros((1, 6), dtype=np.float32),
        image_sizes=np.array([[width, height]], dtype=np.int32),
        nears_fars=None,
    )


def make_scene(rng, n=500, spread=2.0, z_range=(2.0, 8.0)):
    """Random Gaussians in front of a camera at origin looking +z."""
    xyz = np.stack([
        rng.uniform(-spread, spread, n),
        rng.uniform(-spread * 0.75, spread * 0.75, n),
        rng.uniform(*z_range, n),
    ], axis=-1).astype(np.float32)
    scales = np.exp(rng.uniform(-4.5, -2.0, (n, 3))).astype(np.float32)
    q = rng.normal(size=(n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    opacities = rng.uniform(0.2, 0.95, n).astype(np.float32)
    colors = rng.uniform(0.0, 1.0, (n, 3)).astype(np.float32)
    return dict(xyz=xyz, scales=scales, rotations=q, opacities=opacities, colors=colors)


def numpy_sequential_rasterize(mean2d, depth, conic, opacity, colors, valid,
                               rect_min, rect_max, width, height, tile_size=16,
                               bg=None):
    """Literal per-pixel sequential loop from forward.cu:327-394."""
    order = np.argsort(np.where(valid, depth, np.inf), kind="stable")
    out = np.zeros((height, width, 3), np.float32)
    final_t = np.ones((height, width), np.float32)
    for py in range(height):
        ty = py // tile_size
        for px in range(width):
            tx = px // tile_size
            T = np.float32(1.0)
            C = np.zeros(3, np.float32)
            for i in order:
                if not valid[i]:
                    break
                if not (rect_min[i, 0] <= tx < rect_max[i, 0]
                        and rect_min[i, 1] <= ty < rect_max[i, 1]):
                    continue
                dx = mean2d[i, 0] - px
                dy = mean2d[i, 1] - py
                power = (-0.5 * (conic[i, 0] * dx * dx + conic[i, 2] * dy * dy)
                         - conic[i, 1] * dx * dy)
                if power > 0:
                    continue
                alpha = min(np.float32(0.99), opacity[i] * np.exp(power))
                if alpha < 1.0 / 255.0:
                    continue
                test_T = T * (1 - alpha)
                if test_T < 1e-4:
                    break
                C += colors[i] * alpha * T
                T = test_T
            out[py, px] = C + (T * bg if bg is not None else 0.0)
            final_t[py, px] = T
    return out, final_t


def preprocess_scene(scene, camera, kernel_size=0.1, tile_size=16):
    """Run the JAX preprocess on a synthetic scene; returns numpy outputs."""
    import jax.numpy as jnp
    from wildgaussians_tpu.ops.gaussians import compute_cov3d, preprocess

    params, width, height = wcameras.make_camera_params(camera)
    cov3d = compute_cov3d(jnp.asarray(scene["scales"]), jnp.asarray(scene["rotations"]))
    pre = preprocess(jnp.asarray(scene["xyz"]), cov3d, jnp.asarray(scene["opacities"]),
                     params, width, height, kernel_size, tile_size=tile_size)
    return pre, params, width, height
