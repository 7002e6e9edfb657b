"""Trace the current default bench step (sort path) for a fresh breakdown."""
import os
import time

import numpy as np

os.environ.setdefault("BENCH_ITERS", "5")


def main():
    import jax
    import jax.numpy as jnp
    from wildgaussians_tpu.types import new_cameras
    from wildgaussians_tpu.cameras import make_camera_params
    from wildgaussians_tpu.ops.rasterize import rasterize_gaussians

    n = int(os.environ.get("BENCH_N_GAUSSIANS", 1_500_000))
    width, height = 1280, 720
    rng = np.random.default_rng(0)
    f = width / 1.4
    cam = new_cameras(
        poses=np.eye(4, dtype=np.float32)[:3][None],
        intrinsics=np.array([[f, f, width / 2, height / 2]], np.float32),
        camera_models=np.zeros((1,), np.int32),
        distortion_parameters=np.zeros((1, 6), np.float32),
        image_sizes=np.array([[width, height]], np.int32))
    params, w, h = make_camera_params(cam)
    z = rng.uniform(3.0, 30.0, n).astype(np.float32)
    xy_extent = z[:, None] * np.array([width / (2 * f), height / (2 * f)], np.float32)
    xyz = np.concatenate([
        rng.uniform(-1, 1, (n, 2)).astype(np.float32) * xy_extent,
        z[:, None]], -1)
    px_size = z / f
    scales = (px_size[:, None] * rng.uniform(0.8, 4.0, (n, 3))).astype(np.float32)
    q = rng.normal(size=(n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    opac = rng.uniform(0.4, 0.99, n).astype(np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    target = jnp.asarray(rng.uniform(0, 1, (h, w, 3)).astype(np.float32))
    args = tuple(map(jnp.asarray, (xyz, scales, q, opac, colors)))

    def loss_fn(xyz, scales, rots, opac, colors):
        out = rasterize_gaussians(xyz, scales, rots, opac, colors, params, w, h,
                                  kernel_size=0.1, backend="pallas", chunk=int(os.environ.get("BENCH_CHUNK", 256)),
                                  max_tiles_per_gaussian=int(os.environ.get("BENCH_DMAX", 10)), d_small=int(os.environ.get("BENCH_DSMALL", 4)),
                                  binning=os.environ.get("BENCH_BINNING", "sort"))
        return jnp.mean(jnp.abs(out.color - target)), (out.num_rendered, out.overflow)

    step = jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3, 4), has_aux=True))
    out = step(*args)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(10):
        out = step(*args)
    jax.block_until_ready(out)
    print(f"full fwd+bwd step : {(time.perf_counter() - t0) / 10 * 1e3:.1f} ms",
          flush=True)

    with jax.profiler.trace("/tmp/r2_trace"):
        for _ in range(3):
            out = step(*args)
        jax.block_until_ready(out)
    print("trace written to /tmp/r2_trace", flush=True)


if __name__ == "__main__":
    main()
