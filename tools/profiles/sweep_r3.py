"""Round-3 knob sweep: d_small / chunk / d_max wall-time on the real chip.

Usage: python tools/profiles/sweep_r3.py "DSMALL=3,4 CHUNK=128,256,512"
Each config builds the bench-scale step (1.5M gaussians, 1280x720) and
reports mean wall ms over ITERS steps after warmup.
"""
import itertools
import os
import sys
import time

import numpy as np


def make_inputs(n, width, height):
    import jax.numpy as jnp
    from wildgaussians_tpu.types import new_cameras
    from wildgaussians_tpu.cameras import make_camera_params

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
    xy_extent = z[:, None] * np.array([width / (2 * f), height / (2 * f)],
                                      np.float32)
    xyz = np.concatenate([
        rng.uniform(-1, 1, (n, 2)).astype(np.float32) * xy_extent,
        z[:, None]], -1)
    px_size = z / f
    scales = (px_size[:, None] * rng.uniform(0.8, 4.0, (n, 3))).astype(np.float32)
    q = rng.normal(size=(n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    opac = rng.uniform(0.4, 0.99, n).astype(np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    target = rng.uniform(0, 1, (h, w, 3)).astype(np.float32)
    args = tuple(map(jnp.asarray, (xyz, scales, q, opac, colors)))
    return args, jnp.asarray(target), params, w, h


def main():
    import jax
    import jax.numpy as jnp
    from wildgaussians_tpu.ops.rasterize import rasterize_gaussians

    n = int(os.environ.get("BENCH_N_GAUSSIANS", 1_500_000))
    iters = int(os.environ.get("ITERS", 10))
    args, target, params, w, h = make_inputs(n, 1280, 720)

    grid_spec = dict(x.split("=") for x in sys.argv[1].split())
    axes = {k: [int(v) for v in vs.split(",")] for k, vs in grid_spec.items()}
    names = list(axes)
    for combo in itertools.product(*(axes[k] for k in names)):
        cfg = dict(zip(names, combo))
        d_small = cfg.get("DSMALL", 4)
        chunk = cfg.get("CHUNK", 256)
        d_max = cfg.get("DMAX", 10)
        bigf = cfg.get("BIGF", 16) / 100.0

        def loss_fn(xyz, scales, rots, opac, colors):
            out = rasterize_gaussians(
                xyz, scales, rots, opac, colors, params, w, h,
                kernel_size=0.1, backend="pallas", chunk=chunk,
                max_tiles_per_gaussian=d_max, d_small=d_small,
                big_fraction=bigf, binning="sort")
            return (jnp.mean(jnp.abs(out.color - target)),
                    (out.num_rendered, out.overflow))

        step = jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3, 4),
                                          has_aux=True))
        try:
            out = step(*args)
            jax.block_until_ready(out)
            (_, (nr, ov)), _ = out
            t0 = time.perf_counter()
            for _ in range(iters):
                out = step(*args)
            jax.block_until_ready(out)
            ms = (time.perf_counter() - t0) / iters * 1e3
            print(f"{cfg} -> {ms:.1f} ms  num_rendered={int(nr)} "
                  f"overflow={int(ov)}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{cfg} -> FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
