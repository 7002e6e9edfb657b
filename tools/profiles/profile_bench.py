"""One-off: capture a jax.profiler trace of the bench step on the real chip.

Writes /tmp/bench_trace; also prints a coarse per-phase timing breakdown by
running the pipeline pieces separately (sort vs kernels vs preprocess).
"""
import os
import sys
import time

import numpy as np

os.environ.setdefault("BENCH_ITERS", "10")


def timeit(fn, *args, iters=10):
    out = fn(*args)
    import jax
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    import jax
    import jax.numpy as jnp

    n = int(os.environ.get("BENCH_N_GAUSSIANS", 1_500_000))
    width, height = 1280, 720
    rng = np.random.default_rng(0)

    # --- micro: lax.sort costs at bench scale --------------------------------
    R = 11_000_000
    key = jnp.asarray(rng.integers(0, 2**32, R, dtype=np.uint32))
    flat = jnp.arange(R, dtype=jnp.int32)
    pay = [jnp.asarray(rng.random(R, dtype=np.float32)) for _ in range(9)]

    s_bare = jax.jit(lambda k: jax.lax.sort((k,), num_keys=1))
    s_2 = jax.jit(lambda k, f: jax.lax.sort((k, f), num_keys=1))
    s_11 = jax.jit(lambda k, f, *p: jax.lax.sort((k, f, *p), num_keys=1))

    print(f"sort bare u32 [{R}]: {timeit(s_bare, key):.1f} ms", flush=True)
    print(f"sort 2-row        : {timeit(s_2, key, flat):.1f} ms", flush=True)
    print(f"sort 11-row       : {timeit(s_11, key, flat, *pay):.1f} ms", flush=True)

    # n-sized sort (gaussian-level depth presort candidate)
    kn = jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint32))
    pn = [jnp.asarray(rng.random(n, dtype=np.float32)) for _ in range(12)]
    s_n = jax.jit(lambda k, *p: jax.lax.sort((k, *p), num_keys=1))
    print(f"sort n={n} 13-row : {timeit(s_n, kn, *pn):.1f} ms", flush=True)

    # gather/scatter at R scale for comparison
    idx = jnp.asarray(rng.permutation(R).astype(np.int32))
    g_1 = jax.jit(lambda x, i: x[i])
    print(f"gather 1 row [{R}]: {timeit(g_1, pay[0], idx):.1f} ms", flush=True)
    mat = jnp.stack(pay[:8])  # [8, R]
    g_rows = jax.jit(lambda x, i: x[:, i])
    print(f"gather 8-row axis1: {timeit(g_rows, mat, idx):.1f} ms", flush=True)

    # segment-ish scatter-add
    sc = jax.jit(lambda x, i: jnp.zeros((R,), jnp.float32).at[i].add(x))
    print(f"scatter-add 1 row : {timeit(sc, pay[0], idx):.1f} ms", flush=True)

    # --- full bench step under profiler --------------------------------------
    from wildgaussians_tpu.types import new_cameras
    from wildgaussians_tpu.cameras import make_camera_params
    from wildgaussians_tpu.ops.rasterize import rasterize_gaussians

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
                                  kernel_size=0.1, backend="pallas",
                                  max_tiles_per_gaussian=10)
        return jnp.mean(jnp.abs(out.color - target)), (out.num_rendered, out.overflow)

    step = jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3, 4), has_aux=True))
    out = step(*args)
    jax.block_until_ready(out)
    print(f"full fwd+bwd step : {timeit(step, *args, iters=10):.1f} ms", flush=True)

    # forward only
    fwd = jax.jit(lambda *a: loss_fn(*a)[0])
    print(f"forward only      : {timeit(fwd, *args, iters=10):.1f} ms", flush=True)

    with jax.profiler.trace("/tmp/bench_trace"):
        for _ in range(3):
            out = step(*args)
        jax.block_until_ready(out)
    print("trace written to /tmp/bench_trace", flush=True)


if __name__ == "__main__":
    main()
