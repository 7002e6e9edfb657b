"""Benchmark: rendered Mpix/s forward+backward per chip @ 1.5M Gaussians.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The scene is synthetic (uniform Gaussians in a frustum, scales tuned so the
average projected footprint covers a few tiles, like a converged 3DGS scene).
Timed region = full differentiable render: preprocess -> binning (sort) ->
tile blend forward + hand-derived backward, plus the L1 loss. vs_baseline is
measured against 50 Mpix/s fwd+bwd, an estimate of the reference CUDA
implementation on a desktop RTX-class GPU (the repo publishes no numbers —
BASELINE.md; typical 3DGS training steps are 20-50 ms at ~1 Mpix/1.5M).
"""
import json
import os
import sys
import time

import numpy as np

REFERENCE_MPIX_S = 50.0
# deterministic synthetic-scene quality target (BENCH_MODE=quality):
# vanilla-3DGS config on the generated scene reaches this PSNR in
# BENCH_QUALITY_STEPS steps (recorded on CPU/TPU; regression signal until
# real COLMAP data exists in the environment — VERDICT round-1 item 5)
REFERENCE_QUALITY_PSNR = 30.0


def quality_main():
    """Train a deterministic synthetic scene and report PSNR."""
    steps = int(os.environ.get("BENCH_QUALITY_STEPS", 2000))
    n_points = int(os.environ.get("BENCH_QUALITY_POINTS", 20000))
    width = int(os.environ.get("BENCH_QUALITY_WIDTH", 296))
    height = int(os.environ.get("BENCH_QUALITY_HEIGHT", 200))

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__ if "__file__" in globals() else "bench.py")), "tests"))
    from test_training import _make_synthetic_dataset  # deterministic scene
    from wildgaussians_tpu.models.wildgaussians import WildGaussians

    rng = np.random.default_rng(12345)
    dataset, _scene = _make_synthetic_dataset(
        rng, n_cams=12, width=width, height=height, n_points=n_points)
    overrides = dict(
        iterations=steps, appearance_enabled=False,
        uncertainty_mode="disabled", num_sky_gaussians=0, sh_degree=2,
        densify_from_iter=300, densification_interval=150,
        densify_until_iter=int(steps * 0.8),
        opacity_reset_interval=1200, position_lr_max_steps=steps,
    )
    method = WildGaussians(train_dataset=dataset, config_overrides=overrides)
    t0 = time.perf_counter()
    psnr = float("nan")
    for s in range(steps):
        metrics = method.train_iteration(s)
        psnr = metrics["psnr"]
        if (s + 1) % 200 == 0:
            print(f"# step {s + 1}: psnr={psnr:.2f} "
                  f"n={metrics['num_gaussians']}", file=sys.stderr)
    dt = time.perf_counter() - t0
    result = {
        "metric": f"synthetic-scene PSNR @{steps} steps (vanilla 3DGS)",
        "value": round(psnr, 3),
        "unit": "dB",
        "vs_baseline": round(psnr / REFERENCE_QUALITY_PSNR, 4),
    }
    print(json.dumps(result))
    print(f"# trained {steps} steps in {dt:.0f}s "
          f"({dt / steps * 1e3:.0f} ms/step)", file=sys.stderr)


def main():
    n_gaussians = int(os.environ.get("BENCH_N_GAUSSIANS", 1_500_000))
    width = int(os.environ.get("BENCH_WIDTH", 1280))
    height = int(os.environ.get("BENCH_HEIGHT", 720))
    iters = int(os.environ.get("BENCH_ITERS", 20))
    backend = os.environ.get("BENCH_BACKEND", "auto")

    import jax
    import jax.numpy as jnp
    from wildgaussians_tpu.types import new_cameras
    from wildgaussians_tpu.cameras import make_camera_params
    from wildgaussians_tpu.ops.rasterize import rasterize_gaussians

    if backend == "auto":
        backend = "pallas" if any(d.platform == "tpu" for d in jax.devices()) else "tiled"
        try:
            if backend == "pallas":
                from wildgaussians_tpu.ops import rasterize_pallas  # noqa: F401
        except Exception:
            backend = "tiled"

    rng = np.random.default_rng(0)
    f = width / 1.4
    cam = new_cameras(
        poses=np.eye(4, dtype=np.float32)[:3][None],
        intrinsics=np.array([[f, f, width / 2, height / 2]], np.float32),
        camera_models=np.zeros((1,), np.int32),
        distortion_parameters=np.zeros((1, 6), np.float32),
        image_sizes=np.array([[width, height]], np.int32))
    params, w, h = make_camera_params(cam)

    # depth-stratified points; scales sized for a ~1.5-tile average footprint
    z = rng.uniform(3.0, 30.0, n_gaussians).astype(np.float32)
    xy_extent = z[:, None] * np.array([width / (2 * f), height / (2 * f)], np.float32)
    xyz = np.concatenate([
        rng.uniform(-1, 1, (n_gaussians, 2)).astype(np.float32) * xy_extent,
        z[:, None]], -1)
    px_size = z / f  # world size of one pixel at that depth
    # footprint ~1-4 px sigma: matches converged 3DGS scenes (~3-4 duplicated
    # tile entries per gaussian on average)
    scales = (px_size[:, None] * rng.uniform(0.8, 4.0, (n_gaussians, 3))).astype(np.float32)
    q = rng.normal(size=(n_gaussians, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    opac = rng.uniform(0.4, 0.99, n_gaussians).astype(np.float32)
    colors = rng.uniform(0, 1, (n_gaussians, 3)).astype(np.float32)
    target = jnp.asarray(rng.uniform(0, 1, (h, w, 3)).astype(np.float32))

    args = tuple(map(jnp.asarray, (xyz, scales, q, opac, colors)))

    d_max = int(os.environ.get("BENCH_DMAX", 10))
    d_small = int(os.environ.get("BENCH_DSMALL", 4))
    binning = os.environ.get("BENCH_BINNING", "sort")
    chunk = int(os.environ.get("BENCH_CHUNK", 256))

    def loss_fn(xyz, scales, rots, opac, colors):
        out = rasterize_gaussians(xyz, scales, rots, opac, colors, params, w, h,
                                  kernel_size=0.1, backend=backend,
                                  max_tiles_per_gaussian=d_max, chunk=chunk,
                                  d_small=d_small, binning=binning)
        return jnp.mean(jnp.abs(out.color - target)), (out.num_rendered,
                                                       out.overflow)

    fwd_only = bool(int(os.environ.get("BENCH_FWD_ONLY", "0")))
    if fwd_only:
        # inference throughput: render only, no gradients
        def fwd(xyz, scales, rots, opac, colors):
            out = rasterize_gaussians(
                xyz, scales, rots, opac, colors, params, w, h,
                kernel_size=0.1, backend=backend,
                max_tiles_per_gaussian=d_max, chunk=chunk,
                d_small=d_small, binning=binning)
            return out.color, (out.num_rendered, out.overflow)

        _fwd = jax.jit(fwd)

        def step(*a):
            color, aux = _fwd(*a)
            return (jnp.mean(color), aux), (color,)
    else:
        step = jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3, 4),
                                          has_aux=True))

    # warmup + compile
    (loss, (num_rendered, overflow)), grads = step(*args)
    jax.block_until_ready(grads)

    t0 = time.perf_counter()
    for _ in range(iters):
        (loss, (num_rendered, overflow)), grads = step(*args)
    jax.block_until_ready(grads)
    dt = (time.perf_counter() - t0) / iters

    mpix_s = (w * h) / dt / 1e6
    kind = "fwd-only" if fwd_only else "fwd+bwd"
    result = {
        "metric": f"{kind} Mpix/s @{n_gaussians // 1000}k gaussians ({backend})",
        "value": round(mpix_s, 3),
        "unit": "Mpix/s",
        "vs_baseline": round(mpix_s / REFERENCE_MPIX_S, 4),
    }
    if fwd_only:
        result["fps"] = round(1.0 / dt, 2)
    print(json.dumps(result))
    print(f"# step={dt * 1e3:.1f}ms loss={float(loss):.4f} "
          f"num_rendered={int(num_rendered)} overflow={int(overflow)} "
          f"platform={jax.devices()[0].platform}", file=sys.stderr)


if __name__ == "__main__":
    if os.environ.get("BENCH_MODE") == "quality":
        quality_main()
    else:
        main()
