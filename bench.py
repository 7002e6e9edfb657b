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

# --- v5e single-chip roofline constants (model_bound) -----------------------
# HBM_BW: ~819 GB/s sustained; VPU_OPS: 8 sublanes x 128 lanes x 4 ALUs x
# 0.94 GHz ~= 3.8 T elementary f32 lane-ops/s; transcendentals (exp/log)
# cost ~7 lane-ops each on the VPU.
HBM_BW = 819e9
VPU_OPS = 3.8e12
EXP_OPS = 7.0


def model_bound_ms(num_rendered: int, R_slots: int, fwd_rows: int,
                   bwd_rows: int, tile_pixels: int = 256,
                   fwd_only: bool = False) -> float:
    """Speed-of-light step model for the sort-engine design on one chip.

    Three irreducible stages (everything else can in principle fuse/hide):
      1. binning reorder: a CUB-class 4-pass radix sort moving
         (key + payload rows) x R x 8 B (read+write) per pass at HBM BW —
         the hardware floor a GPU actually reaches; TPU has no vector
         scatter, so lax.sort runs ~10x above this floor (documented in
         tools/profiles/README.md: the gap is platform, not implementation).
      2. forward blend: every covered entry is evaluated against all 256
         tile pixels; per pair two transcendentals (exp(power), exp(S)) +
         ~15 ALU lane-ops on the VPU. MXU prefix/color matmuls run in
         parallel and are never the binding unit at K=256.
      3. backward: re-forward + gradient chains (~2 more transcendental-
         equivalents + ~25 ALU) + the gradient un-sort (stage-1 again
         with bwd_rows).
    """
    pairs = num_rendered * tile_pixels
    sort_bytes = 4 * 2 * (1 + fwd_rows) * R_slots * 4
    fwd_kernel_ops = pairs * (2 * EXP_OPS + 15)
    t = sort_bytes / HBM_BW + fwd_kernel_ops / VPU_OPS
    if not fwd_only:
        unsort_bytes = 4 * 2 * (1 + bwd_rows) * R_slots * 4
        bwd_kernel_ops = pairs * (4 * EXP_OPS + 25)
        t += unsort_bytes / HBM_BW + bwd_kernel_ops / VPU_OPS
    return t * 1e3
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
    # BENCH_PASSES > 1: the real training shape — raw + appearance-toned
    # (+ depth) color sets sharing one sort and ONE fused kernel traversal
    n_bench_passes = int(os.environ.get("BENCH_PASSES", 1))

    if n_bench_passes > 1 and backend == "pallas":
        from wildgaussians_tpu.ops.gaussians import preprocess, compute_cov3d
        from wildgaussians_tpu.ops.rasterize_pallas import rasterize_pallas_multi
        from wildgaussians_tpu.ops.rasterize_tiled import make_grid

        grid = make_grid(w, h, 16)

        def loss_fn(xyz, scales, rots, opac, colors):
            cov3d = compute_cov3d(scales, rots)
            pre = preprocess(xyz, cov3d, opac, params, w, h, 0.1,
                             tile_size=16)
            csets = [jnp.roll(colors, i, axis=1)
                     for i in range(n_bench_passes)]
            outs = rasterize_pallas_multi(
                pre.mean2d, pre.conic, pre.opacity, csets,
                jnp.zeros((xyz.shape[0], 2)), pre.depth, pre.rect_min,
                pre.rect_max,
                jnp.minimum(pre.tiles_touched, d_max), pre.valid,
                jnp.zeros((3,)), grid=grid, chunk=chunk,
                max_tiles_per_gaussian=d_max, d_small=d_small,
                binning=binning)
            loss = sum(jnp.mean(jnp.abs(img - target)) for img, _t in outs)
            return loss, (jnp.sum(jnp.minimum(pre.tiles_touched, d_max)),
                          jnp.int32(0))
    else:
        def loss_fn(xyz, scales, rots, opac, colors):
            out = rasterize_gaussians(xyz, scales, rots, opac, colors,
                                      params, w, h,
                                      kernel_size=0.1, backend=backend,
                                      max_tiles_per_gaussian=d_max,
                                      chunk=chunk,
                                      d_small=d_small, binning=binning)
            return jnp.mean(jnp.abs(out.color - target)), (out.num_rendered,
                                                           out.overflow)

    fwd_only = bool(int(os.environ.get("BENCH_FWD_ONLY", "0")))
    static = bool(int(os.environ.get("BENCH_STATIC", "0")))
    if static:
        # sort-once / blend-many viewer path: the sorted entry table is
        # reused across frames (ops/rasterize.bin_static + render_static)
        from wildgaussians_tpu.ops.rasterize import bin_static, render_static

        binning = jax.jit(lambda *a: bin_static(
            *a, params, w, h, kernel_size=0.1,
            max_tiles_per_gaussian=d_max, chunk=chunk,
            d_small=d_small))(*args)
        render = jax.jit(lambda b: render_static(
            b, n_gaussians, w, h, max_tiles_per_gaussian=d_max,
            chunk=chunk, d_small=d_small))

        def step(*a):
            color, final_t = render(binning)
            return (jnp.mean(color), (jnp.int32(0), jnp.int32(0))), (color,)
    elif fwd_only:
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
    kind = ("static blend-only" if static
            else "fwd-only" if fwd_only else "fwd+bwd")
    if n_bench_passes > 1:
        kind += f" x{n_bench_passes}-pass"
    result = {
        "metric": f"{kind} Mpix/s @{n_gaussians // 1000}k gaussians ({backend})",
        "value": round(mpix_s, 3),
        "unit": "Mpix/s",
        "vs_baseline": round(mpix_s / REFERENCE_MPIX_S, 4),
    }
    if fwd_only or static:
        result["fps"] = round(1.0 / dt, 2)
    # speed-of-light model for this design on one chip (see model_bound_ms)
    d1 = min(d_small, d_max)
    R_slots = n_gaussians * d1 + int(n_gaussians * 0.16) * (d_max - d1)
    bound = model_bound_ms(int(num_rendered), R_slots, fwd_rows=6,
                           bwd_rows=6, fwd_only=fwd_only or static)
    result["model_bound_ms"] = round(bound, 1)
    result["model_bound_fraction"] = round(bound / (dt * 1e3), 3)
    print(json.dumps(result))
    print(f"# step={dt * 1e3:.1f}ms loss={float(loss):.4f} "
          f"num_rendered={int(num_rendered)} overflow={int(overflow)} "
          f"platform={jax.devices()[0].platform}", file=sys.stderr)


if __name__ == "__main__":
    if os.environ.get("BENCH_MODE") == "quality":
        quality_main()
    else:
        main()
