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
# VPU_OPS: 8 sublanes x 128 lanes x 4 ALUs x 0.94 GHz ~= 3.8 T elementary
# f32 lane-ops/s; transcendentals (exp/log1p) ~7 lane-ops each.
# Sort constants are MEASURED lax.sort behavior on this chip
# (tools/profiles/DESIGN_SORT.md): ~1.7 ms per call + 0.85 ns/elem for the
# key + 0.74 ns/elem per consumed payload row. Round 4's design-space
# campaign established these as the platform's reorder floor (every
# counting-scatter/sample-sort alternative measured >= it), so the model
# prices the reorder at what the PLATFORM can do, not at a CUB-radix
# fantasy the hardware has no vector scatter to reach.
VPU_OPS = 3.8e12
EXP_OPS = 7.0
SORT_FIXED_S = 1.66e-3
SORT_KEY_S = 0.85e-9
SORT_ROW_S = 0.74e-9


def model_bound_ms(num_rendered: int, R_slots: int, fwd_rows: int,
                   bwd_rows: int, tile_pixels: int = 256,
                   fwd_only: bool = False) -> float:
    """Speed-of-light step model for the sort-engine design on one chip.

    Three irreducible stages (everything else can in principle fuse/hide):
      1. binning reorder: one 2-key unstable lax.sort carrying fwd_rows
         payload rows at the measured per-row cost;
      2. forward blend: every covered entry against all 256 tile pixels;
         per pair THREE transcendentals — exp(power), log1p(1-alpha) and
         exp(prefix) (the log-space prefix product that buys lane
         parallelism; the reference's sequential per-thread T product
         pays only exp(power), forward.cu:356-384) — plus ~22 ALU
         lane-ops. MXU prefix/color matmuls overlap and never bind at
         K=256. Round-4 measurement: the kernels run at 83-89% of this
         bound — the round-3 "kernel gap" was this model undercounting
         (2 transcendentals + 15 ALU).
      3. backward: re-forward + gradient/moment chains (~3
         transcendentals + ~50 ALU) + the gradient un-sort (stage-1
         again with bwd_rows).
    """
    pairs = num_rendered * tile_pixels

    def t_sort(entries, rows, keys=1):
        return (SORT_FIXED_S
                + (keys * SORT_KEY_S + SORT_ROW_S * rows) * entries)

    fwd_kernel_ops = pairs * (3 * EXP_OPS + 22)
    t = t_sort(R_slots, fwd_rows, keys=2) + fwd_kernel_ops / VPU_OPS
    if not fwd_only:
        bwd_kernel_ops = pairs * (3 * EXP_OPS + 50)
        t += t_sort(R_slots, bwd_rows) + bwd_kernel_ops / VPU_OPS
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


def make_random_scene(rng, n_gaussians, width, height, f):
    """Round 1-3 bench scene: uniform random colors/opacities/depths.

    Worst-case for early termination: opacities 0.4-0.99 at random depths
    never saturate transmittance, so every tile walks its full entry list
    (probe_cfin r3: f=1.0). Kept as the headline scene for cross-round
    comparability; the surfel scene below measures the converged regime."""
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
    return xyz, scales, q, opac, colors


def _quat_from_normal(rng, normal):
    """Quaternions rotating +z to each row of `normal` [n,3] (plus a random
    in-plane spin so the tangent axes aren't globally aligned)."""
    n = normal.shape[0]
    z = np.array([0.0, 0.0, 1.0], np.float32)
    v = np.cross(np.broadcast_to(z, normal.shape), normal)
    c = normal @ z
    w = 1.0 + c
    q = np.concatenate([w[:, None], v], axis=1).astype(np.float32)
    # antiparallel rows (w ~ 0): any 180-degree axis works
    bad = w < 1e-6
    q[bad] = np.array([0.0, 1.0, 0.0, 0.0], np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    # compose with a random rotation about the local z (normal) axis
    ang = rng.uniform(0, np.pi, n).astype(np.float32)
    spin = np.stack([np.cos(ang), np.zeros(n, np.float32),
                     np.zeros(n, np.float32), np.sin(ang)], axis=1)
    a, b = q, spin
    return np.stack([
        a[:, 0] * b[:, 0] - a[:, 1] * b[:, 1] - a[:, 2] * b[:, 2] - a[:, 3] * b[:, 3],
        a[:, 0] * b[:, 1] + a[:, 1] * b[:, 0] + a[:, 2] * b[:, 3] - a[:, 3] * b[:, 2],
        a[:, 0] * b[:, 2] - a[:, 1] * b[:, 3] + a[:, 2] * b[:, 0] + a[:, 3] * b[:, 1],
        a[:, 0] * b[:, 3] + a[:, 1] * b[:, 2] - a[:, 2] * b[:, 1] + a[:, 3] * b[:, 0],
    ], axis=1).astype(np.float32)


def make_surfel_scene(rng, n_gaussians, width, height, f):
    """Converged-scene stand-in (VERDICT r3 #3): surface-attached gaussians.

    A trained 3DGS scene is NOT uniform noise: gaussians sit ON surfaces,
    opacities are bimodal with most mass near 1 (densify/prune + opacity
    reset drive them there; prune drops <0.005, reference method.py
    densify_and_prune), footprints are flat disks (small scale along the
    surface normal), and colors are spatially correlated. Front surfaces
    then SATURATE transmittance, so per-tile walks terminate early
    (reference forward.cu:367-372's early exit) — the regime the random
    scene cannot reach. Geometry: a ground plane, a back wall, and a field
    of spheres, all frustum-filling.
    """
    def in_frustum_xy(z, margin=1.0):
        return np.multiply.outer(
            np.asarray(z, np.float32),
            np.array([width / (2 * f), height / (2 * f)], np.float32)) * margin

    parts = []  # (xyz, normal)
    n_ground = int(n_gaussians * 0.35)
    n_wall = int(n_gaussians * 0.25)
    n_sph = n_gaussians - n_ground - n_wall
    # ground plane y = +1.0 (camera looks +z, y down is up here; any plane
    # crossing the frustum works)
    zg = rng.uniform(3.0, 28.0, n_ground).astype(np.float32) ** 1.0
    xg = rng.uniform(-1, 1, n_ground).astype(np.float32) * in_frustum_xy(zg)[:, 0]
    g_xyz = np.stack([xg, np.full(n_ground, 1.0, np.float32), zg], axis=1)
    parts.append((g_xyz, np.tile(np.array([0, -1, 0], np.float32), (n_ground, 1))))
    # back wall z = 28
    ext = in_frustum_xy(np.float32(28.0))
    w_xyz = np.stack([
        rng.uniform(-ext[0], ext[0], n_wall).astype(np.float32),
        rng.uniform(-ext[1], ext[1], n_wall).astype(np.float32),
        np.full(n_wall, 28.0, np.float32)], axis=1)
    parts.append((w_xyz, np.tile(np.array([0, 0, -1], np.float32), (n_wall, 1))))
    # spheres scattered in the frustum
    n_spheres = 80
    sc_z = rng.uniform(4.0, 22.0, n_spheres).astype(np.float32)
    sc_xy = rng.uniform(-0.8, 0.8, (n_spheres, 2)).astype(np.float32) * in_frustum_xy(sc_z)
    centers = np.concatenate([sc_xy, sc_z[:, None]], axis=1)
    radii = rng.uniform(0.3, 1.6, n_spheres).astype(np.float32)
    # points per sphere proportional to projected solid angle ~ (r/z)^2
    wgt = (radii / sc_z) ** 2
    counts = np.maximum((wgt / wgt.sum() * n_sph).astype(np.int64), 1)
    counts[-1] += n_sph - counts.sum()
    sp_xyz, sp_nrm = [], []
    for ci, (ctr, r, m) in enumerate(zip(centers, radii, counts)):
        if m <= 0:
            continue
        d = rng.normal(size=(m, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        sp_xyz.append(ctr[None] + r * d)
        sp_nrm.append(d)
    parts.append((np.concatenate(sp_xyz), np.concatenate(sp_nrm)))

    xyz = np.concatenate([p[0] for p in parts])[:n_gaussians]
    normal = np.concatenate([p[1] for p in parts])[:n_gaussians]
    z = xyz[:, 2]
    px_size = z / f
    # flat surfels: tangent sigma ~1-3 px, normal sigma 0.15x tangent
    tangent = (px_size * rng.uniform(1.0, 3.0, n_gaussians)).astype(np.float32)
    scales = np.stack([tangent, tangent * rng.uniform(0.6, 1.0, n_gaussians).astype(np.float32),
                       tangent * 0.15], axis=1)
    q = _quat_from_normal(rng, normal)
    # bimodal converged opacities: 70% near-opaque, 30% mid/floaters
    hi = rng.uniform(0.85, 0.995, n_gaussians)
    lo = rng.uniform(0.08, 0.85, n_gaussians)
    opac = np.where(rng.uniform(size=n_gaussians) < 0.7, hi, lo).astype(np.float32)
    # spatially-correlated "texture": low-frequency trig mix of position
    ph = xyz @ rng.normal(0, 0.8, (3, 3)).astype(np.float32)
    colors = (0.5 + 0.45 * np.sin(ph + rng.uniform(0, 6.28, 3).astype(np.float32))
              ).astype(np.float32)
    return xyz, scales, q, np.clip(opac, 0.0, 0.995), np.clip(colors, 0.0, 1.0)


def load_trained_scene(path):
    """Snapshot of an actually-trained store (tools/make_trained_scene.py):
    activated xyz/scales/rotations/opacities/colors arrays."""
    d = np.load(path)
    return tuple(d[k] for k in ("xyz", "scales", "rotations", "opacities",
                                "colors"))


def main():
    n_gaussians = int(os.environ.get("BENCH_N_GAUSSIANS", 1_500_000))
    width = int(os.environ.get("BENCH_WIDTH", 1280))
    height = int(os.environ.get("BENCH_HEIGHT", 720))
    iters = int(os.environ.get("BENCH_ITERS", 20))
    backend = os.environ.get("BENCH_BACKEND", "auto")
    scene_kind = os.environ.get("BENCH_SCENE", "random")

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

    def build_scene(kind):
        if kind == "random":
            sc = make_random_scene(rng, n_gaussians, width, height, f)
        elif kind == "surfel":
            sc = make_surfel_scene(rng, n_gaussians, width, height, f)
        elif kind == "trained":
            sc = load_trained_scene(os.environ.get(
                "BENCH_TRAINED_PATH", "/tmp/wg_trained_scene.npz"))
        else:
            raise SystemExit(f"unknown BENCH_SCENE={kind}")
        return tuple(map(jnp.asarray, sc))

    args = build_scene(scene_kind)

    def make_target(kind, sargs):
        if kind == "random":
            # noise target: large uncorrelated residuals everywhere
            return jnp.asarray(rng.uniform(0, 1, (h, w, 3)).astype(np.float32))
        # converged regime: the target is the scene's own render plus a
        # small perturbation, so residuals (and gradients) are small and
        # image-like, as at the end of training
        out = jax.jit(lambda a: rasterize_gaussians(
            *a, params, w, h, kernel_size=0.1,
            backend=backend).color)(sargs)
        noise = rng.normal(0, 0.02, (h, w, 3)).astype(np.float32)
        return jnp.clip(out + noise, 0.0, 1.0)

    d_max = int(os.environ.get("BENCH_DMAX", 10))
    d_small = int(os.environ.get("BENCH_DSMALL", 4))
    binning = os.environ.get("BENCH_BINNING", "sort")
    chunk = int(os.environ.get("BENCH_CHUNK", 256))
    # BENCH_PASSES > 1: the real training shape — raw + appearance-toned
    # (+ depth) color sets sharing one sort and ONE fused kernel traversal
    n_bench_passes = int(os.environ.get("BENCH_PASSES", 1))
    # BENCH_SATCULL=1: saturation-aware pre-sort cull (round 5). The
    # previous frame's per-tile exit depths ride the carry chain as a
    # supertile map that drops binning cells the walk would never reach;
    # only bites on scenes that saturate (surfel/trained — random never
    # does). Pair with a smaller BENCH_DSMALL to cash the cull into R.
    satcull = bool(int(os.environ.get("BENCH_SATCULL", "0"))) \
        and backend == "pallas" and binning == "sort"
    fwd_only = bool(int(os.environ.get("BENCH_FWD_ONLY", "0")))
    static = bool(int(os.environ.get("BENCH_STATIC", "0")))
    if static:
        satcull = False

    if satcull:
        from wildgaussians_tpu.ops.gaussians import preprocess, compute_cov3d
        from wildgaussians_tpu.ops.rasterize_pallas import (
            pool_sat_depth, rasterize_pallas_multi)
        from wildgaussians_tpu.ops.rasterize_tiled import make_grid

        grid = make_grid(w, h, 16)

        def loss_fn(xyz, scales, rots, opac, colors, target, sat_super):
            cov3d = compute_cov3d(scales, rots)
            pre = preprocess(xyz, cov3d, opac, params, w, h, 0.1,
                             tile_size=16)
            csets = [jnp.roll(colors, i, axis=1)
                     for i in range(n_bench_passes)]
            outs, aux = rasterize_pallas_multi(
                pre.mean2d, pre.conic, pre.opacity, csets,
                jnp.zeros((xyz.shape[0], 2)), pre.depth, pre.rect_min,
                pre.rect_max,
                jnp.minimum(pre.tiles_touched, d_max), pre.valid,
                jnp.zeros((3,)), grid=grid, chunk=chunk,
                max_tiles_per_gaussian=d_max, d_small=d_small,
                binning=binning, return_aux=True, sat_super=sat_super)
            loss = sum(jnp.mean(jnp.abs(img - target)) for img, _t in outs)
            new_map = pool_sat_depth(aux["sat_depth"], grid, margin=1.25)
            return loss, (jnp.sum(jnp.minimum(pre.tiles_touched, d_max)),
                          jnp.int32(0), new_map)
    elif n_bench_passes > 1 and backend == "pallas":
        from wildgaussians_tpu.ops.gaussians import preprocess, compute_cov3d
        from wildgaussians_tpu.ops.rasterize_pallas import rasterize_pallas_multi
        from wildgaussians_tpu.ops.rasterize_tiled import make_grid

        grid = make_grid(w, h, 16)

        def loss_fn(xyz, scales, rots, opac, colors, target):
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
        def loss_fn(xyz, scales, rots, opac, colors, target):
            out = rasterize_gaussians(xyz, scales, rots, opac, colors,
                                      params, w, h,
                                      kernel_size=0.1, backend=backend,
                                      max_tiles_per_gaussian=d_max,
                                      chunk=chunk,
                                      d_small=d_small, binning=binning)
            return jnp.mean(jnp.abs(out.color - target)), (out.num_rendered,
                                                           out.overflow)

    # Frames are CHAINED through a scalar carry (prev frame's mean feeds the
    # next frame's bg/opacity as +0.0*carry): without a data dependence the
    # axon relay's block_until_ready on the LAST dispatch can return before
    # shallow queues actually execute, and the round-4 static bench printed
    # 6240 fps at BENCH_ITERS=20 (VERDICT r4 weak #4). The chain forces
    # every frame onto the critical path with zero host round trips.
    if static:
        # sort-once / blend-many viewer path: the sorted entry table is
        # reused across frames (ops/rasterize.bin_static + render_static)
        from wildgaussians_tpu.ops.rasterize import bin_static, render_static

        binning = jax.jit(lambda *a: bin_static(
            *a, params, w, h, kernel_size=0.1,
            max_tiles_per_gaussian=d_max, chunk=chunk,
            d_small=d_small))(*args)
        render = jax.jit(lambda b, carry: render_static(
            b, n_gaussians, w, h, max_tiles_per_gaussian=d_max,
            chunk=chunk, d_small=d_small,
            bg=jnp.zeros((3,), jnp.float32) + 0.0 * carry))

        def step(*a, carry):
            color, final_t = render(binning, carry)
            return (jnp.mean(color), (jnp.int32(0), jnp.int32(0))), (color,)
    elif fwd_only and satcull:
        # inference throughput with the saturation cull warm (the viewer
        # regime: consecutive frames share a camera, so the previous
        # frame's map applies exactly)
        _f = jax.jit(loss_fn)

        def step(*a, carry):
            xyz, scales, rots, opac, colors, target = a
            cs, cmap = carry
            out = _f(xyz, scales, rots, opac + 0.0 * cs, colors, target,
                     cmap)
            return out, ()
    elif fwd_only:
        # inference throughput: render only, no gradients
        def fwd(xyz, scales, rots, opac, colors, carry):
            out = rasterize_gaussians(
                xyz, scales, rots, opac + 0.0 * carry, colors, params, w, h,
                kernel_size=0.1, backend=backend,
                max_tiles_per_gaussian=d_max, chunk=chunk,
                d_small=d_small, binning=binning)
            return out.color, (out.num_rendered, out.overflow)

        _fwd = jax.jit(fwd)

        def step(*a, carry):
            color, aux = _fwd(*a[:-1], carry[0])
            return (jnp.mean(color), aux), (color,)
    else:
        _vg = jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3, 4),
                                         has_aux=True))

        def step(*a, carry):
            xyz, scales, rots, opac, colors, target = a
            cs, cmap = carry
            if satcull:
                return _vg(xyz, scales, rots, opac + 0.0 * cs, colors,
                           target, cmap)
            return _vg(xyz, scales, rots, opac + 0.0 * cs, colors, target)

    if satcull:
        from wildgaussians_tpu.ops.rasterize_pallas import supertile_shape
        from wildgaussians_tpu.ops.rasterize_tiled import make_grid as _mg
        sat0 = jnp.full(supertile_shape(_mg(w, h, 16)), jnp.inf, jnp.float32)
    else:
        sat0 = jnp.float32(0.0)   # unused placeholder

    def timed_run(sargs, target):
        # warmup + compile (cached across scenes: same shapes); 2 warmup
        # steps under satcull so the map is warm before timing starts
        carry = (jnp.float32(0.0), sat0)
        (loss, aux), grads = step(*sargs, target, carry=carry)
        if satcull:
            (loss, aux), grads = step(*sargs, target,
                                      carry=(loss, aux[2]))
        jax.block_until_ready(grads)

        def run(k):
            t0 = time.perf_counter()
            carry = (loss, aux[2] if satcull else sat0)
            for _ in range(k):
                (loss_, aux_), grads_ = step(*sargs, target, carry=carry)
                carry = (loss_, aux_[2] if satcull else sat0)
            jax.block_until_ready((carry, grads_))
            return (time.perf_counter() - t0) / k, loss_, aux_, grads_

        dt, loss, aux, grads = run(iters)
        num_rendered, overflow = aux[0], aux[1]
        # Sanity guard: a measurement below a third of the design's
        # speed-of-light model is a timing artifact, not a result. Retry
        # with a deeper queue; refuse to publish if it persists.
        d1g = min(d_small, d_max)
        slots = n_gaussians * d1g + int(n_gaussians * 0.16) * (d_max - d1g)
        floor = model_bound_ms(int(num_rendered), slots, fwd_rows=4,
                               bwd_rows=5, fwd_only=fwd_only or static)
        if dt * 1e3 < floor / 3:
            print(f"# WARNING: measured {dt * 1e3:.2f} ms < model floor "
                  f"{floor:.1f}/3 ms; re-timing with {iters * 5} iters",
                  file=sys.stderr)
            dt, loss, (num_rendered, overflow), grads = run(iters * 5)
            if dt * 1e3 < floor / 3:
                raise SystemExit(
                    f"bench timing unsound: {dt * 1e3:.2f} ms/step below "
                    f"model floor {floor:.1f} ms / 3 even at depth "
                    f"{iters * 5}; refusing to publish")
        return dt, loss, num_rendered, overflow

    target = make_target(scene_kind, args)
    dt, loss, num_rendered, overflow = timed_run(args, target)

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
    if scene_kind != "random":
        result["metric"] += f" [{scene_kind} scene]"
    if fwd_only or static:
        result["fps"] = round(1.0 / dt, 2)
    # speed-of-light model for this design on one chip (see model_bound_ms)
    # pack-v2 rows: fwd payload = xy + (ca,cc) + (cb,op) + rgb10/pass;
    # bwd = 5 f16-pair grad rows (fused abs channel)
    d1 = min(d_small, d_max)
    R_slots = n_gaussians * d1 + int(n_gaussians * 0.16) * (d_max - d1)
    bound = model_bound_ms(int(num_rendered), R_slots,
                           fwd_rows=3 + n_bench_passes,
                           bwd_rows=(7 + 3 * n_bench_passes + 1) // 2,
                           fwd_only=fwd_only or static)
    result["model_bound_ms"] = round(bound, 1)
    result["model_bound_fraction"] = round(bound / (dt * 1e3), 3)

    # converged-regime companion number (VERDICT r3 #3): same compiled step
    # on the surfel scene, where transmittance saturates and early exit can
    # fire. Reported in the SAME json line so every round records both.
    if scene_kind == "random" and not static \
            and os.environ.get("BENCH_SKIP_SURFEL", "0") != "1":
        sargs = build_scene("surfel")
        starget = make_target("surfel", sargs)
        sdt, sloss, snum, soverflow = timed_run(sargs, starget)
        result["surfel_mpix_s"] = round((w * h) / sdt / 1e6, 3)
        result["surfel_ms_per_step"] = round(sdt * 1e3, 1)
        result["surfel_num_rendered"] = int(snum)
    print(json.dumps(result))
    print(f"# step={dt * 1e3:.1f}ms loss={float(loss):.4f} "
          f"num_rendered={int(num_rendered)} overflow={int(overflow)} "
          f"platform={jax.devices()[0].platform}", file=sys.stderr)


if __name__ == "__main__":
    if os.environ.get("BENCH_MODE") == "quality":
        quality_main()
    else:
        main()
