"""Train the synthetic scene and snapshot the store for BENCH_SCENE=trained.

VERDICT r3 #3: the headline bench scene (uniform random opacities/depths,
noise target) cannot exercise transmittance saturation, so decisions made
on it (early-exit, compacted backward) do not transfer to real training.
This tool produces an HONESTLY-trained Gaussian distribution at a chosen
scale: it trains the deterministic synthetic dataset (the same generator
as tests/test_training.py / BENCH_MODE=quality) with vanilla-3DGS
settings, then saves the ACTIVATED gaussians (xyz / scales / rotations /
opacities / base colors) to an npz that bench.py loads via
BENCH_SCENE=trained BENCH_TRAINED_PATH=<npz>.

It also prints the snapshot's opacity/scale statistics next to
bench.make_surfel_scene's, so the procedural converged-scene stand-in that
ships inside bench.py (cheap enough for the driver's every-round run) is
validated against a real trained distribution.

Usage:
  PYTHONPATH=. python tools/make_trained_scene.py \
      [--steps 1500] [--points 60000] [--width 640] [--height 400] \
      [--out /tmp/wg_trained_scene.npz]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--points", type=int, default=60000)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=400)
    ap.add_argument("--out", default="/tmp/wg_trained_scene.npz")
    args = ap.parse_args()

    import jax.numpy as jnp
    from test_training import _make_synthetic_dataset
    from wildgaussians_tpu.models import gaussian_store as gs
    from wildgaussians_tpu.models.wildgaussians import WildGaussians

    rng = np.random.default_rng(12345)
    dataset, _scene = _make_synthetic_dataset(
        rng, n_cams=12, width=args.width, height=args.height,
        n_points=args.points)
    overrides = dict(
        iterations=args.steps, appearance_enabled=False,
        uncertainty_mode="disabled", num_sky_gaussians=0, sh_degree=2,
        densify_from_iter=300, densification_interval=150,
        densify_until_iter=int(args.steps * 0.8),
        opacity_reset_interval=1200, position_lr_max_steps=args.steps,
    )
    method = WildGaussians(train_dataset=dataset, config_overrides=overrides)
    t0 = time.perf_counter()
    for s in range(args.steps):
        metrics = method.train_iteration(s)
        if (s + 1) % 200 == 0:
            print(f"# step {s+1}: psnr={metrics['psnr']:.2f} "
                  f"n={metrics['num_gaussians']}", flush=True)
    print(f"# trained in {time.perf_counter()-t0:.0f}s")

    g = gs.get_gaussians(method.params, method.aux, method.config)
    alive = np.asarray(method.aux.alive).astype(bool)
    xyz = np.asarray(g["xyz"])[alive]
    scales = np.asarray(g["scales"])[alive]
    rot = np.asarray(g["rotations"])[alive]
    opac = np.asarray(g["opacities"])[alive].reshape(-1)
    # base color: SH DC is stored as raw RGB in this method (features_dc,
    # reference method.py:916 keeps raw color, not SH-projected)
    colors = np.clip(np.asarray(g["features"])[alive][:, :3], 0.0, 1.0)
    np.savez_compressed(args.out, xyz=xyz, scales=scales, rotations=rot,
                        opacities=opac, colors=colors)
    print(f"# saved {alive.sum()} gaussians -> {args.out}")
    q = np.percentile
    print(f"# trained opacity: p10={q(opac,10):.3f} p50={q(opac,50):.3f} "
          f"p90={q(opac,90):.3f} frac>0.85={np.mean(opac>0.85):.3f}")
    smax = scales.max(1); smin = scales.min(1)
    print(f"# trained scale p50(max)={q(smax,50):.4f} "
          f"anisotropy p50={q(smin/np.maximum(smax,1e-9),50):.3f}")

    import bench
    f = args.width / 1.4
    sx, ss, _sq, so, _sc = bench.make_surfel_scene(
        np.random.default_rng(0), len(opac), args.width, args.height, f)
    del sx
    print(f"# surfel  opacity: p10={q(so,10):.3f} p50={q(so,50):.3f} "
          f"p90={q(so,90):.3f} frac>0.85={np.mean(so>0.85):.3f}")
    smax = ss.max(1); smin = ss.min(1)
    print(f"# surfel  scale p50(max)={q(smax,50):.4f} "
          f"anisotropy p50={q(smin/np.maximum(smax,1e-9),50):.3f}")


if __name__ == "__main__":
    main()
